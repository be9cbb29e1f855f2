"""Device-mesh construction for the (data × scale) / (mc) parallel layouts.

The reference is a single-process NumPy library with no parallelism
(SURVEY.md §2); these axes are the new TPU-native capability:

* ``data``  — batch of signals, embarrassingly parallel (DP);
* ``scale`` — filter-bank rows; each chip computes its scale block and global
  spectra / inverse transforms are psum-reduced over this axis (the domain's
  "tensor" parallelism — the (S × nfft) outer product at reference
  ``wavelet.py:102-106`` is the only matmul-shaped op);
* ``mc``    — Monte-Carlo ensemble members for WCT significance; histograms
  are psum-reduced once per run.

Within a slice these collectives ride ICI; across hosts, DCN via
``jax.distributed.initialize`` (see ``distributed.py``).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["MeshSpec", "make_mesh"]


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape.  Any axis set to 1 is still present (size-1 axes
    cost nothing and keep the sharding rules uniform)."""

    data: int = 1
    scale: int = 1
    mc: int = 1

    @property
    def ndevices(self) -> int:
        return self.data * self.scale * self.mc


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a ``Mesh(('data', 'scale', 'mc'))`` over the given devices.

    With no spec, all devices go to the ``data`` axis.  Axis order puts
    ``scale`` innermost-but-one so scale-block halo exchanges (the boxcar
    smoothing's ``ppermute``) ride neighboring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if spec is None:
        spec = MeshSpec(data=n)
    if spec.ndevices != n:
        raise ValueError(
            f"mesh spec {spec} needs {spec.ndevices} devices, have {n}"
        )
    arr = np.asarray(devices).reshape(spec.data, spec.scale, spec.mc)
    return Mesh(arr, axis_names=("data", "scale", "mc"))
