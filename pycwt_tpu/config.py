"""Global numeric / padding policy for pycwt-tpu.

The reference library (``/root/reference/pycwt/helpers.py:6-30``) chooses its FFT
backend at import time: pyfftw (no padding) when available, else scipy.fftpack with
pad-to-next-power-of-two gated by a module flag ``_FFT_NEXT_POW2``.  We make that
policy an explicit, immutable config object instead of import-time global state.

Two dtype modes:

* **parity mode** (float64/complex128) — used on CPU backends (and in tests with
  ``jax_enable_x64``) to match the reference to ~1e-10 relative error.
* **throughput mode** (float32/complex64) — the TPU fast path; TPU has no native
  f64 FFT, so benchmarks run f32 with error reported against f64 goldens.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CWTConfig:
    """Immutable numeric policy.

    Attributes
    ----------
    pad_pow2:
        Pad FFT lengths to the next power of two.  Matches the reference's
        default scipy path (``helpers.py:27-30``); ``False`` matches its
        pyfftw path (``helpers.py:15-19`` — no padding).  Power-of-two
        lengths are also what XLA's TPU FFT likes best.
    dtype:
        Real compute dtype.  ``None`` means "float64 when x64 is enabled,
        else float32".
    engine:
        FFT/kernel engine for every transform and auxiliary FFT:
        ``"xla"`` | ``"mxu"`` | ``"pallas"`` | ``"planar"`` (see
        ``ops/fft.py``; "planar" additionally avoids complex dtypes in the
        WCT/MC pipelines).  ``None`` defers to the ``PYCWT_TPU_ENGINE`` env
        var, then a per-backend default ("planar" on the tunneled axon
        platform, else "xla").
    precision:
        MXU matmul tier for the f32 fused-kernel CWT path (big transforms,
        nfft > 4096).  Measured on v5e (tools/tpu_precision_experiment.py,
        1M-pt Morlet-6 × 64 scales, error on the global wavelet spectrum):

        * ``"highest"`` — bf16x3, ~f32-exact (11.9 ms);
        * ``"high"``    — hand-rolled 2-pass compensated bf16
          (``ops.pallas_fft._dot_bf16x2``), 4.7e-6 rel err (8.0 ms) —
          the default: invisible next to the f32 path's ~1e-3 parity
          error vs the f64 goldens, 1.5× faster;
        * ``"fast"``    — single-pass bf16, 4.0e-3 rel err (5.6 ms).

        f64 runs, the xla/mxu engines, and small-nfft workloads (which ride
        the planar-XLA formulation at HIGHEST) are unaffected.
    """

    pad_pow2: bool = True
    dtype: jnp.dtype | None = None
    engine: str | None = None
    precision: str = "high"

    def __post_init__(self):
        if self.precision not in ("highest", "high", "fast"):
            raise ValueError(
                f"precision must be 'highest' | 'high' | 'fast', "
                f"got {self.precision!r}")

    @property
    def real_dtype(self) -> jnp.dtype:
        if self.dtype is not None:
            return jnp.dtype(self.dtype)
        return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)

    @property
    def complex_dtype(self) -> jnp.dtype:
        return jnp.dtype(jnp.complex128) if self.real_dtype == jnp.float64 else jnp.dtype(jnp.complex64)

    def fft_length(self, n: int) -> int:
        """FFT length for a signal of ``n`` samples under this policy.

        Reference: ``helpers.py:27-30`` (``2 ** ceil(log2 n)``).
        """
        if not self.pad_pow2 or n <= 1:
            return n
        return 1 << (n - 1).bit_length()


#: Default policy — pow-2 padding, dtype follows the x64 flag.
DEFAULT = CWTConfig()


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (host-side helper)."""
    if n <= 1:
        return max(n, 1)
    return 1 << (n - 1).bit_length()


def round_half_even(x: float) -> int:
    """numpy-style banker's rounding for host-side scalar grid math.

    The reference computes ``J = int(np.round(...))`` (``wavelet.py:81``) —
    np.round rounds half to even, unlike Python's ``round`` for .5 cases on
    some floats; we use float64 numpy-equivalent semantics.
    """
    f = math.floor(x)
    diff = x - f
    if diff > 0.5:
        return f + 1
    if diff < 0.5:
        return f
    return f if f % 2 == 0 else f + 1
