"""Sharded transforms over a ``(data × scale × mc)`` device mesh.

Design (SPMD, the scaling-book recipe): annotate input/output shardings once,
jit the batched cores from :mod:`pycwt_tpu.transform`, and let XLA insert the
collectives — ``psum`` over 'scale' for inverse transforms and scale-averaged
spectra, ``psum`` over 'mc' for Monte-Carlo histograms (via an explicit
``shard_map``, since the histogram reduction is the one place we want a single
hand-placed collective).  No NCCL/MPI analogue exists in the reference — this
whole module is new capability (SURVEY.md §2b, P1-P4).

Divisibility: the scale axis shards the (S × nfft) filter bank by rows; S must
be divisible by the 'scale' mesh size (pad the scale grid with
:func:`pad_scales` — padded rows are masked out of reductions).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..mothers import Mother
from ..ops.smoothing import smooth
from ..stats import rednoise_batch
from ..transform import cwt_batch, icwt_batch

__all__ = [
    "pad_scales",
    "sharded_cwt",
    "sharded_power_pipeline",
    "sharded_wct",
    "sharded_mc_histogram",
]


def pad_scales(scales: np.ndarray, parts: int) -> tuple[np.ndarray, int]:
    """Pad the scale vector so its length divides the 'scale' mesh axis.

    Padded entries replicate the last scale; callers mask them out of
    reductions using the returned true length.
    """
    S = len(scales)
    rem = (-S) % parts
    if rem:
        scales = np.concatenate([scales, np.full(rem, scales[-1])])
    return scales, S


def sharded_cwt(mesh: Mesh, signals, scales, dt, *, mother: Mother, nfft: int):
    """Batched CWT with the batch on the 'data' axis and the filter-bank rows
    on the 'scale' axis: ``W[b, s, t]`` comes out sharded ``P('data','scale',None)``.

    Each chip FFTs its local batch shard (replicated over 'scale'), applies its
    block of scale rows, and runs local iFFTs — zero communication in the
    forward pass (the reference's whole transform, distributed for free).
    """
    ds = NamedSharding(mesh, P("data", None))
    ss = NamedSharding(mesh, P("scale"))
    signals = jax.device_put(signals, ds)
    scales = jax.device_put(scales, ss)
    fn = jax.jit(
        functools.partial(cwt_batch, mother=mother, nfft=nfft),
        out_shardings=(
            NamedSharding(mesh, P("data", "scale", None)),
            NamedSharding(mesh, P("data", None)),
        ),
    )
    return fn(signals, scales, dt)


def sharded_power_pipeline(mesh: Mesh, signals, scales, dt, dj, *,
                           mother: Mother, nfft: int, n_true_scales: int):
    """The flagship end-to-end analysis step, fully sharded:

    normalize → CWT → power → global wavelet spectrum (time average) →
    inverse CWT (psum over 'scale') → scale-averaged power (TC98 eq. 24,
    psum over 'scale').

    Mirrors the reference demo flow (``sample/sample.py:69-107``) as one jit.
    Returns ``(power, global_ws, iwave, scale_avg)``.
    """
    S_pad = len(scales)

    def step(x, sj):
        mask = (jnp.arange(S_pad) < n_true_scales)[:, None]
        x = (x - x.mean(axis=-1, keepdims=True)) / x.std(axis=-1, keepdims=True)
        W, _ = cwt_batch(x, sj, dt, mother=mother, nfft=nfft)
        power = jnp.abs(W) ** 2
        global_ws = jnp.mean(power, axis=-1)                   # (B, S)
        iw = icwt_batch(W * mask, sj, dt, dj, mother=mother)   # psum over scale
        # TC98 eq. 24: scale-averaged power dj·dt/Cdelta·Σ_s P/s
        cd = mother.cdelta if mother.cdelta != -1 else 1.0
        scale_avg = (dj * dt / cd) * jnp.sum(
            power * mask[None] / sj[None, :, None], axis=-2
        )                                                       # (B, n0)
        return power, global_ws, iw, scale_avg

    ds = NamedSharding(mesh, P("data", None))
    ss = NamedSharding(mesh, P("scale"))
    fn = jax.jit(
        step,
        in_shardings=(ds, ss),
        out_shardings=(
            NamedSharding(mesh, P("data", "scale", None)),
            NamedSharding(mesh, P("data", "scale")),
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data", None)),
        ),
    )
    return fn(signals, scales)


def sharded_wct(mesh: Mesh, y1, y2, scales, dt, dj, *, mother: Mother, nfft: int):
    """Batched wavelet-coherence with the batch sharded on 'data'.

    The scale-axis boxcar smoothing couples neighboring scale rows, so this
    pipeline keeps scales replicated and shards the (typically much larger)
    batch/ensemble dimension — the right layout for WCT workloads where the
    batch is the MC ensemble.
    """
    from ..coherence import _wct_core

    ds = NamedSharding(mesh, P("data", None))
    y1 = jax.device_put(y1, ds)
    y2 = jax.device_put(y2, ds)
    dt = float(dt)  # static in the inner jit — close over it
    fn = jax.jit(
        lambda a, b, sc: _wct_core(a, b, sc, dt, mother=mother, nfft=nfft, dj=dj),
        out_shardings=NamedSharding(mesh, P("data", None, None)),
    )
    return fn(y1, y2, jnp.asarray(scales))


def sharded_mc_histogram(mesh: Mesh, key, scales, outsidecoi, dt, *,
                         mother: Mother, nfft: int, dj: float,
                         per_device_batch: int, n: int, al1: float, al2: float,
                         nbins: int = 1000):
    """Monte-Carlo coherence histogram sharded over the 'mc' mesh axis.

    Each device generates ``per_device_batch`` AR(1) surrogate pairs (keys
    folded by mesh position so streams are independent), runs the full
    CWT→smooth→coherence pipeline locally, scatter-adds its histogram, and a
    single ``psum`` over 'mc' reduces the ``(S, nbins)`` counters — one
    crossing of the chip boundary per run (SURVEY.md §3.3 TPU mapping).
    """
    from ..coherence import _wct_core

    S = scales.shape[0]

    def shard_fn(key, sj, oc):
        idx = jax.lax.axis_index("mc")
        k = jax.random.fold_in(key, idx)
        k1, k2 = jax.random.split(k)
        noise1 = rednoise_batch(k1, n, al1, 1.0, batch=per_device_batch,
                                dtype=sj.dtype)
        noise2 = rednoise_batch(k2, n, al2, 1.0, batch=per_device_batch,
                                dtype=sj.dtype)
        R2, _, _ = _wct_core(noise1, noise2, sj, dt, mother=mother,
                             nfft=nfft, dj=dj)
        bins = jnp.clip(jnp.floor(R2 * nbins).astype(jnp.int32), 0, nbins - 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, R2.shape, 1)
        flat = (rows * nbins + bins).reshape(-1)
        w = jnp.broadcast_to(oc[None], R2.shape).reshape(-1).astype(jnp.float32)
        hist = jnp.zeros((S * nbins,), jnp.float32).at[flat].add(w)
        return jax.lax.psum(hist.reshape(S, nbins), axis_name="mc")

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)(key, jnp.asarray(scales), jnp.asarray(outsidecoi))
