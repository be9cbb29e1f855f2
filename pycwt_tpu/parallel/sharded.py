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
from ..ops.smoothing import smooth_scale_sharded
from ..stats import rednoise_members
from ..transform import cwt_batch, icwt_batch

__all__ = [
    "pad_scales",
    "sharded_cwt",
    "sharded_power_pipeline",
    "sharded_wct",
    "sharded_wct_pairs",
    "sharded_mc_histogram",
    "sharded_mc_histogram_pairs",
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


def sharded_cwt(mesh: Mesh, signals, scales, dt, *, mother: Mother, nfft: int,
                engine: str | None = None):
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
        functools.partial(cwt_batch, mother=mother, nfft=nfft, engine=engine),
        out_shardings=(
            NamedSharding(mesh, P("data", "scale", None)),
            NamedSharding(mesh, P("data", None)),
        ),
    )
    return fn(signals, scales, dt)


def sharded_power_pipeline(mesh: Mesh, signals, scales, dt, dj, *,
                           mother: Mother, nfft: int, n_true_scales: int,
                           engine: str | None = None):
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
        W, _ = cwt_batch(x, sj, dt, mother=mother, nfft=nfft, engine=engine)
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


def sharded_wct(mesh: Mesh, y1, y2, scales, dt, dj, *, mother: Mother, nfft: int,
                engine: str | None = None, n_true_scales: int | None = None):
    """Batched wavelet-coherence sharded over 'data' AND (when the mesh's
    'scale' axis is >1) over 'scale' — output layout ``P('data','scale',None)``.

    With scales replicated ('scale' axis size 1) this is a plain pjit of the
    batched core.  With scales sharded, the pipeline runs in a ``shard_map``:
    each device computes its scale block's CWT rows and time-Gaussian
    smoothing locally, and the scale-axis boxcar (the one op that couples
    neighboring scale rows — reference ``mothers.py:98-102``) exchanges halo
    rows with mesh neighbors via ``ppermute``
    (:func:`pycwt_tpu.ops.smoothing.scale_boxcar_same_sharded`).

    ``scales`` must be padded to a multiple of the 'scale' axis size
    (:func:`pad_scales`); pass the true count as ``n_true_scales`` so padded
    rows are masked to the zero-padding the unsharded 'same' convolution sees.
    Rows ≥ ``n_true_scales`` of the output are garbage — slice them off.
    """
    from ..coherence import _wct_core

    dt = float(dt)  # static in the inner jit — close over it
    n_scale = mesh.shape["scale"]
    ds = NamedSharding(mesh, P("data", None))

    if n_scale == 1:
        y1 = jax.device_put(y1, ds)
        y2 = jax.device_put(y2, ds)
        fn = jax.jit(
            lambda a, b, sc: _wct_core(a, b, sc, dt, mother=mother, nfft=nfft,
                                       dj=dj, engine=engine),
            out_shardings=NamedSharding(mesh, P("data", None, None)),
        )
        return fn(y1, y2, jnp.asarray(scales))

    S_pad = len(scales)
    if S_pad % n_scale:
        raise ValueError(
            f"{S_pad} scales not divisible by scale-axis size {n_scale}; "
            "use pad_scales()")
    n_true = S_pad if n_true_scales is None else n_true_scales

    def shard_fn(y1l, y2l, sjl):
        # Local shapes: y (B_loc, n0) [replicated over 'scale'], sjl (S_loc,).
        W1, _ = cwt_batch(y1l, sjl, dt, mother=mother, nfft=nfft, engine=engine)
        W2, _ = cwt_batch(y2l, sjl, dt, mother=mother, nfft=nfft, engine=engine)
        s_col = sjl[:, None]
        kw = dict(axis_name="scale", n_true_scales=n_true, engine=engine)
        S1 = smooth_scale_sharded(jnp.abs(W1) ** 2 / s_col, dt, dj, sjl, mother, **kw)
        S2 = smooth_scale_sharded(jnp.abs(W2) ** 2 / s_col, dt, dj, sjl, mother, **kw)
        W12 = W1 * jnp.conj(W2)
        S12 = smooth_scale_sharded(W12 / s_col, dt, dj, sjl, mother, **kw)
        WCT = jnp.abs(S12) ** 2 / (S1 * S2)
        return WCT, jnp.angle(W12), W12

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("scale")),
        out_specs=(P("data", "scale", None),) * 3,
        check_vma=False,  # padded-row masking uses axis_index ('scale'-varying)
    )
    y1 = jax.device_put(y1, ds)
    y2 = jax.device_put(y2, ds)
    return jax.jit(fn)(y1, y2, jnp.asarray(scales))


def sharded_wct_pairs(mesh: Mesh, y1, y2, scales, dt, dj, *,
                      mother: Mother, nfft: int, engine: str | None = None):
    """``B`` independent coherence pairs data-parallel over the mesh: each
    chip runs the FULL WCT pipeline (CWTs, smoothings, coherence) on its
    shard of the pair axis with the scale grid replicated — zero
    communication, linear scaling in pairs.  The embarrassingly-parallel
    counterpart to :func:`sharded_wct` (which shards the scale axis of ONE
    pair); compose with :func:`pycwt_tpu.coherence.wct_significance` for the
    per-pair null curves.

    ``y1, y2``: ``(B, n0)`` already-normalized (or raw — normalization is
    per-pair inside the step).  Returns ``(WCT, aWCT)`` sharded
    ``P('data', None, None)``.
    """
    from ..coherence import _wct_core

    scales_j = jax.device_put(jnp.asarray(scales),
                              NamedSharding(mesh, P()))

    def step(a, b):
        a = (a - a.mean(-1, keepdims=True)) / a.std(-1, keepdims=True)
        b = (b - b.mean(-1, keepdims=True)) / b.std(-1, keepdims=True)
        WCT, aWCT, _ = _wct_core(a, b, scales_j, dt, mother=mother,
                                 nfft=nfft, dj=dj, engine=engine)
        return WCT, aWCT

    ds = NamedSharding(mesh, P("data", None))
    out = NamedSharding(mesh, P("data", None, None))
    fn = jax.jit(step, in_shardings=(ds, ds), out_shardings=(out, out))
    return fn(jnp.asarray(y1), jnp.asarray(y2))


def sharded_wct_matrix(mesh: Mesh, y, pairs, scales, dt, dj, *,
                       mother: Mother, nfft: int, engine: str | None = None,
                       block: int = 8, axis_name: str = "data",
                       precision: str = "high"):
    """All-pairs coherence (:func:`pycwt_tpu.coherence.wct_matrix`'s core)
    with the PAIR axis sharded over the mesh: the signal set is replicated
    (B signals are the small input), each chip amortizes the full set's CWT +
    self-smoothings locally and computes its shard of the pair list — zero
    communication, linear scaling in pairs, amortization preserved per chip.

    ``y``: ``(B, n0)`` raw signals (normalized per signal inside the step);
    ``pairs``: ``(P, 2)`` int32 indices with ``P`` divisible by
    ``n_devices·block``.  Returns ``(WCT, aWCT)`` sharded
    ``P('data', None, None)`` on the pair axis.
    """
    from ..coherence import _wct_matrix_scan

    pairs = np.asarray(pairs, np.int32)
    B = np.asarray(y).shape[0]
    if pairs.size and (pairs.min() < 0 or pairs.max() >= B):
        # Validate HOST-side: inside jit an out-of-range jnp.take fills NaN
        # silently instead of erroring (matches wct_matrix's check).
        raise ValueError(f"pair indices out of range for B={B} signals")
    D = mesh.shape[axis_name]
    if pairs.shape[0] % (D * block):
        raise ValueError(
            f"pair count {pairs.shape[0]} must be divisible by "
            f"n_devices*block = {D * block} (pad by repeating pairs)")
    pairs = jnp.asarray(pairs)
    scales_j = jnp.asarray(scales)

    def local_step(y_full, pi_loc, pj_loc):
        yn = (y_full - y_full.mean(-1, keepdims=True)) / \
            y_full.std(-1, keepdims=True)
        return _wct_matrix_scan(yn, pi_loc, pj_loc, scales_j, dt,
                                mother=mother, nfft=nfft, dj=dj,
                                engine=engine, block=block,
                                precision=precision)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name, None, None), P(axis_name, None, None)),
        check_vma=False,
    )
    y = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P()))
    return jax.jit(fn)(y, pairs[:, 0], pairs[:, 1])


def sharded_mc_histogram(mesh: Mesh, key, scales, outsidecoi, dt, *,
                         mother: Mother, nfft: int, dj: float,
                         per_device_batch: int, n: int, al1: float, al2: float,
                         nbins: int = 1000, engine: str | None = None):
    """Monte-Carlo coherence histogram sharded over the 'mc' mesh axis.

    Each device generates ``per_device_batch`` AR(1) surrogate pairs, runs the
    full CWT→smooth→coherence pipeline locally, scatter-adds its histogram,
    and a single ``psum`` over 'mc' reduces the ``(S, nbins)`` counters — one
    crossing of the chip boundary per run (SURVEY.md §3.3 TPU mapping).

    Surrogate streams are keyed by *global* ensemble index
    (``axis_index('mc')·per_device_batch + arange``) via
    :func:`pycwt_tpu.stats.rednoise_members`, so the reduced histogram is
    bit-identical across every mc-mesh factorization of the same total count —
    and identical to the single-device chunked loop in
    ``coherence.wct_significance`` (pinned in ``tests/test_sharding.py``).
    """
    from ..coherence import _wct_core

    S = scales.shape[0]

    def shard_fn(key, sj, oc):
        start = jax.lax.axis_index("mc") * per_device_batch
        idx = start + jnp.arange(per_device_batch)
        k1, k2 = jax.random.split(key)
        noise1 = rednoise_members(k1, idx, n, al1, 1.0, dtype=sj.dtype)
        noise2 = rednoise_members(k2, idx, n, al2, 1.0, dtype=sj.dtype)
        R2, _, _ = _wct_core(noise1, noise2, sj, dt, mother=mother,
                             nfft=nfft, dj=dj, engine=engine)
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


def sharded_mc_histogram_pairs(mesh: Mesh, key, scales, outsidecoi, slots,
                               g1, g2, mc_count, dt, *, mother: Mother,
                               nfft: int, dj: float, batch: int, nchunks: int,
                               n: int, tau: int, engine: str | None = None,
                               axis_name: str = "mc"):
    """Distinct-null Monte-Carlo histograms with the NULL axis sharded over a
    mesh axis — the multi-chip form of the batched-alpha significance sweep
    (``coherence.wct_significance_batch``): each device runs the FULL
    ensemble for its local slice of null slots (one fused fori-loop
    dispatch, zero communication — nulls are independent), and the gathered
    ``(P, S, NBINS)`` counters come back pair-sharded.

    Because member streams are keyed by (stable hash slot, global member
    index) — not by device or position — the result is bit-identical to the
    single-device :func:`coherence._mc_histogram_run_pairs` over the same
    slots for ANY mesh factorization (pinned in ``tests/test_sharding.py``).
    ``len(slots)`` must divide by the mesh axis size (pad with repeats of
    the last slot and drop the tail, as the single-device surface does for
    its pair blocks).
    """
    from ..coherence import _mc_histogram_run_pairs

    D = mesh.shape[axis_name]
    if len(slots) % D:
        raise ValueError(
            f"slots ({len(slots)}) must divide the '{axis_name}' axis ({D});"
            " pad with repeats of the last slot and drop the tail rows")

    def shard_fn(key, sj, oc, slots_l, g1_l, g2_l, mc):
        return _mc_histogram_run_pairs(
            key, sj, oc, slots_l, g1_l, g2_l, mc, dt, mother=mother,
            nfft=nfft, dj=dj, batch=batch, nchunks=nchunks, n=n, tau=tau,
            engine=engine)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(axis_name), P(axis_name),
                  P()),
        out_specs=P(axis_name),
        check_vma=False,  # device-varying slots feed an unvarying fori carry
    )
    return jax.jit(fn)(key, jnp.asarray(scales), jnp.asarray(outsidecoi),
                       jnp.asarray(slots), jnp.asarray(g1), jnp.asarray(g2),
                       jnp.asarray(mc_count, jnp.int32))
