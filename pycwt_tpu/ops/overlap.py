"""Overlap-save blocked CWT for long signals (sequence parallelism, SURVEY P3).

The reference holds the whole signal in one array and does one global
pow-2-padded FFT (``/root/reference/pycwt/wavelet.py:91``).  For N beyond what
one chip's HBM fits (the (S × N) transform is the constraint: 64 scales ×
complex64 ≈ 512 B/sample), we block the time axis and convolve each chunk
independently — the classic overlap-save scheme, with the halo sized by the
mother wavelet's e-folding support at the largest scale:

    halo = ceil(ζ · s_max / dt) samples,  ζ = sqrt(−2·ln ε)

(|ψ(t/s)| ≤ e^{−t²/2s²} for the Gaussian-envelope mothers; ε is the truncation
tolerance).  Interior outputs match the global transform to round-off; the
outer ``halo`` samples of the first/last chunk differ only inside the region
the COI masks anyway — "cone-of-influence padding" is the domain's natural
overlap contract (SURVEY.md §5).

Three execution modes, all device-resident and memory-bounded:

* :func:`cwt_overlap_save` — ``lax.scan`` over chunks on one device.  Peak
  intermediate memory is ONE chunk's (S × nfft_c) transform (plus the output
  itself), versus the global path's (S × nfft_global) — the per-chunk
  working set is ~N/chunk× smaller.  The planar variant
  (:func:`cwt_overlap_save_planar`, donated-buffer chunk loop — a scan
  carrying the output planes would double-buffer them) runs a 2^24-point
  64-scale full-W transform on one v5e in 0.428 s (2.5e9 sample-scales/s,
  BASELINE.md round 5) where the global spectral path's intermediates
  (~17 GB) exhaust HBM.
* :func:`streamed_global_power` — same scan but only the running Σ_t |W|²
  accumulator survives a chunk: peak memory ∝ chunk, independent of N.
  This is the N≫HBM global-spectrum path.
* :func:`sharded_cwt_overlap_save` — the time axis sharded over the 'data'
  mesh axis: each device holds a contiguous slab of the *input*, exchanges
  ``halo`` edge samples with its mesh neighbors via ``ppermute`` (zero-filled
  at the global edges — identical to the zero-pad semantics of the global
  FFT), and scans its own chunks locally.  Output comes out time-sharded
  ``P(None, 'data')``; no other communication.

**Near-Nyquist caveat.** For scales where the mother's spectrum is still
large at the Nyquist frequency (Morlet-6 at the TC98 default smallest scale
``s0 = 2dt/λ`` has ψ̂(s·π/dt) ≈ 0.96), the frequency-truncated filter's
impulse response rings with only ~1/t decay, so *any* finite halo leaves
blocked-vs-global discretization differences of order ψ̂(s·Ω_nyq)/t.  Scales
with ``s ≳ 4dt`` agree with the global transform to f32 round-off; the finest
one-to-two scales agree to ~1e-2 relative (the same order as their inherent
sampling aliasing — these scales are questionable in any discretization, ours
or the reference's).
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import next_pow2
from ..mothers import Mother
from ..transform import cwt_batch

__all__ = [
    "halo_samples",
    "cwt_overlap_save",
    "cwt_overlap_save_planar",
    "streamed_global_power",
    "streamed_global_power_planar",
    "sharded_cwt_overlap_save",
    "wct_overlap_planar",
    "sharded_wct_overlap_planar",
    "xwt_overlap_planar",
]


def halo_samples(max_scale: float, dt: float, eps: float = 1e-7) -> int:
    """Samples of wavelet support to overlap: ζ·s_max/dt, ζ = sqrt(−2 ln ε)."""
    zeta = math.sqrt(-2.0 * math.log(eps))
    return int(math.ceil(zeta * max_scale / dt))


def _warn_near_nyquist(scales, dt: float, mother: Mother,
                       tol: float = 1e-3) -> None:
    """Make the near-Nyquist caveat (module docstring) enforceable: if the
    mother's spectrum is non-negligible at the Nyquist frequency for the
    finest requested scale, blocked-vs-global agreement degrades to ~1e-2
    there — warn the caller instead of leaving it docstring-only
    (VERDICT r2 weak #9).  TC98-default grids (``s0 = 2dt/λ``) trigger this;
    ``s ≳ 4dt`` grids do not."""
    sj = np.asarray(scales, np.float64).ravel()
    env = np.asarray(
        mother.psi_ft_envelope(jnp.asarray(sj * math.pi / dt, jnp.float32)))
    worst = int(np.argmax(env))
    if env[worst] > tol:
        import warnings

        warnings.warn(
            f"overlap-save: scale {sj[worst]:.4g} has |psi_ft| = "
            f"{env[worst]:.2g} at the Nyquist frequency; its blocked "
            f"transform agrees with the global one only to ~1e-2 relative "
            f"near the edges of each chunk (scales >= ~4*dt = {4 * dt:.4g} "
            "agree to round-off). See pycwt_tpu/ops/overlap.py near-Nyquist "
            "caveat.",
            stacklevel=3,
        )


def _pad_for_chunks(signal, chunk: int, H: int):
    signal = jnp.asarray(signal)
    N = signal.shape[-1]
    n_chunks = (N + chunk - 1) // chunk
    padded = jnp.zeros(n_chunks * chunk + 2 * H, dtype=signal.dtype)
    padded = jax.lax.dynamic_update_slice(padded, signal, (H,))
    return padded, N, n_chunks


def cwt_overlap_save(signal, scales, dt: float, *, mother: Mother,
                     chunk: int = 1 << 18, eps: float = 1e-7,
                     engine: str | None = None):
    """Blocked CWT of a long 1-D signal with bounded working memory.

    Chunks are processed sequentially in a ``lax.scan``; each step's transform
    ((S × nfft_c) with ``nfft_c = pow2(chunk + 2·halo)``) is freed before the
    next, so peak memory ≈ output (S × N) + ONE chunk — not the
    (n_chunks × S × nfft) batch of a naive blocked implementation and not the
    (S × pow2(N)) padded intermediate of the global path.

    Returns ``(S, N)`` complex W.  Interior samples (≥ halo from either end)
    are identical to the global-FFT transform; the edges follow zero-padding
    semantics (inside the COI either way).
    """
    scales = jnp.asarray(scales)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    signal = jnp.asarray(signal)
    N = signal.shape[-1]
    if N <= chunk:
        nfft = next_pow2(N)
        W, _ = cwt_batch(signal[None], scales, dt, mother=mother, nfft=nfft,
                         engine=engine)
        return W[0]

    padded, N, n_chunks = _pad_for_chunks(signal, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    S = scales.shape[0]
    cdt = jnp.complex128 if padded.dtype == jnp.float64 else jnp.complex64

    run = _overlap_scan_fn(mother, float(dt), nfft, chunk, H, n_chunks, S,
                           jnp.dtype(cdt).name, engine)
    return run(padded, scales)[:, :N]


@functools.lru_cache(maxsize=64)
def _overlap_scan_fn(mother, dt, nfft, chunk, H, n_chunks, S, cdt_name,
                     engine):
    """Jitted chunk-scan, cached on its static configuration so repeated
    calls with the same shapes reuse one compiled executable."""
    cdt = jnp.dtype(cdt_name)

    @jax.jit
    def run(padded, scales):
        def body(carry, i):
            slab = jax.lax.dynamic_slice(padded, (i * chunk,), (chunk + 2 * H,))
            W, _ = cwt_batch(slab[None], scales, dt, mother=mother, nfft=nfft,
                             engine=engine)
            # cwt_batch may upcast (e.g. f32 signal under x64 → complex128);
            # the carry keeps the signal-implied dtype.
            carry = jax.lax.dynamic_update_slice(
                carry, W[0, :, H:H + chunk].astype(cdt), (0, i * chunk))
            return carry, None

        out0 = jnp.zeros((S, n_chunks * chunk), dtype=cdt)
        out, _ = jax.lax.scan(body, out0, jnp.arange(n_chunks))
        return out

    return run


def streamed_global_power(signal, scales, dt: float, *, mother: Mother,
                          chunk: int = 1 << 18, eps: float = 1e-7,
                          engine: str | None = None):
    """Σ_t |W[s, t]|² of a long signal with peak memory ∝ chunk, independent
    of N — the N≫HBM global-wavelet-spectrum path (TC98 eq. 22 numerator;
    the reference materializes all of W first, ``sample/sample.py:90``).

    Returns ``(S,)`` real.  Divide by N for the mean.
    """
    scales = jnp.asarray(scales)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    signal = jnp.asarray(signal)
    padded, N, n_chunks = _pad_for_chunks(signal, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    S = scales.shape[0]
    run = _streamed_power_fn(mother, float(dt), nfft, chunk, H, n_chunks, S,
                             N, jnp.dtype(padded.dtype).name, engine)
    return run(padded, scales)


@functools.lru_cache(maxsize=64)
def _streamed_power_fn(mother, dt, nfft, chunk, H, n_chunks, S, N, rdt_name,
                       engine):
    rdt = jnp.dtype(rdt_name)

    @jax.jit
    def run(padded, scales):
        def body(acc, i):
            slab = jax.lax.dynamic_slice(padded, (i * chunk,), (chunk + 2 * H,))
            W, _ = cwt_batch(slab[None], scales, dt, mother=mother, nfft=nfft,
                             engine=engine)
            Wc = W[0, :, H:H + chunk]
            # Mask the zero-pad tail of the final chunk out of the sum.
            t = i * chunk + jnp.arange(chunk)
            p = jnp.where((t < N)[None, :], jnp.abs(Wc) ** 2, 0)
            return acc + p.sum(axis=-1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((S,), rdt), jnp.arange(n_chunks))
        return acc

    return run


def sharded_cwt_overlap_save(mesh: Mesh, signal, scales, dt: float, *,
                             mother: Mother, chunk: int = 1 << 16,
                             eps: float = 1e-7, engine: str | None = None,
                             axis_name: str = "data", auto_pad: bool = False):
    """Time-axis-SHARDED overlap-save CWT: sequence parallelism over the mesh.

    The input ``(N,)`` signal is sharded ``P('data')`` — each device owns a
    contiguous slab of N/n_dev samples (N must divide evenly and the slab must
    be a multiple of ``chunk``).  Devices exchange ``halo`` edge samples with
    neighbors via ``ppermute`` (the global edges receive zeros — identical to
    the global FFT's zero-padding), then scan their local chunks with NO
    further communication.  Output is ``(S, N)`` sharded ``P(None, 'data')``:
    the (S × N) transform — 512 B/sample at 64 scales f32 — never exists on
    one device.

    This is the device-resident halo-exchange design SURVEY §2b P3 calls for;
    the reference's only long-signal concession is pow-2 padding
    (``/root/reference/pycwt/helpers.py:27-30``).
    """
    scales_j = jnp.asarray(scales)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales_j, dt, mother)
    signal = jnp.asarray(signal)
    N = signal.shape[-1]
    n_dev = mesh.shape[axis_name]
    if auto_pad:
        # Zero-pad up to a multiple of n_dev·chunk (matches the zero-pad edge
        # semantics of the unpadded path), compute, and trim the tail.
        step = n_dev * chunk
        N_pad = ((N + step - 1) // step) * step
        if N_pad != N:
            sig_p = jnp.pad(signal, (0, N_pad - N))
            W = sharded_cwt_overlap_save(
                mesh, sig_p, scales_j, dt, mother=mother, chunk=chunk,
                eps=eps, engine=engine, axis_name=axis_name)
            return W[:, :N]
    if N % n_dev:
        raise ValueError(f"N={N} not divisible by {n_dev} devices "
                         "(pass auto_pad=True to zero-pad)")
    N_loc = N // n_dev
    if N_loc % chunk:
        raise ValueError(f"local slab {N_loc} not a multiple of chunk {chunk}")
    if H > N_loc:
        raise ValueError(f"halo {H} exceeds local slab {N_loc}; "
                         "use fewer shards or a larger slab")
    n_chunks = N_loc // chunk
    nfft = next_pow2(chunk + 2 * H)
    S = scales_j.shape[0]
    cdt = jnp.complex128 if signal.dtype == jnp.float64 else jnp.complex64

    fn = _sharded_overlap_fn(mesh, mother, float(dt), nfft, chunk, H, n_dev,
                             n_chunks, N_loc, S, jnp.dtype(cdt).name, engine,
                             axis_name)
    signal = jax.device_put(signal, NamedSharding(mesh, P(axis_name)))
    return fn(signal, scales_j)


@functools.lru_cache(maxsize=32)
def _sharded_overlap_fn(mesh, mother, dt, nfft, chunk, H, n_dev, n_chunks,
                        N_loc, S, cdt_name, engine, axis_name):
    """Jitted shard_map for :func:`sharded_cwt_overlap_save`, cached on its
    static configuration (meshes are hashable) to avoid per-call retraces."""
    cdt = jnp.dtype(cdt_name)

    def shard_fn(sig_loc, sj):
        # Halo exchange: last H samples → next device, first H → previous.
        left = jax.lax.ppermute(
            sig_loc[-H:], axis_name, [(i, i + 1) for i in range(n_dev - 1)])
        right = jax.lax.ppermute(
            sig_loc[:H], axis_name, [(i + 1, i) for i in range(n_dev - 1)])
        padded = jnp.concatenate([left, sig_loc, right])  # (N_loc + 2H,)

        def body(carry, i):
            slab = jax.lax.dynamic_slice(padded, (i * chunk,),
                                         (chunk + 2 * H,))
            W, _ = cwt_batch(slab[None], sj, dt, mother=mother, nfft=nfft,
                             engine=engine)
            carry = jax.lax.dynamic_update_slice(
                carry, W[0, :, H:H + chunk].astype(cdt), (0, i * chunk))
            return carry, None

        out0 = jnp.zeros((S, N_loc), dtype=cdt)
        out, _ = jax.lax.scan(body, out0, jnp.arange(n_chunks))
        return out

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(None, axis_name),
        check_vma=False,  # ppermute halo is deliberately position-dependent
    )
    return jax.jit(fn)


# --------------------------------------------------------------------------
# Planar (complex-free) long-signal paths — the variants that run on the
# tunneled axon runtime, whose complex64 support is absent (ops/fft.py).
# These are what tools/tpu_bench_long.py measures on the real chip
# (VERDICT r4 next #3): the complex surfaces above are engine-generic but
# cannot execute where complex64 is UNIMPLEMENTED.

def _planar_chunk_transform(slab, scales32, mother, nfft, dt, precision,
                            output):
    """One chunk's planar CWT: half-spectrum forward MXU DFT → fused planar
    Pallas kernel (or the small planar-XLA formulation below its floor)."""
    from .mxu_dft import fft_of_real_planar
    from .pallas_fft import _small_planar_xla, fused_cwt_planar, \
        supported_nfft

    interpret = jax.default_backend() not in ("tpu", "axon")
    sr, si = fft_of_real_planar(slab, nfft)
    if supported_nfft(nfft):
        return fused_cwt_planar(sr, si, scales32, mother=mother, nfft=nfft,
                                dt=float(dt), interpret=interpret,
                                precision=precision, output=output)
    # Below the fused kernel's floor the planar-XLA formulation always runs
    # at HIGHEST — same convention as _wct_core_planar and fused_cwt_planar's
    # own small path (the tier knob is a property of the fused kernel's MXU
    # substages; small transforms are a handful of tiles where HIGHEST is
    # already the measured-fastest choice, BASELINE.md round 3).
    wr, wi = _small_planar_xla(sr, si, scales32, mother=mother, nfft=nfft,
                               dt=float(dt),
                               precision=jax.lax.Precision.HIGHEST)
    if output == "power":
        return wr * wr + wi * wi
    return wr, wi


@functools.lru_cache(maxsize=64)
def _overlap_step_planar_fn(mother, dt, nfft, chunk, H, precision):
    """One donated-buffer chunk update.  A ``lax.scan`` carrying the (S, N)
    output planes DOUBLE-BUFFERS them (carry-in + carry-out live across the
    step), which is exactly what OOMed the 2^24 full-W measurement: 2 × 8.6
    GB of planes > 16 GB HBM.  Donating the planes into a per-chunk jit
    makes the update truly in-place — peak memory is the output + ONE
    chunk's workspace, and the Python chunk loop costs one dispatch per
    chunk (~ms each; the round-5 chip run measures the total)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(cr, ci, padded, scales, i):
        slab = jax.lax.dynamic_slice(padded, (i * chunk,), (chunk + 2 * H,))
        wr, wi = _planar_chunk_transform(slab, scales, mother, nfft, dt,
                                         precision, "planes")
        z = jnp.zeros((), i.dtype)
        cr = jax.lax.dynamic_update_slice(cr, wr[:, H:H + chunk],
                                          (z, i * chunk))
        ci = jax.lax.dynamic_update_slice(ci, wi[:, H:H + chunk],
                                          (z, i * chunk))
        return cr, ci

    return step


def cwt_overlap_save_planar(signal, scales, dt: float, *, mother: Mother,
                            chunk: int = 1 << 18, eps: float = 1e-7,
                            precision: str = "high"):
    """:func:`cwt_overlap_save` with NO complex dtype anywhere: the chunk
    transform is the fused planar Pallas pipeline and the output is the
    planar pair ``(wr, wi)``, each ``(S, N)`` float32.  Same halo contract
    and near-Nyquist caveat as the complex surface; chip-measured at
    N = 2^22..2^24 in BASELINE.md round 5."""
    scales = jnp.asarray(scales, jnp.float32)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    signal = jnp.asarray(signal, jnp.float32)
    N = signal.shape[-1]
    if N <= chunk:
        nfft = next_pow2(N)
        wr, wi = _planar_chunk_transform(
            jnp.pad(signal, (0, nfft - N))[:nfft], scales, mother, nfft, dt,
            precision, "planes")
        return wr[:, :N], wi[:, :N]
    padded, N, n_chunks = _pad_for_chunks(signal, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    step = _overlap_step_planar_fn(mother, float(dt), nfft, chunk, H,
                                   precision)
    S = scales.shape[0]
    cr = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    ci = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    for i in range(n_chunks):
        cr, ci = step(cr, ci, padded, scales, jnp.int32(i))
    return cr[:, :N], ci[:, :N]


@functools.lru_cache(maxsize=64)
def _streamed_power_planar_fn(mother, dt, nfft, chunk, H, n_chunks, S, N,
                              precision):
    @jax.jit
    def run(padded, scales):
        def body(acc, i):
            slab = jax.lax.dynamic_slice(padded, (i * chunk,),
                                         (chunk + 2 * H,))
            pw = _planar_chunk_transform(slab, scales, mother, nfft, dt,
                                         precision, "power")
            pc = pw[:, H:H + chunk]
            t = i * chunk + jnp.arange(chunk)
            pc = jnp.where((t < N)[None, :], pc, 0)
            return acc + pc.sum(axis=-1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((S,), jnp.float32),
                              jnp.arange(n_chunks))
        return acc

    return run


def streamed_global_power_planar(signal, scales, dt: float, *,
                                 mother: Mother, chunk: int = 1 << 18,
                                 eps: float = 1e-7, precision: str = "high"):
    """:func:`streamed_global_power` with no complex dtype: the chunk
    transform uses the fused kernel's in-kernel ``power`` epilogue, so only
    the running ``(S,)`` accumulator survives a chunk — peak memory ∝ chunk,
    independent of N, on the planar-only runtime."""
    scales = jnp.asarray(scales, jnp.float32)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    signal = jnp.asarray(signal, jnp.float32)
    padded, N, n_chunks = _pad_for_chunks(signal, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    run = _streamed_power_planar_fn(mother, float(dt), nfft, chunk, H,
                                    n_chunks, scales.shape[0], N, precision)
    return run(padded, scales)


def _wct_chunk_pipeline(slab1, slab2, scales, mother, nfft, dt, dj,
                        precision, smooth_precision):
    """The blocked-coherence chunk math, shared VERBATIM by the
    single-device and mesh-sharded surfaces (a fix landing in only one
    would silently break their pinned agreement): two planar chunk CWTs →
    plane-packed smoothing → coherence ratio + phase."""
    from .smoothing import smooth_planar_pair

    w1r, w1i = _planar_chunk_transform(slab1, scales, mother, nfft, dt,
                                       precision, "planes")
    w2r, w2i = _planar_chunk_transform(slab2, scales, mother, nfft, dt,
                                       precision, "planes")
    s_col = scales[:, None]
    sp = jax.lax.Precision.HIGH if smooth_precision == "high" else None
    S1, S2 = smooth_planar_pair((w1r ** 2 + w1i ** 2) / s_col,
                                (w2r ** 2 + w2i ** 2) / s_col,
                                dt, dj, scales, mother, precision=sp)
    w12r = w1r * w2r + w1i * w2i
    w12i = w1i * w2r - w1r * w2i
    S12r, S12i = smooth_planar_pair(w12r / s_col, w12i / s_col,
                                    dt, dj, scales, mother, precision=sp)
    R = (S12r ** 2 + S12i ** 2) / (S1 * S2)
    A = jnp.arctan2(w12i, w12r)
    return R, A


@functools.lru_cache(maxsize=32)
def _wct_overlap_step_fn(mother, dt, dj, nfft, chunk, H, precision,
                         smooth_precision):
    """One donated-buffer chunk of the blocked coherence pipeline —
    :func:`_wct_chunk_pipeline` + in-place interior writes."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(cR, cA, p1, p2, scales, i):
        L = chunk + 2 * H
        slab1 = jax.lax.dynamic_slice(p1, (i * chunk,), (L,))
        slab2 = jax.lax.dynamic_slice(p2, (i * chunk,), (L,))
        R, A = _wct_chunk_pipeline(slab1, slab2, scales, mother, nfft, dt,
                                   dj, precision, smooth_precision)
        z = jnp.zeros((), i.dtype)
        cR = jax.lax.dynamic_update_slice(cR, R[:, H:H + chunk],
                                          (z, i * chunk))
        cA = jax.lax.dynamic_update_slice(cA, A[:, H:H + chunk],
                                          (z, i * chunk))
        return cR, cA

    return step


def wct_overlap_planar(y1, y2, scales, dt: float, *, mother: Mother,
                       dj: float, chunk: int = 1 << 18, eps: float = 1e-7,
                       precision: str = "high", normalize: bool = True,
                       smooth_precision: str | None = None):
    """Wavelet COHERENCE of two signals longer than HBM — overlap-save
    extended through the full WCT chain (reference ``wavelet.py:489-514``
    holds everything in one array).

    Every stage of the coherence pipeline is as LOCAL as the wavelet
    itself: the chunk CWTs have the mother's e-folding support and the
    time-Gaussian smoothing kernel has std ``s/dt`` samples — the same
    Gaussian family — so one composed halo of ``2·ζ·s_max/dt`` samples
    (wavelet support ⊗ smoothing support; ζ = sqrt(−2 ln eps)) makes each
    chunk's interior coherence equal the global computation to round-off
    for scales s ≳ 4·dt (near-Nyquist caveat as for the CWT; the scale-axis
    boxcar couples scales, not time, and runs whole per chunk).  Peak
    memory is the two (S, N) f32 output planes (donated in-place updates)
    plus ONE chunk's pipeline.

    Monte-Carlo significance needs NO long-signal variant: the null's
    surrogate length is ``ceil(6·s_max/dt)`` regardless of N
    (``wct_significance``/``_batch`` apply unchanged).

    ``smooth_precision="high"`` runs the smoothing einsums at 3-pass
    instead of 6-pass precision (~2e-4 absolute on the coherence — the same
    magnitude as the blocked-vs-global agreement bound — for a faster
    chunk); the default keeps HIGHEST.

    Near-Nyquist scales (the ~1e-2 caveat above) carry truncation
    differences that depend on WHERE the chunk boundaries fall: two runs
    with different ``chunk`` values agree to round-off for s ≥ 4·dt but
    may differ at the finest scales near their respective chunk edges
    (chip-measured: bit-identical at matched ``chunk``, worst-point ~0.1
    coherence at s = 2·dt across mismatched framings).  Match ``chunk``
    when comparing runs — including against
    :func:`sharded_wct_overlap_planar`, whose default is smaller (2^16, so
    per-device slabs divide).

    Returns ``(WCT, aWCT)``, each ``(S, N)`` float32.
    """
    scales = jnp.asarray(scales, jnp.float32)
    smax = float(np.max(np.asarray(scales)))
    H = 2 * halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    # Keep the signals on DEVICE (jnp) end-to-end: at long N the host
    # round-trip is seconds over slow links (BASELINE.md round-5 fetch
    # measurements) and normalization is two trivial device reductions.
    y1 = jnp.asarray(y1, jnp.float32)
    y2 = jnp.asarray(y2, jnp.float32)
    if y1.shape != y2.shape or y1.ndim != 1:
        raise ValueError(
            f"wct_overlap_planar expects matching 1-D signals, got "
            f"{y1.shape} vs {y2.shape}")
    if normalize:
        y1 = (y1 - y1.mean()) / y1.std()
        y2 = (y2 - y2.mean()) / y2.std()
    p1, N, n_chunks = _pad_for_chunks(y1, chunk, H)
    p2, _, _ = _pad_for_chunks(y2, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    step = _wct_overlap_step_fn(mother, float(dt), float(dj), nfft, chunk,
                                H, precision, smooth_precision)
    S = scales.shape[0]
    cR = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    cA = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    for i in range(n_chunks):
        cR, cA = step(cR, cA, p1, p2, scales, jnp.int32(i))
    return cR[:, :N], cA[:, :N]


@functools.lru_cache(maxsize=16)
def _sharded_wct_halo_fn(mesh, H, n_dev, axis_name):
    """ONE ppermute halo exchange per direction for the stacked signal pair:
    local (2, N_loc) slabs -> (2, N_loc + 2H) padded slabs (global edges
    zero-filled, matching the global zero-pad semantics)."""

    def shard_fn(pair_loc):
        left = jax.lax.ppermute(
            pair_loc[:, -H:], axis_name,
            [(i, i + 1) for i in range(n_dev - 1)])
        right = jax.lax.ppermute(
            pair_loc[:, :H], axis_name,
            [(i + 1, i) for i in range(n_dev - 1)])
        return jnp.concatenate([left, pair_loc, right], axis=-1)

    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,  # ppermute halo is deliberately position-dependent
    ))


@functools.lru_cache(maxsize=16)
def _sharded_wct_step_fn(mesh, mother, dt, dj, nfft, chunk, H, precision,
                         smooth_precision, axis_name):
    """One donated-buffer chunk step, shard-mapped: every device runs the
    shared chunk pipeline on chunk ``i`` of ITS slab and writes the interior
    into its shard of the output planes in place.  Per-chunk host dispatch
    with donation — NOT a lax.scan carrying the planes, which would
    double-buffer them (the exact pattern that OOMed the single-device
    full-W measurement, see _overlap_step_planar_fn)."""

    def shard_fn(cR, cA, padded, sj, i):
        L = chunk + 2 * H
        z = jnp.zeros((), i.dtype)
        slab = jax.lax.dynamic_slice(padded, (z, i * chunk), (2, L))
        R, A = _wct_chunk_pipeline(slab[0], slab[1], sj, mother, nfft, dt,
                                   dj, precision, smooth_precision)
        cR = jax.lax.dynamic_update_slice(cR, R[:, H:H + chunk],
                                          (z, i * chunk))
        cA = jax.lax.dynamic_update_slice(cA, A[:, H:H + chunk],
                                          (z, i * chunk))
        return cR, cA

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name),
                  P(None, axis_name), P(), P()),
        out_specs=(P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def sharded_wct_overlap_planar(mesh: Mesh, y1, y2, scales, dt: float, *,
                               mother: Mother, dj: float,
                               chunk: int = 1 << 16, eps: float = 1e-7,
                               precision: str = "high",
                               smooth_precision: str | None = None,
                               normalize: bool = True,
                               axis_name: str = "data"):
    """Time-axis-SHARDED blocked coherence: :func:`wct_overlap_planar` with
    the pair's time axis distributed over the mesh — sequence parallelism
    for coherence, completing the P3 symmetry (the CWT has had
    :func:`sharded_cwt_overlap_save` since round 2).

    Each device owns contiguous slabs of BOTH signals, exchanges the
    composed wavelet⊗smoothing halo (``2·ζ·s_max``) with its neighbors via
    one ``ppermute`` per direction (stacked pair — the global edges receive
    zeros, matching the global zero-pad), and scans its local chunks with
    no further communication (per-chunk donated in-place output updates —
    no scan carry double-buffering the planes).  Outputs come back
    ``(S, N)`` time-sharded ``P(None, axis_name)``; the full coherence map
    never exists on one device.  Matches the single-device
    :func:`wct_overlap_planar` to f32 round-off on every shard (pinned at
    atol 1e-5 in ``tests/test_overlap.py`` and in the multichip dryrun).
    """
    scales_j = jnp.asarray(scales, jnp.float32)
    smax = float(np.max(np.asarray(scales)))
    H = 2 * halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales_j, dt, mother)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    y1 = jnp.asarray(y1, jnp.float32)
    y2 = jnp.asarray(y2, jnp.float32)
    if y1.shape != y2.shape or y1.ndim != 1:
        raise ValueError(
            f"sharded_wct_overlap_planar expects matching 1-D signals, got "
            f"{y1.shape} vs {y2.shape}")
    if normalize:
        y1 = (y1 - y1.mean()) / y1.std()
        y2 = (y2 - y2.mean()) / y2.std()
    N = y1.shape[-1]
    n_dev = mesh.shape[axis_name]
    if N % n_dev:
        raise ValueError(f"N={N} not divisible by {n_dev} devices")
    N_loc = N // n_dev
    if N_loc % chunk:
        raise ValueError(f"local slab {N_loc} not a multiple of chunk {chunk}")
    if H > N_loc:
        raise ValueError(f"halo {H} exceeds local slab {N_loc}; "
                         "use fewer shards or a larger slab")
    nfft = next_pow2(chunk + 2 * H)
    sh = NamedSharding(mesh, P(None, axis_name))
    pair = jax.device_put(jnp.stack([y1, y2]), sh)
    padded = _sharded_wct_halo_fn(mesh, H, n_dev, axis_name)(pair)
    step = _sharded_wct_step_fn(mesh, mother, float(dt), float(dj), nfft,
                                chunk, H, precision, smooth_precision,
                                axis_name)
    S = scales_j.shape[0]
    cR = jax.device_put(jnp.zeros((S, N), jnp.float32), sh)
    cA = jax.device_put(jnp.zeros((S, N), jnp.float32), sh)
    for i in range(N_loc // chunk):
        cR, cA = step(cR, cA, padded, scales_j, jnp.int32(i))
    return cR, cA


@functools.lru_cache(maxsize=32)
def _xwt_overlap_step_fn(mother, dt, nfft, chunk, H, precision):
    """One donated-buffer chunk of the blocked CROSS-WAVELET pipeline: two
    planar chunk CWTs → planar cross spectrum → |W12| and phase interiors
    written in place.  No smoothing — the XWT needs only the wavelet halo."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(cM, cA, p1, p2, scales, i):
        L = chunk + 2 * H
        slab1 = jax.lax.dynamic_slice(p1, (i * chunk,), (L,))
        slab2 = jax.lax.dynamic_slice(p2, (i * chunk,), (L,))
        w1r, w1i = _planar_chunk_transform(slab1, scales, mother, nfft, dt,
                                           precision, "planes")
        w2r, w2i = _planar_chunk_transform(slab2, scales, mother, nfft, dt,
                                           precision, "planes")
        w12r = w1r * w2r + w1i * w2i          # W1 · conj(W2), planar
        w12i = w1i * w2r - w1r * w2i
        M = jnp.sqrt(w12r ** 2 + w12i ** 2)
        A = jnp.arctan2(w12i, w12r)
        z = jnp.zeros((), i.dtype)
        cM = jax.lax.dynamic_update_slice(cM, M[:, H:H + chunk],
                                          (z, i * chunk))
        cA = jax.lax.dynamic_update_slice(cA, A[:, H:H + chunk],
                                          (z, i * chunk))
        return cM, cA

    return step


def xwt_overlap_planar(y1, y2, scales, dt: float, *, mother: Mother,
                       chunk: int = 1 << 18, eps: float = 1e-7,
                       precision: str = "high", normalize: bool = True):
    """Cross-wavelet transform of a signal pair LONGER THAN HBM's global
    intermediates — overlap-save through the XWT (reference
    ``wavelet.py:385-399`` holds everything in one array; it cannot express
    this at any size beyond memory).

    Cheaper than :func:`wct_overlap_planar` (no smoothing stage, wavelet
    halo only).  Signals stay device-resident end-to-end; outputs are the
    planar-safe pair ``(|W12|, phase)``, each ``(S, N)`` float32, with the
    same interior/near-Nyquist contract as :func:`cwt_overlap_save_planar`.
    The AR(1) theoretical significance of the XWT is a grid-level curve
    (``coherence.xwt``'s ``sqrt(Pk1·Pk2)`` construction) — compute it from
    the series' fitted coefficients with :func:`pycwt_tpu.stats.ar1` /
    ``ar1_spectrum``; it does not depend on this surface.
    """
    scales = jnp.asarray(scales, jnp.float32)
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    _warn_near_nyquist(scales, dt, mother)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    y1 = jnp.asarray(y1, jnp.float32)
    y2 = jnp.asarray(y2, jnp.float32)
    if y1.shape != y2.shape or y1.ndim != 1:
        raise ValueError(
            f"xwt_overlap_planar expects matching 1-D signals, got "
            f"{y1.shape} vs {y2.shape}")
    if normalize:
        y1 = (y1 - y1.mean()) / y1.std()
        y2 = (y2 - y2.mean()) / y2.std()
    p1, N, n_chunks = _pad_for_chunks(y1, chunk, H)
    p2, _, _ = _pad_for_chunks(y2, chunk, H)
    nfft = next_pow2(chunk + 2 * H)
    step = _xwt_overlap_step_fn(mother, float(dt), nfft, chunk, H, precision)
    S = scales.shape[0]
    cM = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    cA = jnp.zeros((S, n_chunks * chunk), jnp.float32)
    for i in range(n_chunks):
        cM, cA = step(cM, cA, p1, p2, scales, jnp.int32(i))
    return cM[:, :N], cA[:, :N]
