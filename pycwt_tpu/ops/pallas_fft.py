"""Pallas TPU kernels: fused filter-bank × four-step inverse FFT for the CWT.

The hot loop of the whole framework is ``ifft(signal_ft · ψ̄̂_s)`` over S scale
rows (reference ``/root/reference/pycwt/wavelet.py:102-106``).  XLA's TPU FFT
runs this as many radix passes over HBM; this module instead computes, per
scale, a **four-step** inverse DFT

    W[c + R2·d] = (1/N) Σ_a e^{2πi·ac/N} e^{2πi·ad/R1} Σ_b e^{2πi·bc/R2} Y[b·R1 + a]

with each length-R col-DFT done **inside VMEM** as two mixed-radix substages of
small (r×r) DFT matmuls on the MXU, and the filter bank ``Y = X·H_s`` built on
the fly in the kernel prologue (never materialized in HBM).  HBM traffic per
scale is one stream of the intermediate T (planar f32) out + in, plus the
output — ~3 passes of N complex instead of XLA's ~log₂N passes.

Complex arithmetic is planar (separate re/im f32 arrays) because the MXU has
no complex type.  Stage math was verified against ``np.fft.ifft`` to 5e-15 in
f64 prototype form; the f32 kernels are validated against the XLA path in
``tests/test_pallas.py``.

Layout summary (N = R2·R1, k = b·R1 + a, t = c + R2·d):

    kernel A (grid S × R1/Ablk):  X(R2×Ablk), H on the fly → col-DFT_R2 →
        twiddle e^{2πi·ac/N} → write T transposed as (Ablk × R2)
    kernel B (grid S × R2/Cblk):  T'(R1×Cblk) → col-DFT_R1 → ·(1/N) →
        write W[d, c] — already time-major ((S, N) ≡ (S, R1, R2))
"""
from __future__ import annotations

import functools
import math
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mothers import Mother

__all__ = ["fused_cwt", "fused_cwt_planar", "supported_nfft"]

# f32 matmul precision for the MXU DFT stages.  HIGHEST = bf16x3 (~f32-exact,
# 3 passes); overridable for experiments via set_matmul_precision().
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p):
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def _split_radix(R: int) -> tuple[int, int]:
    """R = r1·r2 with r1 = 2^(log2(R)//2) (balanced pow-2 split)."""
    p = R.bit_length() - 1
    assert 1 << p == R, "pow-2 only"
    r1 = 1 << (p // 2)
    return r1, R // r1


#: nfft ≤ this → the planar-XLA "small" formulation (measured faster than
#: the kernels below 2^12, and STRUCTURALLY required at 2^13: that size's
#: balanced factorization gives R1 = 64, so both kernels' column blocks are
#: 64 lanes wide and their inter-substage reshapes are Mosaic-unsupported
#: shape casts ("infer-vector-layout", found by the round-4 32-station MC
#: workload whose surrogate nfft landed on 8192).  From 2^14 up both factors
#: are ≥ 128 and the two-kernel pipeline applies.
_SMALL_MAX = 1 << 13
#: the opt-in direct-DFT Pallas kernel holds a dense (K, nfft) DFT matrix in
#: constants — only sensible up to 2^12 (2^13 would be a 256 MB table).
_SMALL_KERNEL_MAX = 1 << 12


def supported_nfft(nfft: int) -> bool:
    """Pow-2 lengths ≥ 2^8.  Sizes > 2^13 run the two-kernel four-step
    pipeline; sizes ≤ 2^13 run the planar-XLA formulation (≤ 2^12 optionally
    the single direct-DFT matmul kernel, :func:`_make_kernel_direct`, whose
    tiles are all (8,128)-granular so real Mosaic compiles it)."""
    return nfft >= (1 << 8) and (1 << (nfft.bit_length() - 1)) == nfft


def _blockdiag(F: np.ndarray, G: int) -> np.ndarray:
    """G copies of F on the diagonal — packs G independent radix-r DFTs into
    one (G·r × G·r) matmul so the MXU contraction depth reaches 128 (a K=32
    matmul runs the systolic array at 25 % utilization; packed K=128 runs it
    full)."""
    r = F.shape[0]
    out = np.zeros((G * r, G * r), dtype=F.dtype)
    for g in range(G):
        out[g * r:(g + 1) * r, g * r:(g + 1) * r] = F
    return out


def _dft_tables(R: int, pack_to: int = 128, split: tuple[int, int] | None = None):
    """Host-side constants for one col-DFT of size R = r1·r2, b = b1·r2 + b2,
    c = c1 + r1·c2 (inverse/positive sign):

        F1[c1, b1] = e^{2πi·b1·c1/r1}
        w [c1, b2] = e^{2πi·b2·c1/R}
        F2[c2, b2] = e^{2πi·b2·c2/r2}

    F1/F2 are emitted block-diagonally packed to contraction depth
    ``pack_to`` (see :func:`_blockdiag`); the returned G1/G2 are the packing
    group counts.  ``split`` overrides the balanced (√R, √R) radix
    factorization for experiments (see tools/tpu_radix_experiment.py).
    """
    if split is not None:
        r1, r2 = split
        assert r1 * r2 == R, (r1, r2, R)
    else:
        r1, r2 = _split_radix(R)
    a1 = np.arange(r1)
    a2 = np.arange(r2)
    F1 = np.exp(2j * np.pi * np.outer(a1, a1) / r1)
    w = np.exp(2j * np.pi * np.outer(a1, a2) / R)
    F2 = np.exp(2j * np.pi * np.outer(a2, a2) / r2)
    # Block-diag packing measured SLOWER on v5e (Mosaic relayout cost
    # exceeds the MXU-depth gain) — disabled; kept for experiments.
    G1 = 1 if pack_to else max(1, pack_to // r1)
    G2 = 1 if pack_to else max(1, pack_to // r2)
    F1 = _blockdiag(F1, G1)
    F2 = _blockdiag(F2, G2)
    f32 = lambda z: (np.ascontiguousarray(z.real, np.float32),
                     np.ascontiguousarray(z.imag, np.float32))
    return f32(F1), f32(w), f32(F2), r1, r2, G1, G2


def _packed_cmatmul(Fr, Fi, xr, xi, r: int, G: int, dot):
    """Complex matmul of a block-diag-packed radix-r DFT against a planar
    (r, M) tile: packs G column-groups into the contraction dim so the MXU
    runs at depth G·r instead of r.  Returns planar (r, M)."""
    if G == 1:
        return dot(Fr, xr) - dot(Fi, xi), dot(Fr, xi) + dot(Fi, xr)
    M = xr.shape[1]
    Mg = M // G

    def pack(v):
        return jnp.swapaxes(v.reshape(r, G, Mg), 0, 1).reshape(G * r, Mg)

    def unpack(p):
        return jnp.swapaxes(p.reshape(G, r, Mg), 0, 1).reshape(r, M)

    pxr, pxi = pack(xr), pack(xi)
    pr = dot(Fr, pxr) - dot(Fi, pxi)
    pi = dot(Fr, pxi) + dot(Fi, pxr)
    return unpack(pr), unpack(pi)


def _dot_bf16x2(a, b):
    """Compensated bf16 matmul — the hand-rolled middle rung of the precision
    ladder (VERDICT r2 #3; ``Precision.HIGH`` is NotImplementedError in
    Mosaic's dot lowering, which left the ladder two-tier).

    Split both f32 operands into hi/lo bf16 halves and issue TWO MXU dots:
    ``a·b ≈ a_hi·b_hi + [a_hi|a_lo]·[b_lo;b_hi]`` — the second dot fuses the
    two cross terms by stacking them along the contraction dim.  Drops only
    the ``a_lo·b_lo`` term (~2⁻¹⁶ relative), so the error is ~1e-5..1e-4 in a
    two-stage DFT, versus ~5e-3 for single-pass bf16 and ~1e-6 for bf16x3.
    FLOPs equal bf16x3's, but MXU *passes* are 2 instead of 3 — a win iff the
    kernel is bound by pass issue/relayout, which the radix sweep showed it is
    (BASELINE.md)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    main = d(ah, bh)
    cross = d(jnp.concatenate([ah, al], axis=1),
              jnp.concatenate([bl, bh], axis=0))
    return main + cross


def _col_dft(vr, vi, consts, R: int, A: int, precision=None,
             rows_present: int | None = None):
    """Col-DFT of a planar (R, A) tile inside VMEM via two radix substages
    (MXU-packed, see :func:`_packed_cmatmul`).

    ``rows_present``: when the input is known zero beyond its first
    ``rows_present`` rows (analytic mothers kill the negative-frequency half
    of the filtered spectrum), pass that count — substage 1's contraction
    depth shrinks proportionally.  Must be a multiple of r2.

    Returns planar (R, A) with rows c = c1 + r1·c2.
    """
    (F1r, F1i), (wr, wi), (F2r, F2i), r1, r2, G1, G2 = consts

    # f32 matmul precision on the MXU: HIGHEST = bf16x3 passes (~f32 exact).
    # The Mosaic default is single-pass bf16 (~5e-3 relative error in a
    # 2-stage DFT) — ~1.9× faster; exposed as fused_cwt(precision="fast").
    # The string sentinel "bf16x2" selects the hand-rolled 2-pass compensated
    # matmul (_dot_bf16x2) — the precision="high" tier.
    if precision == "bf16x2":
        dot = _dot_bf16x2
    else:
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=precision or _MATMUL_PRECISION)

    # substage 1: contract b1 (leading axis of the (r1, r2·A) reshape)
    if rows_present is not None and rows_present < R:
        assert G1 == 1, "row-truncated col-DFT incompatible with packing"
        assert rows_present % r2 == 0
        h1 = rows_present // r2
        v2r = vr.reshape(h1, r2 * A)
        v2i = vi.reshape(h1, r2 * A)
        pr = dot(F1r[:, :h1], v2r) - dot(F1i[:, :h1], v2i)
        pi = dot(F1r[:, :h1], v2i) + dot(F1i[:, :h1], v2r)
    else:
        v2r = vr.reshape(r1, r2 * A)
        v2i = vi.reshape(r1, r2 * A)
        pr, pi = _packed_cmatmul(F1r, F1i, v2r, v2i, r1, G1, dot)

    # twiddle w[c1, b2] on the (r1, r2, A) view
    p3r = pr.reshape(r1, r2, A)
    p3i = pi.reshape(r1, r2, A)
    w3r = wr[:, :, None]
    w3i = wi[:, :, None]
    qr = p3r * w3r - p3i * w3i
    qi = p3r * w3i + p3i * w3r

    # substage 2: contract b2 — move it to the front: (r2, r1, A)
    qr = jnp.swapaxes(qr, 0, 1).reshape(r2, r1 * A)
    qi = jnp.swapaxes(qi, 0, 1).reshape(r2, r1 * A)
    zr, zi = _packed_cmatmul(F2r, F2i, qr, qi, r2, G2, dot)
    # rows now (c2, c1) → c = c1 + r1·c2: row-major (r2, r1) flatten is c2·r1 + c1 ✓
    return zr.reshape(R, A), zi.reshape(R, A)


def _filter_tile(mother: Mother, s, b_rows, a0, Ablk, R1, nfft, dt, dtype):
    """H̄_s for the (R2, Ablk) tile at column offset a0: norm·conj(ψ̂(s·ω_k)),
    k = b·R1 + a (planar complex: returns hr, hi)."""
    R2 = b_rows
    b = jax.lax.broadcasted_iota(jnp.int32, (R2, Ablk), 0)
    a = jax.lax.broadcasted_iota(jnp.int32, (R2, Ablk), 1) + a0
    k = b * R1 + a
    k = jnp.where(k >= nfft // 2, k - nfft, k)
    omega = (2.0 * math.pi / (nfft * dt)) * k.astype(dtype)
    env = mother.psi_ft_envelope(s * omega).astype(dtype)
    norm = jnp.sqrt(2.0 * math.pi * s / dt)
    cbar = np.conj(complex(mother.psi_ft_const()))
    return (norm * float(cbar.real)) * env, (norm * float(cbar.imag)) * env


def _read_tables(refs, r1: int, r2: int, G1: int, G2: int):
    """Unpack the 6 DFT-table refs into the _col_dft constants tuple."""
    f1r, f1i, wr, wi, f2r, f2i = (ref[:] for ref in refs)
    return (f1r, f1i), (wr, wi), (f2r, f2i), r1, r2, G1, G2


def _make_kernel_a(mother: Mother, nfft: int, dt: float, R1: int, R2: int,
                   Ablk: int, r1: int, r2: int, G1: int, G2: int,
                   precision=None, analytic: bool = False):
    # Analytic mothers (Paul exactly; Morlet-f0≥6 below f32 round-off) have
    # ψ̂(f≤0) ≈ 0, so the filtered spectrum's negative-frequency rows
    # (b ≥ R2/2, since k = b·R1 + a) vanish: the filter tile, the X·H
    # multiply, and substage 1's contraction all halve.
    Rrows = R2 // 2 if analytic else R2

    def kernel(scale_ref, xr_ref, xi_ref, twr_ref, twi_ref,
               f1r, f1i, wr_, wi_, f2r, f2i, tr_ref, ti_ref):
        # grid is (j, s): s innermost so the X/twiddle blocks (which depend
        # only on j) stay resident across all scales of one column block.
        s = scale_ref[pl.program_id(1)]
        j = pl.program_id(0)
        consts2 = _read_tables((f1r, f1i, wr_, wi_, f2r, f2i), r1, r2, G1, G2)
        hr, hi = _filter_tile(mother, s, Rrows, j * Ablk, Ablk, R1, nfft, dt,
                              jnp.float32)
        xr = xr_ref[:]
        xi = xi_ref[:]
        vr = xr * hr - xi * hi
        vi = xr * hi + xi * hr
        zr, zi = _col_dft(vr, vi, consts2, R2, Ablk, precision,
                          rows_present=Rrows if analytic else None)
        twr = twr_ref[:]
        twi = twi_ref[:]
        tr = zr * twr - zi * twi
        ti = zr * twi + zi * twr
        # T may be stored bf16 (fast tier): its only consumer is kernel B's
        # single-pass bf16 MXU dot, which would round it identically anyway —
        # halves the inter-kernel HBM round-trip (VERDICT r3 #1b).
        tr_ref[0] = tr.T.astype(tr_ref.dtype)
        ti_ref[0] = ti.T.astype(ti_ref.dtype)

    return kernel


def _make_kernel_b(R1: int, R2: int, Cblk: int, r1: int, r2: int,
                   G1: int, G2: int, inv_n: float, out_mode: str,
                   precision=None):
    """Kernel B with a fused epilogue selected by ``out_mode``:

    * ``"planes"``    — planar W (2 f32 planes out; the general transform);
    * ``"power"``     — |W|² written directly (1 plane out — power-only
      consumers never round-trip planar W through HBM: VERDICT r3 #1c);
    * ``"power_sum"`` — Σ_t |W|² partial-sum tiles (the global-spectrum
      reduction; minimal HBM out).
    """
    def kernel(tr_ref, ti_ref, f1r, f1i, wr_, wi_, f2r, f2i, *out_refs):
        consts1 = _read_tables((f1r, f1i, wr_, wi_, f2r, f2i), r1, r2, G1, G2)
        tr = tr_ref[0].astype(jnp.float32)
        ti = ti_ref[0].astype(jnp.float32)
        mr, mi = _col_dft(tr, ti, consts1, R1, Cblk, precision)
        mr = mr * inv_n
        mi = mi * inv_n
        if out_mode == "power_sum":
            (p_ref,) = out_refs
            pw = mr * mr + mi * mi
            # reduce (R1, Cblk) -> (8, L) partial-sum tile (vector stores only)
            L = min(Cblk, 128)
            acc = pw.reshape(R1 // 8, 8, Cblk // L, L).sum(axis=(0, 2))
            @pl.when(pl.program_id(1) == 0)
            def _():
                p_ref[:] = jnp.zeros_like(p_ref)
            p_ref[0] += acc
        elif out_mode == "power":
            (p_ref,) = out_refs
            p_ref[0] = mr * mr + mi * mi
        else:
            wr_ref, wi_ref = out_refs
            wr_ref[0] = mr
            wi_ref[0] = mi

    return kernel


def fused_cwt(signal_ft, scales, *, mother: Mother, nfft: int, dt: float,
              Ablk: int = 256, Cblk: int = 256, power_only: bool = False,
              interpret: bool = False, precision: str = "highest",
              small_kernel: bool | None = None):
    """Fused Pallas CWT for ONE signal spectrum (complex-dtype convenience
    wrapper over :func:`fused_cwt_planar`).

    Parameters
    ----------
    signal_ft: (nfft,) complex64 — full FFT of the (padded) signal.
    scales: (S,) f32 wavelet scales.
    power_only: if True return (S,) Σ_t |W|² (the global-spectrum reduction —
        minimal HBM traffic); else return (S, nfft) complex64 W **un-trimmed**
        (caller slices [:, :n0]).

    Notes
    -----
    Equivalent to ``jnp.fft.ifft(signal_ft · bank)`` with the bank of
    ``ops.filterbank.filter_bank`` — validated to ~1e-6 relative in f32.
    """
    out = fused_cwt_planar(
        jnp.real(signal_ft).astype(jnp.float32),
        jnp.imag(signal_ft).astype(jnp.float32),
        scales, mother=mother, nfft=nfft, dt=dt, Ablk=Ablk, Cblk=Cblk,
        power_only=power_only, interpret=interpret, precision=precision,
        small_kernel=small_kernel)
    if power_only:
        return out
    wr, wi = out
    return wr + 1j * wi


def _make_kernel_direct(mother: Mother, nfft: int, dt: float, S_pad: int,
                        K: int, Cblk: int, inv_n: float, precision=None):
    """Small-nfft fused kernel (nfft ≤ 2^12): ONE direct DFT matmul per
    output-column block.

    Instead of the four-step decomposition (whose small-radix reshapes Mosaic
    rejected on real hardware — round-2's `PYCWT_TPU_SMALL_KERNEL` opt-in),
    this batches all S scales into MXU-native matmuls:

        Y[s, k] = X[k] · H̄_s[k]            (filter built in-kernel, (S, K))
        W[s, t] = (1/N) Σ_k Y[s, k] E[k, t]  with E[k, t] = e^{+2πi·k·t/N}

    i.e. 4 real matmuls of (S_pad, K) @ (K, Cblk) per grid step.  Every tile
    is ≥ (8, 128): S_pad is a multiple of 8, K = nfft or nfft/2 ≥ 128,
    Cblk ≥ 128.  ``K < nfft`` means the analytic half-spectrum path (H ≡ 0
    on negative frequencies, so the contraction halves)."""

    def kernel(scale_ref, xr_ref, xi_ref, er_ref, ei_ref, wr_ref, wi_ref):
        s = scale_ref[:]                                # (S_pad, 1) in VMEM
        k = jax.lax.broadcasted_iota(jnp.int32, (S_pad, K), 1)
        if K == nfft:  # full spectrum: fold negative frequencies
            k = jnp.where(k >= nfft // 2, k - nfft, k)
        omega = (2.0 * math.pi / (nfft * dt)) * k.astype(jnp.float32)
        env = mother.psi_ft_envelope(s * omega).astype(jnp.float32)
        norm = jnp.sqrt(2.0 * math.pi * s / dt)
        cbar = np.conj(complex(mother.psi_ft_const()))
        hr = (norm * float(cbar.real)) * env
        hi = (norm * float(cbar.imag)) * env
        xr = xr_ref[:]                                   # (1, K)
        xi = xi_ref[:]
        yr = xr * hr - xi * hi                           # (S_pad, K)
        yi = xr * hi + xi * hr
        if precision == "bf16x2":
            dot = _dot_bf16x2
        else:
            dot = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32,
                precision=precision or _MATMUL_PRECISION)
        er = er_ref[:]                                   # (K, Cblk)
        ei = ei_ref[:]
        wr_ref[:] = (dot(yr, er) - dot(yi, ei)) * inv_n
        wi_ref[:] = (dot(yr, ei) + dot(yi, er)) * inv_n

    return kernel


def _small_planar_xla(sig_r, sig_i, scales, *, mother: Mother, nfft: int,
                      dt: float, precision):
    """Small-nfft planar CWT as plain XLA ops (no Pallas, no complex dtype):
    filter the planar spectrum with the real-envelope bank, inverse-transform
    via the planar four-step MXU DFT.  Accepts full or (analytic) half
    spectra like the fused kernels."""
    from .filterbank import angular_frequencies
    from .mxu_dft import _dft_planar

    if precision == "bf16x2":  # sentinel is Pallas-kernel-only; XLA einsum
        precision = jax.lax.Precision.HIGHEST
    n_in = sig_r.shape[-1]
    sig_r = sig_r.astype(jnp.float32)
    sig_i = sig_i.astype(jnp.float32)
    if n_in < nfft:  # half spectrum (analytic mother): zero the upper half
        pad = [(0, 0)] * (sig_r.ndim - 1) + [(0, nfft - n_in)]
        sig_r = jnp.pad(sig_r, pad)
        sig_i = jnp.pad(sig_i, pad)
    ftf = angular_frequencies(nfft, dt, jnp.float32)
    scales = scales.astype(jnp.float32)
    norm = jnp.sqrt(2 * jnp.pi * scales / dt)
    env = mother.psi_ft_envelope(scales[:, None] * ftf[None, :])
    cbar = np.conj(complex(mother.psi_ft_const()))
    br = (norm[:, None] * env) * float(cbar.real)       # (S, nfft)
    bi = (norm[:, None] * env) * float(cbar.imag)
    yr = sig_r[None, :] * br - sig_i[None, :] * bi
    yi = sig_r[None, :] * bi + sig_i[None, :] * br
    wr, wi = _dft_planar(yr, yi, nfft, +1, precision)
    return wr / nfft, wi / nfft


@functools.lru_cache(maxsize=16)
def _idft_matrix_planar(nfft: int, K: int):
    """(K, nfft) inverse-DFT matrix E[k, t] = e^{+2πi·k·t/nfft} as planar f32
    host constants (K = nfft, or nfft/2 for the half-spectrum path)."""
    k = np.arange(K, dtype=np.float64)
    t = np.arange(nfft, dtype=np.float64)
    E = np.exp(2j * np.pi * np.outer(k, t) / nfft)
    return (np.ascontiguousarray(E.real, np.float32),
            np.ascontiguousarray(E.imag, np.float32))


def _fused_cwt_small(sig_r, sig_i, scales, *, mother: Mother, nfft: int,
                     dt: float, interpret: bool, precision, analytic: bool):
    """Small-nfft dispatch: pad scales to a sublane multiple and run the
    direct-DFT matmul kernel (see :func:`_make_kernel_direct`)."""
    S = scales.shape[0]
    S_pad = -(-S // 8) * 8
    scales_p = scales.astype(jnp.float32)
    if S_pad != S:
        scales_p = jnp.concatenate(
            [scales_p, jnp.broadcast_to(scales_p[-1:], (S_pad - S,))])

    K = nfft // 2 if analytic else nfft
    n_in = sig_r.shape[-1]
    xr = sig_r.astype(jnp.float32)[:K] if n_in >= K else sig_r.astype(jnp.float32)
    xi = sig_i.astype(jnp.float32)[:K] if n_in >= K else sig_i.astype(jnp.float32)
    xr = xr.reshape(1, K)
    xi = xi.reshape(1, K)

    er, ei = _idft_matrix_planar(nfft, K)
    Cblk = min(nfft, 512)

    kern = _make_kernel_direct(mother, nfft, dt, S_pad, K, Cblk, 1.0 / nfft,
                               precision)
    # Scales ride in VMEM as an (S_pad, 1) column — NOT scalar-prefetch SMEM:
    # Mosaic can only load scalars from SMEM, and no index_map needs them.
    grid_spec = pl.GridSpec(
        grid=(nfft // Cblk,),
        in_specs=[
            pl.BlockSpec((S_pad, 1), lambda c: (0, 0)),
            pl.BlockSpec((1, K), lambda c: (0, 0)),
            pl.BlockSpec((1, K), lambda c: (0, 0)),
            pl.BlockSpec((K, Cblk), lambda c: (0, c)),
            pl.BlockSpec((K, Cblk), lambda c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((S_pad, Cblk), lambda c: (0, c)),
            pl.BlockSpec((S_pad, Cblk), lambda c: (0, c)),
        ],
    )
    wr, wi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S_pad, nfft), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, nfft), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scales_p.reshape(S_pad, 1), xr, xi, jnp.asarray(er), jnp.asarray(ei))
    return wr[:S], wi[:S]


def fused_cwt_planar(sig_r, sig_i, scales, *, mother: Mother, nfft: int,
                     dt: float, Ablk: int = 256, Cblk: int = 256,
                     power_only: bool = False, interpret: bool = False,
                     precision: str = "highest",
                     small_kernel: bool | None = None,
                     output: str | None = None):
    """Planar fused CWT — thin wrapper resolving the small-nfft path choice
    OUTSIDE the jit cache (an env sniff inside a traced function would let a
    stale executable shadow a changed env var).  ``small_kernel=None`` →
    ``PYCWT_TPU_SMALL_KERNEL=1`` env opt-in, else the measured-faster planar
    XLA formulation.  See :func:`_fused_cwt_planar_jit` for the math.

    ``output`` selects the fused epilogue: ``"planes"`` (default — planar
    ``(wr, wi)``), ``"power"`` (``(S, nfft)`` |W|² written in-kernel, half
    the output HBM traffic), or ``"power_sum"`` (``(S,)`` Σ_t |W|², the
    global-spectrum reduction; equals the legacy ``power_only=True``)."""
    if small_kernel is None:
        small_kernel = os.environ.get("PYCWT_TPU_SMALL_KERNEL") == "1"
    if output is None:
        output = "power_sum" if power_only else "planes"
    elif power_only and output != "power_sum":
        # An explicit output= must not be silently shadowed by the legacy
        # flag (or vice versa) — the caller asked for two different epilogues.
        raise ValueError(
            f"conflicting epilogue selection: power_only=True means "
            f"output='power_sum' but output={output!r} was passed — drop "
            f"power_only (deprecated) and pass output= alone")
    if output not in ("planes", "power", "power_sum"):
        raise ValueError(f"output must be planes|power|power_sum, got {output!r}")
    return _fused_cwt_planar_jit(
        sig_r, sig_i, scales, mother=mother, nfft=nfft, dt=dt, Ablk=Ablk,
        Cblk=Cblk, output=output, interpret=interpret,
        precision=precision, small_kernel=bool(small_kernel))


def _with_xla_vjp(raw_fn, mother: Mother, nfft: int, dt: float, output: str):
    """Make a Pallas planar-CWT closure differentiable: the PRIMAL runs the
    fused kernels (``raw_fn``); the BACKWARD replays the mathematically
    identical planar-XLA formulation (:func:`_small_planar_xla`, valid for
    any pow-2 nfft) under ``jax.vjp`` — Pallas kernels have no automatic
    transpose, but the transform is the same linear map, so the cotangents
    (including the ∂/∂scales path through the filter envelope) are exact for
    the HIGHEST tier and within the active tier's error otherwise.  The
    backward pass materializes the (S, nfft) filter bank in XLA (~2 GB
    transient at 64 × 2^20) — fine for training loops, which is what
    gradients are for."""

    def ref_fn(sr, si, sc):
        wr, wi = _small_planar_xla(sr, si, sc, mother=mother, nfft=nfft,
                                   dt=dt, precision=jax.lax.Precision.HIGHEST)
        if output == "power_sum":
            return (wr * wr + wi * wi).sum(axis=-1)
        if output == "power":
            return wr * wr + wi * wi
        return wr, wi

    @jax.custom_vjp
    def op(sr, si, sc):
        return raw_fn(sr, si, sc)

    def fwd(sr, si, sc):
        return raw_fn(sr, si, sc), (sr, si, sc)

    def bwd(res, ct):
        _, vjp = jax.vjp(ref_fn, *res)
        return vjp(ct)

    op.defvjp(fwd, bwd)
    return op


@functools.partial(
    jax.jit,
    static_argnames=("mother", "nfft", "dt", "Ablk", "Cblk", "output",
                     "interpret", "precision", "small_kernel"),
)
def _fused_cwt_planar_jit(sig_r, sig_i, scales, *, mother: Mother, nfft: int,
                          dt: float, Ablk: int = 256, Cblk: int = 256,
                          output: str = "planes", interpret: bool = False,
                          precision: str = "highest",
                          small_kernel: bool = False):
    """Fused Pallas CWT on a PLANAR ``(re, im)`` f32 spectrum — no complex
    dtype anywhere in the computation.  With
    :func:`pycwt_tpu.ops.mxu_dft.fft_of_real_planar` upstream this gives a
    pure-real end-to-end CWT pipeline, immune to runtimes whose complex64
    support is missing or flapping (observed on the tunneled axon backend).

    Returns ``(wr, wi)`` each ``(S, nfft)`` f32, or ``(S,)`` power when
    ``power_only``.
    """
    if not supported_nfft(nfft):
        raise ValueError(f"fused kernel needs pow-2 nfft >= 256, got {nfft}")
    prec_small = {"highest": jax.lax.Precision.HIGHEST,
                  "high": "bf16x2",
                  "fast": jax.lax.Precision.DEFAULT}[precision]
    analytic_small = bool(getattr(mother, "analytic_negligible_negative",
                                  lambda: False)())
    if sig_r.shape[-1] == nfft // 2 and not analytic_small:
        raise ValueError(
            "half-spectrum input requires an analytic mother "
            f"({mother.name} reads negative-frequency bins)")
    if nfft <= _SMALL_MAX:
        # Default: the planar XLA-matmul formulation.  The fused direct-DFT
        # Pallas kernel (_make_kernel_direct) compiles and validates on real
        # Mosaic (~3e-7 agreement), but MEASURES SLOWER at every small size
        # (tools/tpu_bench_small.py, v5e: 512: 158 vs 142 µs, 2048: 219 vs
        # 153 µs; MC steady 0.316 vs 0.303 s) — XLA's fusion wins when the
        # whole transform is a handful of MXU tiles.  ``small_kernel=True``
        # (or PYCWT_TPU_SMALL_KERNEL=1) opts into the Pallas kernel (e.g. to
        # re-measure on new hardware).
        if small_kernel and nfft <= _SMALL_KERNEL_MAX:
            # Pallas kernels have no automatic transpose — make the opt-in
            # small kernel differentiable via the XLA-formulation VJP.
            small_raw = _with_xla_vjp(
                lambda sr, si, sc: _fused_cwt_small(
                    sr, si, sc, mother=mother, nfft=nfft, dt=dt,
                    interpret=interpret, precision=prec_small,
                    analytic=analytic_small),
                mother, nfft, float(dt), "planes")
            wr, wi = small_raw(sig_r, sig_i, scales)
        else:
            wr, wi = _small_planar_xla(
                sig_r, sig_i, scales, mother=mother, nfft=nfft, dt=dt,
                precision=prec_small)
        if output == "power_sum":
            return (wr * wr + wi * wi).sum(axis=-1)
        if output == "power":
            return wr * wr + wi * wi
        return wr, wi

    S = scales.shape[0]
    R1, R2 = _nfft_factors(nfft)
    # A block larger than the factor it tiles would produce an EMPTY grid
    # (zero programs, garbage output) — clamp instead.
    Ablk = min(Ablk, R1)
    Cblk = min(Cblk, R2)
    # Kernel A's analytic half-spectrum path contracts only rows_present =
    # R2/2 rows in substage 1: its reshape is (rows, A) -> (rows/r2, r2*A),
    # and Mosaic rejects shape casts whose leading (sublane) dim drops below
    # 8 ("unsupported shape cast", seen at nfft=2^13/2^14 where the balanced
    # split leaves rows/r2 = 4).  Pick a shallower r2 for the R2 tables so
    # rows/r2 >= 8 — the radix sweep measured all splits perf-equivalent.
    analytic_rows = bool(getattr(mother, "analytic_negligible_negative",
                                 lambda: False)())
    r1_2, r2_2 = _split_radix(R2)
    if analytic_rows:
        rows_a = R2 // 2
        while r2_2 > 1 and rows_a // r2_2 < 8:
            r2_2 //= 2
            r1_2 *= 2
    consts2 = _dft_tables(R2, split=(r1_2, r2_2))  # col-DFT over b (size R2)
    consts1 = _dft_tables(R1)  # for col-DFT over a (size R1)

    a_idx = np.arange(R2, dtype=np.float64)
    c_idx = np.arange(R1, dtype=np.float64)
    twf = np.exp(2j * np.pi * np.outer(a_idx, c_idx) / nfft)  # [c(R2), a(R1)]
    twf_r = np.ascontiguousarray(twf.real, np.float32)   # numpy, NOT jnp:
    twf_i = np.ascontiguousarray(twf.imag, np.float32)   # see _run_big note

    # Accept either the full spectrum or (analytic mothers) just its
    # positive-frequency half from fft_of_real_planar(half=True): rows
    # b = k // R1 < R2/2 are exactly the bins kernel A reads.
    n_in = sig_r.shape[-1]
    if n_in == nfft:
        rows_in = R2
    elif n_in == nfft // 2 and analytic_small:
        rows_in = R2 // 2
    else:
        raise ValueError(
            f"spectrum length {n_in} incompatible with nfft={nfft} "
            f"(half-spectrum input needs an analytic mother)")
    def _run_big(sig_r, sig_i, scales):
        # NOTE: every jnp constant must be created INSIDE this closure —
        # _run_big is re-traced by the custom-VJP machinery (_with_xla_vjp),
        # and a jnp array made in the enclosing jit trace would be a leaked
        # tracer there (observed as mlir "No constant handler" errors).
        twr = jnp.asarray(twf_r)
        twi = jnp.asarray(twf_i)
        xr = sig_r.astype(jnp.float32).reshape(rows_in, R1)
        xi = sig_i.astype(jnp.float32).reshape(rows_in, R1)
        scales_flat = scales.astype(jnp.float32)

        def table_inputs(consts):
            (f1r, f1i), (wr_, wi_), (f2r, f2i), r1, r2, G1, G2 = consts
            arrays = [jnp.asarray(a) for a in (f1r, f1i, wr_, wi_, f2r, f2i)]
            specs = [pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim)
                     for a in arrays]
            return arrays, specs, r1, r2, G1, G2

        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": "bf16x2",
                "fast": jax.lax.Precision.DEFAULT}[precision]
        analytic = bool(getattr(mother, "analytic_negligible_negative",
                                lambda: False)())
        Rrows = R2 // 2 if analytic else R2
        tab2, tab2_specs, r1b, r2b, G1b, G2b = table_inputs(consts2)
        kern_a = _make_kernel_a(mother, nfft, dt, R1, R2, Ablk, r1b, r2b, G1b, G2b,
                                prec, analytic=analytic)

        grid_a = (R1 // Ablk, S)
        # "fast" tier: store the inter-kernel intermediate T in bf16 — kernel B's
        # first op on it is a single-pass bf16 MXU dot that would round it to
        # bf16 anyway, so the numerics stay at the fast tier's ~4e-3 while the
        # T HBM round-trip halves (VERDICT r3 #1b).  Compensated/highest tiers
        # keep f32 T (bf16 rounding would destroy their error budgets).
        t_dtype = jnp.bfloat16 if precision == "fast" else jnp.float32
        t_shape = jax.ShapeDtypeStruct((S, R1, R2), t_dtype)
        grid_spec_a = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid_a,
            in_specs=[
                pl.BlockSpec((Rrows, Ablk), lambda j, s, *refs: (0, j)),
                pl.BlockSpec((Rrows, Ablk), lambda j, s, *refs: (0, j)),
                pl.BlockSpec((R2, Ablk), lambda j, s, *refs: (0, j)),
                pl.BlockSpec((R2, Ablk), lambda j, s, *refs: (0, j)),
            ] + tab2_specs,
            out_specs=[
                pl.BlockSpec((1, Ablk, R2), lambda j, s, *refs: (s, j, 0)),
                pl.BlockSpec((1, Ablk, R2), lambda j, s, *refs: (s, j, 0)),
            ],
        )
        tr, ti = pl.pallas_call(
            kern_a,
            grid_spec=grid_spec_a,
            out_shape=[t_shape, t_shape],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(scales_flat, xr, xi, twr, twi, *tab2)

        tab1, tab1_specs, r1a, r2a, G1a, G2a = table_inputs(consts1)
        # power_sum rides the power-map epilogue + an XLA sum: the in-kernel
        # partial-sum accumulator (revisiting one output block across the whole
        # c-grid) measured SLOWER than writing the full |W|² map and reducing
        # outside (fast tier: 4.44 vs 5.14 ms — tools/tpu_bench_modes.py; the
        # accumulation defeats kernel B's output double-buffering).  The
        # accumulator variant remains in _make_kernel_b for re-measurement.
        kern_mode = "power" if output == "power_sum" else output
        kern_b = _make_kernel_b(R1, R2, Cblk, r1a, r2a, G1a, G2a, 1.0 / nfft,
                                kern_mode, prec)
        grid_b = (S, R2 // Cblk)
        if kern_mode == "power":
            out_shape = [jax.ShapeDtypeStruct((S, R1, R2), jnp.float32)]
            out_specs = [pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c))]
        else:
            out_shape = [jax.ShapeDtypeStruct((S, R1, R2), jnp.float32),
                         jax.ShapeDtypeStruct((S, R1, R2), jnp.float32)]
            out_specs = [pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c)),
                         pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c))]

        outs = pl.pallas_call(
            kern_b,
            grid=grid_b,
            in_specs=[
                pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c)),
                pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c)),
            ] + tab1_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(tr, ti, *tab1)

        if output == "power_sum":
            return outs[0].reshape(S, nfft).sum(axis=-1)
        if output == "power":
            return outs[0].reshape(S, nfft)
        wr, wi = outs
        return wr.reshape(S, nfft), wi.reshape(S, nfft)

    # Differentiable wrapper: primal = the fused Pallas pipeline above,
    # backward = VJP of the planar-XLA formulation (see _with_xla_vjp).
    op = _with_xla_vjp(_run_big, mother, nfft, float(dt), output)
    return op(sig_r, sig_i, scales)


def _nfft_factors(nfft: int) -> tuple[int, int]:
    """(R1, R2) with N = R2·R1: R1 = inner/time-block factor (cols a),
    R2 = rows b.  Balanced split."""
    p = nfft.bit_length() - 1
    R1 = 1 << (p // 2)
    return R1, nfft // R1
