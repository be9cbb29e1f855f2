"""Compensated two-float ("double-f32") parity mode for the TPU chip.

TPU has no native float64 (SURVEY.md §7 hard part #1): the production chip
path computes in f32 and floors at ~1e-3 max relative error against the f64
reference goldens (BASELINE.md parity table) — three orders above the 1e-10
CPU-parity clause.  This module closes that gap ON THE CHIP, opt-in: every
value is carried as an unevaluated (hi, lo) pair of f32s (~49 significant
bits), and every arithmetic step uses error-free transformations (Knuth
two-sum, Dekker/Veltkamp two-product — no FMA required), so the pipeline's
working precision is ~1e-14 relative, far inside the 1e-6 target.

What runs on device (all plain f32 VPU elementwise — XLA preserves IEEE
semantics; no Pallas needed since nothing here is matmul-shaped):

* a planar (4-plane: re-hi, re-lo, im-hi, im-lo) radix-2 **Stockham** FFT —
  log2(N) stages of two-float butterflies with host-precomputed f64-split
  twiddles, natural-order in and out, O(N log N) unlike a DFT matmul;
* the filter-bank multiply (real f64-split envelope × two-float spectrum,
  then one complex-constant rotation);
* the WCT time-Gaussian smoothing (forward FFT → f64-split Gaussian
  multiply → inverse FFT).

What stays on host (f64 numpy, cheap and not precision-critical to
device-offload): scale-grid construction, the (S, nfft) filter-bank/Gaussian
ENVELOPE evaluation (split to (hi, lo) before upload — evaluating ψ̂ in f32
would alone inject ~1e-7), the small scale-axis boxcar, and final (hi + lo)
assembly into complex128.

Cost: ~log2(N) elementwise passes of ~100 flops/element — several× the f32
fused-kernel path, which is the documented price of parity mode (VERDICT r4
missing #1).  Throughput mode is unaffected.

**Optimizer hazard (why the radix stops at 4).**  Error-free
transformations are valid only if the compiler executes them literally.  A
radix-8 stage was prototyped in round 5 and REJECTED: XLA's CPU pipeline
rewrote the eight add/sub-pair butterfly producers feeding the Stockham
interleave when (and only when) their unstacked values were otherwise dead
— silently costing ~1e-8, i.e. one uncompensated f32 rounding (keeping the
values live as extra outputs restored bit-exactness; optimization barriers
did NOT).  The shipped radix-4/2 ladder is verified exact under jit on both
CPU and the real chip at every tested size, and ``tests/test_twofloat.py``
pins ~1e-13 FFT agreement so any future compiler regression of this kind
fails loudly instead of shipping as silent precision loss.

Parity anchors: reference f64 numerics ``/root/reference/pycwt/wavelet.py:
91-106`` (cwt), ``mothers.py:61-104`` (smooth), measured on the real chip by
``tools/tpu_parity_report.py --engine=twofloat`` and pinned by
``tests/test_twofloat.py`` / the chip-gated test in ``tests/test_tpu_chip.py``.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import next_pow2
from ..mothers import DOG, Morlet, Mother, Paul

__all__ = ["df_from_f64", "df_to_f64", "fft_df", "cwt_twofloat",
           "smooth_twofloat", "xwt_twofloat", "wct_twofloat"]

_SPLIT = np.float32(4097.0)  # Veltkamp factor 2^12 + 1 for binary32


# ---------------------------------------------------------------- df32 core

def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (no magnitude precondition)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Fast two-sum; requires |a| >= |b| (holds where used: renormalization)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker two-product via Veltkamp splitting: p + err == a·b exactly."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _quick_two_sum(s, e)


def df_sub(xh, xl, yh, yl):
    return df_add(xh, xl, -yh, -yl)


def df_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def df_from_f64(x) -> tuple[np.ndarray, np.ndarray]:
    """Host split of an f64 array into an (hi, lo) f32 pair (hi + lo == x to
    f64 round-off; |lo| <= ulp(hi)/2)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to_f64(hi, lo) -> np.ndarray:
    """Host reassembly: exact f64 sum of the two components."""
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


# Planar two-float complex values are 4-tuples (rh, rl, ih, il).

def _cdf_add(a, b):
    rr = df_add(a[0], a[1], b[0], b[1])
    ii = df_add(a[2], a[3], b[2], b[3])
    return (*rr, *ii)


def _cdf_sub(a, b):
    rr = df_sub(a[0], a[1], b[0], b[1])
    ii = df_sub(a[2], a[3], b[2], b[3])
    return (*rr, *ii)


def _cdf_mul(a, b):
    p1 = df_mul(a[0], a[1], b[0], b[1])   # ar·br
    p2 = df_mul(a[2], a[3], b[2], b[3])   # ai·bi
    p3 = df_mul(a[0], a[1], b[2], b[3])   # ar·bi
    p4 = df_mul(a[2], a[3], b[0], b[1])   # ai·br
    rr = df_sub(*p1, *p2)
    ii = df_add(*p3, *p4)
    return (*rr, *ii)


# ------------------------------------------------------------- Stockham FFT

def _cdf_mul_i(a, sign: int):
    """Exact multiply by ``sign·i`` on a planar two-float value: a swap with
    negation — no arithmetic error."""
    rh, rl, ih, il = a
    if sign < 0:   # −i·(x + iy) = y − ix
        return (ih, il, -rh, -rl)
    return (-ih, -il, rh, rl)  # +i·(x + iy) = −y + ix


def _tw(n: int, mult: int, m: int, sign: int):
    """f64-split twiddle planes exp(sign·2πi·mult·p/n), p ∈ [0, m)."""
    ang = sign * 2.0 * np.pi * mult * np.arange(m, dtype=np.float64) / n
    ch, cl = df_from_f64(np.cos(ang))
    sh, sl = df_from_f64(np.sin(ang))
    return ch, cl, sh, sl


@functools.lru_cache(maxsize=64)
def _stage_plan(nfft: int, sign: int):
    """Mixed radix-4/radix-2 Stockham stage plan: radix-4 stages halve the
    elementwise-pass count of the all-radix-2 ladder (the FFT is HBM-bound
    — BASELINE.md round 5 measures the ~1.8× win), with one leading radix-2
    stage when log2(nfft) is odd.  Each entry is ("r2", tw) or
    ("r4", (w1, w2, w3))."""
    plan = []
    n = nfft
    if (n.bit_length() - 1) % 2:
        plan.append(("r2", _tw(n, 1, n // 2, sign)))
        n //= 2
    while n > 1:
        m = n // 4
        plan.append(("r4", (_tw(n, 1, m, sign), _tw(n, 2, m, sign),
                            _tw(n, 3, m, sign))))
        n //= 4
    return plan


def _bcast_tw(tw):
    return tuple(jnp.asarray(t)[:, None] for t in tw)


@functools.partial(jax.jit, static_argnames=("nfft", "sign"))
def _fft_df_jit(rh, rl, ih, il, *, nfft: int, sign: int):
    """Mixed radix-4/2 Stockham autosort FFT on planar two-float inputs
    ``(..., N)``.

    Natural order in and out; ``sign=-1`` forward, ``+1`` inverse WITHOUT the
    1/N scale (N is a power of two, so the caller's 1/N multiply is exact).
    Each stage views the array as (n, s) [p-major].  Radix-2 step:
    ``y[2p] = a+b``, ``y[2p+1] = (a−b)·w_n^p``.  Radix-4 step (DIF, with
    the quarter-DFT's ±i factors as exact planar swaps):
    ``t0 = a+c, t1 = a−c, t2 = b+d, t3 = sign·i·(b−d)``;
    ``y[4p]   = t0+t2``,            ``y[4p+1] = (t1+t3)·w_n^p``,
    ``y[4p+2] = (t0−t2)·w_n^{2p}``, ``y[4p+3] = (t1−t3)·w_n^{3p}``;
    then reshape to (n/R, R·s) — the classic out-of-place Stockham
    recursion with every butterfly in two-float error-free arithmetic.
    """
    lead = rh.shape[:-1]
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    x = tuple(t.reshape(B, nfft, 1) for t in (rh, rl, ih, il))
    s = 1
    n = nfft
    for kind, tw in _stage_plan(nfft, sign):
        if kind == "r2":
            m = n // 2
            a = tuple(t[:, :m, :] for t in x)
            b = tuple(t[:, m:, :] for t in x)
            ys = (_cdf_add(a, b), _cdf_mul(_cdf_sub(a, b), _bcast_tw(tw)))
            R = 2
        else:
            m = n // 4
            a = tuple(t[:, 0 * m:1 * m, :] for t in x)
            b = tuple(t[:, 1 * m:2 * m, :] for t in x)
            c = tuple(t[:, 2 * m:3 * m, :] for t in x)
            d = tuple(t[:, 3 * m:4 * m, :] for t in x)
            t0 = _cdf_add(a, c)
            t1 = _cdf_sub(a, c)
            t2 = _cdf_add(b, d)
            t3 = _cdf_mul_i(_cdf_sub(b, d), sign)
            w1, w2, w3 = tw
            ys = (_cdf_add(t0, t2),
                  _cdf_mul(_cdf_add(t1, t3), _bcast_tw(w1)),
                  _cdf_mul(_cdf_sub(t0, t2), _bcast_tw(w2)),
                  _cdf_mul(_cdf_sub(t1, t3), _bcast_tw(w3)))
            R = 4
        x = tuple(
            jnp.stack([y[k] for y in ys], axis=2).reshape(B, m, R * s)
            for k in range(4))
        n = m
        s *= R
    return tuple(t.reshape(*lead, nfft) for t in x)


def fft_df(rh, rl, ih, il, nfft: int, sign: int = -1):
    """Two-float planar FFT (see :func:`_fft_df_jit`); inputs are broadcast
    f32 arrays of trailing length ``nfft`` (power of two)."""
    if nfft & (nfft - 1) or nfft < 2:
        raise ValueError(f"two-float FFT needs a power-of-two length, "
                         f"got {nfft}")
    return _fft_df_jit(rh, rl, ih, il, nfft=nfft, sign=sign)


# ----------------------------------------------- host-side f64 filter banks

def _envelope_f64(mother: Mother, F: np.ndarray) -> np.ndarray:
    """Host f64 evaluation of the REAL spectral envelope ``psi_ft_envelope``
    (``mothers.py``) — numpy mirror of the jnp closures, pinned equal to the
    f64-jnp evaluation by ``tests/test_twofloat.py`` so the two cannot drift."""
    F = np.asarray(F, np.float64)
    if isinstance(mother, Morlet):
        return np.exp(-0.5 * (F - mother.f0) ** 2)
    if isinstance(mother, Paul):
        pos = F > 0
        safe = np.where(pos, F, 1.0)
        return np.where(pos, np.exp(mother.m * np.log(safe) - safe), 0.0)
    if isinstance(mother, DOG):  # MexicanHat subclasses DOG
        with np.errstate(invalid="ignore", over="ignore"):
            return F ** mother.m * np.exp(-0.5 * F ** 2)
    raise TypeError(f"unsupported mother for two-float mode: {mother!r}")


def _filter_bank_f64(mother: Mother, scales: np.ndarray, nfft: int,
                     dt: float) -> np.ndarray:
    """(S, nfft) complex128 bank ``sqrt(2π·s/dt)·conj(ψ̂(s·ω))`` — host f64
    twin of ``ops.filterbank.filter_bank`` (reference ``wavelet.py:102-104``)."""
    omega = 2.0 * np.pi * np.fft.fftfreq(nfft, d=dt)
    F = np.asarray(scales, np.float64)[:, None] * omega[None, :]
    env = _envelope_f64(mother, F)
    norm = np.sqrt(2.0 * np.pi * np.asarray(scales, np.float64) / dt)
    return (norm[:, None] * env) * np.conj(complex(mother.psi_ft_const()))


# ------------------------------------------------------------ CWT pipeline

@functools.partial(jax.jit, static_argnames=("nfft",))
def _cwt_df_device(xh, xl, brh, brl, bih, bil, *, nfft: int):
    """Device part of the two-float CWT: forward FFT of the (padded) real
    signal(s) → two-float multiply by the f64-split complex bank → inverse
    FFT rows.  ``xh/xl`` may carry leading batch dims (``(..., nfft)``);
    returns the planar two-float W at full nfft length, ``(..., S, nfft)``."""
    z = jnp.zeros_like(xh)
    Xr_h, Xr_l, Xi_h, Xi_l = fft_df(xh, xl, z, z, nfft, sign=-1)
    spec = (Xr_h[..., None, :], Xr_l[..., None, :],
            Xi_h[..., None, :], Xi_l[..., None, :])
    prod = _cdf_mul(spec, (brh, brl, bih, bil))
    wr_h, wr_l, wi_h, wi_l = fft_df(*prod, nfft, sign=+1)
    inv = np.float32(1.0 / nfft)  # power of two: exact componentwise scale
    return wr_h * inv, wr_l * inv, wi_h * inv, wi_l * inv


def cwt_twofloat(y, dt, dj=1 / 12, s0=-1, J=-1, wavelet="morlet", freqs=None,
                 max_bytes: float = 12e9):
    """Forward CWT in chip-side two-float precision — the opt-in parity mode.

    Accepts a 1-D signal or a ``(B, n0)`` batch (one device dispatch; W
    comes back ``(B, S, n0)``).  A batch whose two-float planes (~4 live
    sets of 4 × (B, S, nfft) f32 across the dispatch's stages) exceed
    ``max_bytes`` raises host-side with the split-the-batch remedy instead
    of OOMing opaquely — same convention as ``wct_matrix``.

    Same grid/COI/NaN-row semantics as :func:`pycwt_tpu.api.cwt` (reference
    ``wavelet.py:13-124``); heavy stages run on the device in (hi, lo) f32
    pairs and the result is assembled to complex128 on the host.  Measured
    ≤1e-6 max relative power error vs the f64 goldens on the real chip
    (vs ~1e-3 for the f32 throughput path) — see BASELINE.md round 5.

    Returns ``(W, sj, freqs, coi)``.
    """
    from ..mothers import as_mother
    from ..transform import (build_scale_grid, coi_bartlett,
                             drop_reference_nan_rows)

    mother = as_mother(wavelet)
    y = np.asarray(y, np.float64)
    if y.ndim not in (1, 2):
        raise ValueError(
            f"cwt_twofloat expects a 1-D signal or a (B, n0) batch, got "
            f"{y.shape}")
    n0 = y.shape[-1]
    nfft = next_pow2(n0)
    if freqs is None:
        grid = build_scale_grid(n0, dt, dj=dj, s0=s0, J=J, mother=mother)
        sj, fr = grid.sj, grid.freqs
    else:
        fr = np.asarray(freqs, np.float64)
        sj = 1.0 / (mother.flambda() * fr)
    sj, fr = drop_reference_nan_rows(mother, sj, fr, nfft, dt)

    B = y.shape[0] if y.ndim == 2 else 1
    resident = 16 * B * len(sj) * nfft * 4
    if resident > max_bytes:
        raise ValueError(
            f"cwt_twofloat batch needs ~{resident / 1e9:.1f} GB of two-float "
            f"planes for B={B} x {len(sj)} scales x nfft={nfft}, over "
            f"max_bytes={max_bytes / 1e9:.1f} GB. Split the batch into "
            f"smaller chunks (results are independent per signal) or raise "
            f"max_bytes on larger devices.")
    bank = _filter_bank_f64(mother, sj, nfft, dt)
    x = np.zeros(y.shape[:-1] + (nfft,), np.float64)
    x[..., :n0] = y
    xh, xl = df_from_f64(x)
    brh, brl = df_from_f64(bank.real)
    bih, bil = df_from_f64(bank.imag)
    wr_h, wr_l, wi_h, wi_l = _cwt_df_device(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(brh), jnp.asarray(brl),
        jnp.asarray(bih), jnp.asarray(bil), nfft=nfft)
    W = (df_to_f64(np.asarray(wr_h), np.asarray(wr_l))
         + 1j * df_to_f64(np.asarray(wi_h), np.asarray(wi_l)))[..., :n0]
    return W, sj, fr, coi_bartlett(n0, dt, mother)


# ------------------------------------------------------- smoothing and WCT

@functools.partial(jax.jit, static_argnames=("nfft",))
def _smooth_df_device(th, tl, gh, gl, *, nfft: int):
    """Two-float time-Gaussian smoothing of a REAL field: FFT → multiply by
    the (f64-split, real) Gaussian → inverse FFT, real part."""
    z = jnp.zeros_like(th)
    yr_h, yr_l, yi_h, yi_l = fft_df(th, tl, z, z, nfft, sign=-1)
    fr = df_mul(yr_h, yr_l, gh, gl)
    fi = df_mul(yi_h, yi_l, gh, gl)
    zr_h, zr_l, _, _ = fft_df(*fr, *fi, nfft, sign=+1)
    inv = np.float32(1.0 / nfft)
    return zr_h * inv, zr_l * inv


def smooth_twofloat(T, scales, dt: float, dj: float, mother: Mother):
    """Two-float twin of ``ops.smoothing.smooth`` for a real or complex f64
    host array ``(S, n)`` (complex fields are smoothed per plane — the real
    kernel commutes with Re/Im).  Time Gaussian on device in two-float;
    scale boxcar on host in f64 (a small banded contraction)."""
    from .smoothing import _boxcar_band_matrix, _scale_window

    T = np.asarray(T)
    if np.iscomplexobj(T):
        return (smooth_twofloat(T.real, scales, dt, dj, mother)
                + 1j * smooth_twofloat(T.imag, scales, dt, dj, mother))
    S, n = T.shape
    nfft = next_pow2(n)
    k = 2.0 * np.pi * np.fft.fftfreq(nfft)  # unit spacing (mothers.py:83)
    snorm = np.asarray(scales, np.float64) / dt
    G = np.exp(-0.5 * (snorm[:, None] ** 2) * (k ** 2)[None, :])
    Tp = np.zeros((S, nfft), np.float64)
    Tp[:, :n] = T
    th, tl = df_from_f64(Tp)
    gh, gl = df_from_f64(G)
    zh, zl = _smooth_df_device(jnp.asarray(th), jnp.asarray(tl),
                               jnp.asarray(gh), jnp.asarray(gl), nfft=nfft)
    sm = df_to_f64(np.asarray(zh), np.asarray(zl))[:, :n]
    win = _scale_window(mother, dj)
    M = _boxcar_band_matrix(S, tuple(win.tolist()), True)
    return np.einsum("st,tn->sn", M, sm)


def xwt_twofloat(y1, y2, dt, dj=1 / 12, s0=-1, J=-1, wavelet="morlet",
                 normalize=True):
    """Cross-wavelet transform in two-float parity mode (reference
    ``wavelet.py:385-399`` semantics; significance belongs to
    :func:`pycwt_tpu.coherence.xwt`).  Returns ``(W12, coi, freq)``."""
    y1 = np.asarray(y1, np.float64)
    y2 = np.asarray(y2, np.float64)
    if normalize:
        y1 = (y1 - y1.mean()) / y1.std()
        y2 = (y2 - y2.mean()) / y2.std()
    W1, sj, fr, coi = cwt_twofloat(y1, dt, dj=dj, s0=s0, J=J, wavelet=wavelet)
    W2, *_ = cwt_twofloat(y2, dt, dj=dj, s0=s0, J=J, wavelet=wavelet)
    return W1 * np.conj(W2), coi, fr


def wct_twofloat(y1, y2, dt, dj=1 / 12, s0=-1, J=-1, wavelet="morlet",
                 normalize=True):
    """Wavelet coherence in two-float parity mode (reference
    ``wavelet.py:489-514``): two two-float CWTs, three two-float smoothings,
    host f64 coherence ratio.  Returns ``(WCT, aWCT, coi, freq)``."""
    from ..mothers import as_mother

    mother = as_mother(wavelet)
    y1 = np.asarray(y1, np.float64)
    y2 = np.asarray(y2, np.float64)
    if normalize:
        y1 = (y1 - y1.mean()) / y1.std()
        y2 = (y2 - y2.mean()) / y2.std()
    W1, sj, fr, coi = cwt_twofloat(y1, dt, dj=dj, s0=s0, J=J, wavelet=mother)
    W2, *_ = cwt_twofloat(y2, dt, dj=dj, s0=s0, J=J, wavelet=mother)
    s_col = np.asarray(sj)[:, None]
    S1 = smooth_twofloat(np.abs(W1) ** 2 / s_col, sj, dt, dj, mother)
    S2 = smooth_twofloat(np.abs(W2) ** 2 / s_col, sj, dt, dj, mother)
    W12 = W1 * np.conj(W2)
    S12 = smooth_twofloat(W12 / s_col, sj, dt, dj, mother)
    WCT = np.abs(S12) ** 2 / (S1 * S2)
    return WCT, np.angle(W12), coi, fr
