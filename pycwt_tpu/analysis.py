"""High-level analysis pipelines — the application layer.

Library-grade equivalents of the reference's demo scripts:

* :func:`cwt_analysis`  — the full Torrence & Compo Figure-1 flow of
  ``/root/reference/pycwt/sample/sample.py:39-197`` / ``simple_sample.py``:
  normalize → CWT → power → pointwise significance → global wavelet spectrum
  (+ time-average significance) → scale-average power (+ scale-average
  significance) → inverse transform, returned as a typed result record.
* :func:`xwt_analysis` / :func:`wct_analysis` — the ``sample_xwt.py`` flow
  (``sample/sample_xwt.py:52-168``) including the boxpdf preprocessing option
  and the Torrence & Webster phase-arrow convention helpers.

Everything heavy runs through the jitted batched cores; these functions are
thin orchestration suitable for scripts and notebooks.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from . import api
from .coherence import wct as _wct
from .coherence import xwt as _xwt
from .mothers import Mother, as_mother
from .stats import ar1
from .utils.helpers import boxpdf

__all__ = ["CWTAnalysis", "cwt_analysis", "global_spectrum", "xwt_analysis",
           "wct_analysis", "wct_matrix_analysis", "phase_arrows"]


def global_spectrum(signal, dt: float, dj: float = 1 / 12, s0: float = -1,
                    J: int = -1, wavelet: Mother | str = "morlet",
                    variance_scaled: bool = True,
                    engine: str | None = None,
                    exact_trim: bool = False):
    """Global wavelet spectrum WITHOUT materializing the transform.

    For spectrum-only workloads this is the fast path: by Parseval the
    time-mean wavelet power per scale needs no inverse FFT at all
    (:func:`pycwt_tpu.ops.spectra.global_power_parseval` — one elementwise
    pass over the (S × nfft) filter grid), versus the reference's
    materialize-W-then-average at ``sample/sample.py:90``.  Exact when the
    signal length is a power of two; with padding the difference is confined
    to COI-masked edge energy (an O(%) deviation at large scales for non-pow-2
    lengths).  ``exact_trim=True`` switches to the materialized
    transform-then-trimmed-mean, matching the reference demo's sum exactly at
    the cost of holding (S × nfft).  For N ≫ HBM use
    :func:`pycwt_tpu.ops.overlap.streamed_global_power` instead.

    Returns ``(global_power, scales, freqs)`` with the reference demo's
    variance scaling when ``variance_scaled``.
    """
    import jax.numpy as jnp

    from .config import DEFAULT
    from .ops.spectra import global_power_parseval
    from .transform import build_scale_grid

    mother = as_mother(wavelet)
    signal = np.asarray(signal)
    n0 = len(signal)
    std = signal.std()
    x = (signal - signal.mean()) / std
    grid = build_scale_grid(n0, dt, dj=dj, s0=s0, J=J, mother=mother)
    nfft = DEFAULT.fft_length(n0)
    if exact_trim and nfft != n0:
        from .transform import cwt_batch

        W, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(grid.sj), dt,
                         mother=mother, nfft=nfft, engine=engine)
        gws = np.asarray((jnp.abs(W[..., :n0]) ** 2).mean(-1)[0])
    else:
        p = global_power_parseval(jnp.asarray(x)[None], jnp.asarray(grid.sj),
                                  dt=dt, mother=mother, nfft=nfft,
                                  engine=engine)
        gws = np.asarray(p[0]) / n0
    if variance_scaled:
        gws = gws * float(std) ** 2
    return gws, grid.sj, grid.freqs


@dataclasses.dataclass(frozen=True)
class CWTAnalysis:
    """Complete single-series wavelet analysis (TC98 Figure-1 contents)."""

    signal: np.ndarray          # standardized input
    t: np.ndarray               # time axis
    dt: float
    W: np.ndarray               # (S, N) wavelet transform
    scales: np.ndarray
    freqs: np.ndarray
    period: np.ndarray
    coi: np.ndarray
    power: np.ndarray           # |W|²
    alpha: float                # AR(1) coefficient used for the red-noise null
    sig95: np.ndarray           # (S, N) power / pointwise significance ratio
    global_power: np.ndarray    # variance-scaled global wavelet spectrum
    global_signif: np.ndarray
    scale_avg: np.ndarray       # scale-averaged power over `avg_band`
    scale_avg_signif: float
    avg_band: tuple
    iwave: np.ndarray           # inverse transform (reconstruction)
    std: float                  # original std (denormalization factor)


def cwt_analysis(
    signal,
    dt: float,
    t0: float = 0.0,
    dj: float = 1 / 12,
    s0: float = -1,
    J: int = -1,
    mother: Mother | str = "morlet",
    significance_level: float = 0.95,
    avg_band: tuple = (2.0, 8.0),
    normalize: bool = True,
    alpha: float | None = None,
    rectify: bool = False,
) -> CWTAnalysis:
    """Run the complete TC98 analysis on one series.

    Mirrors ``sample/sample.py``: AR(1) fit with white-noise fallback
    (``sample.py:58-63``; deviation: the reference's except-branch sets
    ``alpha = 1.0`` while its comment says "assume a white noise background" —
    α=1 degenerates the Gilman spectrum to 0 and every significance ratio to
    inf, so we use the comment's intent, ``alpha = 0.0``), pointwise
    chi-square test (eq. 18), global spectrum
    with eq. 23 time-average significance (dof = N − scales, ``sample.py:86-89``),
    and eq. 24 scale-average power over ``avg_band`` with eq. 26-28
    significance (``sample.py:96-107``).
    """
    mother = as_mother(mother)
    signal = np.asarray(signal, dtype=np.float64)
    n0 = signal.size
    std = float(signal.std())
    x = (signal - signal.mean()) / std if normalize else signal.copy()
    var = std ** 2 if normalize else float(signal.var())

    if alpha is None:
        try:
            alpha, _, _ = ar1(x)
        except Warning:
            alpha = 0.0  # white-noise fallback, as the sample scripts do

    # On complex-free runtimes (engine resolves "planar" — e.g. the tunneled
    # axon TPU, where complex64 is UNIMPLEMENTED) the whole flow still runs:
    # power from the planar planes; W is reassembled HOST-side (numpy complex,
    # never a device dtype) so result.W carries full phase information.
    from .config import DEFAULT as _CFG
    from .ops.fft import resolve_engine
    from .ops.mxu_dft import supported_n

    nfft = _CFG.fft_length(n0)
    if resolve_engine(_CFG.engine) == "planar" and supported_n(nfft):
        wr, wi, sj, freqs, coi = api._cwt_planar_parts(
            x, dt, dj=dj, s0=s0, J=J, wavelet=mother)
        power = wr ** 2 + wi ** 2
        W = wr + 1j * wi  # host-side numpy complex (ADVICE r3)
    else:
        W, sj, freqs, coi, _, _ = api.cwt(x, dt, dj=dj, s0=s0, J=J,
                                          wavelet=mother)
        power = np.abs(W) ** 2
    period = 1.0 / freqs

    signif, _ = api.significance(1.0, dt, sj, 0, alpha=alpha,
                                 significance_level=significance_level,
                                 wavelet=mother)
    sig95 = power / (signif[:, None] * np.ones((1, n0)))

    # Global wavelet spectrum + eq. 23 time-average significance.
    glbl_power = var * power.mean(axis=1)
    dof = n0 - sj
    glbl_signif, _ = api.significance(var, dt, sj, 1, alpha=alpha,
                                      significance_level=significance_level,
                                      dof=dof, wavelet=mother)

    # Scale-average power over avg_band (TC98 eq. 24) + eq. 26-28 significance.
    lo, hi = avg_band
    sel = (period >= lo) & (period < hi)
    # eq. 24 with Cdelta, as sample.py:99-101
    cd = mother.cdelta
    dj_eff = dj
    scale_avg_full = power / sj[:, None]
    scale_avg = var * dj_eff * dt / cd * scale_avg_full[sel, :].sum(axis=0)
    try:
        scale_avg_signif, _ = api.significance(
            var, dt, sj, 2, alpha=alpha,
            significance_level=significance_level,
            dof=[sj[sel].min(), sj[sel].max()], wavelet=mother)
    except ValueError:
        scale_avg_signif = float("nan")

    iwave = api.icwt(W, sj, dt, dj=dj_eff, wavelet=mother)

    if rectify:
        # Liu, Liang & Weisberg (2007) bias rectification: divide the power
        # spectrum by scale so peaks at different scales are comparable.  The
        # reference carries this as a commented-out TODO (sample.py:84-86).
        # Applied AFTER the significance ratio and the TC98 global/scale
        # averages, which keep their eq. 18/23/24 definitions.
        power = power / sj[:, None]

    return CWTAnalysis(
        signal=x, t=t0 + np.arange(n0) * dt, dt=dt, W=W, scales=sj,
        freqs=freqs, period=period, coi=coi, power=power, alpha=float(alpha),
        sig95=sig95, global_power=glbl_power, global_signif=glbl_signif,
        scale_avg=scale_avg, scale_avg_signif=float(np.atleast_1d(scale_avg_signif)[0]),
        avg_band=avg_band, iwave=np.real(iwave) * (std if normalize else 1.0),
        std=std,
    )


def xwt_analysis(y1, y2, dt, dj=1 / 12, s0=-1, J=-1,
                 significance_level: float = 0.8646,
                 mother="morlet", boxpdf_transform: bool = False):
    """Cross-wavelet analysis of a signal pair (``sample_xwt.py:139-141``).

    ``significance_level`` defaults to 0.8646 per the Grinsted Z₂ convention
    (reference ``wavelet.py:367-373``).  ``boxpdf_transform`` rank-transforms
    strongly non-Gaussian series first (``sample_xwt.py:52``).
    """
    y1 = np.asarray(y1, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    if boxpdf_transform:
        y1, _, _ = boxpdf(y1)
        y2, _, _ = boxpdf(y2)
    from .config import DEFAULT as _CFG
    from .ops.fft import resolve_engine

    if resolve_engine(_CFG.engine) == "planar":
        # Complex-free runtimes (axon TPU): magnitude/phase planar pipeline;
        # W12 reconstructed host-side for the return contract.
        from .coherence import xwt_planar

        cross_power, phase, coi, freq, signif = xwt_planar(
            y1, y2, dt, dj=dj, s0=s0, J=J,
            significance_level=significance_level, wavelet=mother)
        W12 = cross_power * np.exp(1j * phase)   # host-side numpy, not device
    else:
        W12, coi, freq, signif = _xwt(y1, y2, dt, dj=dj, s0=s0, J=J,
                                      significance_level=significance_level,
                                      wavelet=mother)
        cross_power = np.abs(W12)
        phase = np.angle(W12)
    cross_sig = cross_power / (signif[:, None])
    return dict(W12=W12, cross_power=cross_power, cross_sig=cross_sig,
                phase=phase, coi=coi, freq=freq, period=1 / freq,
                signif=signif)


def wct_analysis(y1, y2, dt, dj=1 / 12, s0=-1, J=-1,
                 significance_level: float = 0.8646, mother="morlet",
                 sig: bool = True, **kwargs):
    """Wavelet-coherence analysis of a signal pair (``sample_xwt.py:151-154``)."""
    WCT, aWCT, coi, freq, sig95 = _wct(
        np.asarray(y1, np.float64), np.asarray(y2, np.float64), dt, dj=dj,
        s0=s0, J=J, sig=sig, significance_level=significance_level,
        wavelet=mother, **kwargs)
    return dict(WCT=WCT, phase=aWCT, coi=coi, freq=freq, period=1 / freq,
                sig95=sig95)


def wct_matrix_analysis(y, dt, dj=1 / 12, s0=-1, J=-1, mother="morlet",
                        significance_level=0.8646, sig: bool = True,
                        pairs=None, mc_count=300, seed=0, cache=True,
                        normalize=True, alpha_quant=None, as_numpy=True):
    """All-pairs coherence analysis of ``B`` signals with per-pair
    Monte-Carlo nulls — the production serving workflow of
    :func:`pycwt_tpu.coherence.wct_matrix` +
    :func:`pycwt_tpu.coherence.wct_significance_batch` as one call
    (tutorial §11; the reference computes one pair and one null per call).

    Each signal's CWT/self-smoothing is computed once and shared across its
    pairs; the P null ensembles (one per pair, AR(1) coefficients fitted
    per signal with :func:`pycwt_tpu.stats.ar1_batch`, white-noise fallback
    where the fit is degenerate) run in ONE compiled Monte-Carlo dispatch.

    Returns a dict with ``WCT``/``phase`` ``(P, S, n0)``, ``pairs`` ``(P,
    2)``, ``sig95`` ``(P, S)`` (or 0 when ``sig=False``), ``alpha`` ``(B,)``,
    ``coi``, ``freq``, ``period``.
    """
    from .coherence import wct_matrix, wct_significance_batch
    from .mothers import as_mother as _as_mother
    from .stats import ar1_batch

    m = _as_mother(mother)
    y = np.asarray(y, np.float64)
    B, n0 = y.shape
    if s0 == -1:
        s0 = 2 * dt / m.flambda()
    if J == -1:
        J = int(np.round(np.log2(n0 * dt / s0) / dj))

    # as_numpy=False keeps the (P, S, n0) maps on device — the fetch, not
    # the compute, dominates on bandwidth-constrained hosts (wct_matrix
    # docstring / BASELINE.md round 5).
    WCT, aWCT, coi, freq, pairs_out = wct_matrix(
        y, dt, dj=dj, s0=s0, J=J, wavelet=m, pairs=pairs,
        normalize=normalize, as_numpy=as_numpy)

    g, _, _ = ar1_batch(y)
    # White-noise fallback for degenerate fits, as the sample scripts do;
    # non-stationary fits (|g| >= 1, possible for strong trends) are clipped
    # just inside the stationary region — the null must be a proper AR(1).
    g = np.where(np.isfinite(g), g, 0.0)
    g = np.clip(g, -0.99, 0.99)

    if sig:
        # Nulls are deduplicated to distinct canonical (sorted,
        # alpha_quant-rounded) coefficient pairs and cached incrementally —
        # a B-station network whose fitted alphas share k rounded values
        # runs k(k+1)/2 ensembles, not B(B-1)/2 (wct_significance_batch).
        sig95 = wct_significance_batch(
            g[pairs_out[:, 0]], g[pairs_out[:, 1]], dt=dt, dj=dj, s0=s0,
            J=J, significance_level=significance_level, wavelet=m,
            mc_count=mc_count, seed=seed, cache=cache, progress=False,
            alpha_quant=alpha_quant)
    else:
        sig95 = np.asarray([0])
    return dict(WCT=WCT, phase=aWCT, pairs=pairs_out, sig95=sig95,
                alpha=g, coi=coi, freq=freq, period=1 / freq)


def phase_arrows(phase: np.ndarray):
    """(u, v) quiver components for the Torrence & Webster convention:
    in-phase points up/N (reference ``sample_xwt.py:160-168``)."""
    u, v = np.sin(phase), np.cos(phase)
    return u, v
