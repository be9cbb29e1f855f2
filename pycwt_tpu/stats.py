"""Statistical primitives: AR(1) estimation, red-noise spectra and surrogates,
and the TC98 chi-square significance tests.

Parity targets (each cites its reference counterpart):

* :func:`ar1` — Allen & Smith (1996) unbiased lag-1 estimator via Grinsted's
  quadratic substitution (reference ``/root/reference/pycwt/helpers.py:43-104``).
* :func:`ar1_spectrum` — theoretical AR(1) power spectrum
  (``helpers.py:107-143``).
* :func:`rednoise` — AR(1) surrogate generator.  TPU-native: batched
  ``jax.random`` innovations + log-depth ``associative_scan`` linear recurrence
  instead of scipy's sequential ``lfilter`` (``helpers.py:146-173``); also
  fixes the reference's ``np.randn`` crash for g = 0.
* :func:`significance` — TC98 eqs. 16/18/23/25-28 (``wavelet.py:174-313``)
  with our native chi-square PPF (``ops/special.py``).
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .mothers import as_mother
from .utils.helpers import find

__all__ = ["ar1", "ar1_batch", "ar1_spectrum", "rednoise", "rednoise_batch",
           "rednoise_members", "rednoise_members_pairs", "significance"]


def ar1(x):
    """Unbiased AR(1) lag-1 autocorrelation (Allen & Smith 1996).

    Returns ``(g, a, mu2)``: the lag-1 coefficient, the innovation standard
    deviation, and the normalized squared mean bias (A&S footnote 4).
    Reference: ``helpers.py:43-104`` — including its behavior of raising
    ``Warning`` when the discriminant is non-positive (series too short or
    trend too large), which the samples catch to fall back to white noise.
    """
    x = np.asarray(x, dtype=np.float64)
    N = x.size
    x = x - x.mean()

    c0 = float(x.dot(x)) / N
    c1 = float(x[: N - 1].dot(x[1:])) / (N - 1)

    # Grinsted's substitution reduces the A&S bias equation to a quadratic
    # A·g² + B·g + C = 0 in the lag-1 coefficient g.
    B = -c1 * N - c0 * N ** 2 - 2 * c0 + 2 * c1 - c1 * N ** 2 + c0 * N
    A = c0 * N ** 2
    C = N * (c0 + c1 * N - c1)
    D = B ** 2 - 4 * A * C

    if D <= 0:
        raise Warning(
            "Cannot place an upperbound on the unbiased AR(1). "
            "Series is too short or trend is to large."
        )
    g = (-B - D ** 0.5) / (2 * A)

    # Allen & Smith (1996), footnote 4: squared mean of a finite AR(1) segment.
    mu2 = -1 / N + (2 / N ** 2) * ((N - g ** N) / (1 - g) - g * (1 - g ** (N - 1)) / (1 - g) ** 2)
    c0t = c0 / (1 - mu2)
    a = ((1 - g ** 2) * c0t) ** 0.5
    return g, a, mu2


def ar1_batch(x):
    """Batched :func:`ar1` over the rows of a ``(B, N)`` array.

    The lag covariances are two vectorized float64 einsums (no Python loop
    over B) and the Grinsted quadratic is solved in float64 — bit-compatible
    with the per-series :func:`ar1` on every backend.  (An f32 device-dot
    variant was rejected: the quadratic's discriminant carries O(c·N²) terms
    whose cancellation amplifies f32 rounding near |g| → 1, and TPU has no
    f64 dots — ADVICE r4.)  Rows whose discriminant is non-positive (where
    :func:`ar1` raises ``Warning``) return NaN instead — a batch cannot
    abort on one bad member; callers mask or fall back to white noise per
    row.

    Returns ``(g, a, mu2)`` — each a ``(B,)`` float64 array.
    """
    x = np.asarray(x, np.float64)
    if x.ndim != 2:
        raise ValueError(f"ar1_batch expects (B, N), got {x.shape}")
    N = x.shape[-1]
    xd = x - x.mean(-1, keepdims=True)
    c0 = np.einsum("bn,bn->b", xd, xd) / N
    c1 = np.einsum("bn,bn->b", xd[:, :-1], xd[:, 1:]) / (N - 1)

    B = -c1 * N - c0 * N ** 2 - 2 * c0 + 2 * c1 - c1 * N ** 2 + c0 * N
    A = c0 * N ** 2
    C = N * (c0 + c1 * N - c1)
    D = B ** 2 - 4 * A * C
    ok = D > 0
    with np.errstate(invalid="ignore"):
        g = np.where(ok, (-B - np.sqrt(np.where(ok, D, 0.0))) / (2 * A),
                     np.nan)
        mu2 = -1 / N + (2 / N ** 2) * (
            (N - g ** N) / (1 - g) - g * (1 - g ** (N - 1)) / (1 - g) ** 2)
        c0t = c0 / (1 - mu2)
        a = ((1 - g ** 2) * c0t) ** 0.5
    return g, a, mu2


def ar1_spectrum(freqs, ar1_coeff: float = 0.0):
    """Theoretical AR(1) power spectrum ``(1−g²)/|1−g·e^(−2πif)|²``
    (reference ``helpers.py:107-143``)."""
    freqs = np.asarray(freqs)
    return (1 - ar1_coeff ** 2) / np.abs(1 - ar1_coeff * np.exp(-2j * np.pi * freqs)) ** 2


def _ar1_recurrence(innovations, g):
    """y[t] = g·y[t−1] + innovations[t] along the last axis, y[−1] = 0,
    via log-depth associative scan (TPU-friendly replacement for the
    sequential IIR ``lfilter`` at reference ``helpers.py:170``).  ``g`` may
    be a scalar or any array broadcastable to ``innovations.shape`` (per-row
    coefficients — the batched-alpha Monte-Carlo path)."""
    A = jnp.broadcast_to(jnp.asarray(g, innovations.dtype),
                         innovations.shape)
    # First element has no predecessor: its multiplier is irrelevant for the
    # result but keep it g for uniformity (y[0] = b[0] either way since the
    # combine folds left-to-right starting from (g, b0)).
    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (A, innovations), axis=-1)
    return y


def rednoise_batch(key, shape_n: int, g, a: float = 1.0, batch: int = 1, dtype=jnp.float32):
    """Batch of AR(1) red-noise surrogates, fully on device.

    Matches the reference's construction (``helpers.py:146-173``): innovations
    ``z·a`` with a burn-in of ``tau = ceil(−2/log|g|)`` samples (twice the
    decorrelation time) that are generated and then discarded.  For g = 0 this
    degenerates to white noise (the reference crashes there — fixed).

    Parameters
    ----------
    key: jax PRNG key.
    shape_n: number of output samples per surrogate.
    g: lag-1 coefficient (python float — static burn-in sizing).
    a: innovation std.
    batch: number of independent surrogates.

    Returns ``(batch, shape_n)`` array.
    """
    g = float(g)
    if g == 0.0:
        return a * jax.random.normal(key, (batch, shape_n), dtype=dtype)
    tau = int(np.ceil(-2 / np.log(np.abs(g))))
    z = a * jax.random.normal(key, (batch, shape_n + tau), dtype=dtype)
    y = _ar1_recurrence(z, jnp.asarray(g, dtype=dtype))
    return y[:, tau:]


def rednoise_members(base_key, member_idx, shape_n: int, g, a: float = 1.0,
                     dtype=jnp.float32):
    """Batch of AR(1) surrogates where member ``i``'s stream is
    ``fold_in(base_key, member_idx[i])`` — the stream depends only on the
    member's *global* ensemble index, never on how the ensemble is chunked on
    one device or sharded over a mesh.  This pins Monte-Carlo results to
    ``(seed, mc_count)`` across every (data × scale × mc) factorization
    (SURVEY.md §5 RNG notes).

    Returns ``(len(member_idx), shape_n)``.
    """
    g = float(g)
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(member_idx)
    if g == 0.0:
        return a * jax.vmap(
            lambda k: jax.random.normal(k, (shape_n,), dtype=dtype))(keys)
    tau = int(np.ceil(-2 / np.log(np.abs(g))))
    z = a * jax.vmap(
        lambda k: jax.random.normal(k, (shape_n + tau,), dtype=dtype))(keys)
    y = _ar1_recurrence(z, jnp.asarray(g, dtype=dtype))
    return y[:, tau:]


def rednoise_members_pairs(base_key, pair_slots, member_idx, shape_n: int,
                           g, tau: int, dtype=jnp.float32):
    """AR(1) surrogates for MANY alpha values at once: member ``(p, m)``'s
    stream is ``fold_in(fold_in(base_key, pair_slots[p]), member_idx[m])`` —
    deterministic in (seed, GLOBAL pair slot, global member index)
    regardless of how the ensemble is chunked over members or the pair list
    is blocked over executables.  Unlike :func:`rednoise_members`, ``g`` is
    a TRACED ``(P,)`` array (no recompile per coefficient — the
    batched-significance surface); the burn-in ``tau`` is therefore a static
    argument the caller sizes for the LARGEST |g| in the batch (a
    longer-than-needed burn-in only discards more samples, never changes
    distributions).

    Returns ``(P, len(member_idx), shape_n)``.
    """
    g = jnp.asarray(g, dtype)
    keys = jax.vmap(
        lambda p: jax.vmap(
            lambda i: jax.random.fold_in(jax.random.fold_in(base_key, p), i)
        )(member_idx)
    )(jnp.asarray(pair_slots))                         # (P, M) keys
    z = jax.vmap(jax.vmap(
        lambda k: jax.random.normal(k, (shape_n + tau,), dtype=dtype)))(keys)
    y = _ar1_recurrence(z, g[:, None, None])
    return y[..., tau:]


def rednoise(N: int, g: float, a: float = 1.0, seed: int | None = None):
    """Single red-noise series as a numpy array (API-parity convenience over
    :func:`rednoise_batch`; the reference version is ``helpers.py:146-173``).

    Like the reference (which draws from the global numpy RNG,
    ``helpers.py:169-171``), every call with ``seed=None`` (the default) draws
    FRESH entropy — two successive calls return independent surrogates, so
    reference code that builds a surrogate *pair* with two calls keeps
    working.  Pass an explicit ``seed`` for a deterministic series."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(seed)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return np.asarray(rednoise_batch(key, N, g, a, batch=1, dtype=dtype)[0])


def significance(
    signal,
    dt: float,
    scales,
    sigma_test: int = 0,
    alpha: float | None = None,
    significance_level: float = 0.95,
    dof=-1,
    wavelet="morlet",
):
    """Wavelet-power significance vs a red-noise background (TC98 §4-5).

    Reference: ``wavelet.py:174-313``.  Modes:

    * ``sigma_test=0`` — pointwise chi-square test, TC98 eq. 18;
    * ``sigma_test=1`` — time-average test, eq. 23 (``dof`` = number of
      averaged spectra per scale; scalars are broadcast — the reference
      crashes on scalar ``dof`` here, fixed);
    * ``sigma_test=2`` — scale-average test, eqs. 25-28 (``dof=[s1, s2]``).

    Returns ``(signif, fft_theor)``.  Deviation from the reference: in mode 1
    the reference aliases ``signif`` and ``fft_theor`` to the same buffer
    (``wavelet.py:259``) so its returned "theoretical spectrum" is silently
    overwritten with the significance levels (``:283``); we return the true
    theoretical spectrum.
    """
    wavelet = as_mother(wavelet)

    signal = np.asarray(signal)
    n0 = 1 if signal.ndim == 0 else len(signal)
    J = len(scales) - 1
    scales = np.asarray(scales, dtype=np.float64)
    dj = np.log2(scales[1] / scales[0])

    variance = float(signal) if n0 == 1 else float(signal.std() ** 2)

    if alpha is None:
        alpha, _, _ = ar1(signal)

    period = scales * wavelet.flambda()
    freq = dt / period
    dofmin = wavelet.dofmin
    Cdelta = wavelet.cdelta
    gamma_fac = wavelet.gamma
    dj0 = wavelet.deltaj0

    # Gilman et al. (1963) / TC98 eq. 16 red-noise spectrum, scaled by the
    # series variance (reference ``wavelet.py:255-258``).
    fft_theor = variance * (1 - alpha ** 2) / (
        1 + alpha ** 2 - 2 * alpha * np.cos(2 * np.pi * freq / n0)
    )

    def _ppf(p, df):
        # Guaranteed-f64 host PPF regardless of the x64 flag (round 5): the
        # API-level significance contract is f64 even on chip processes.
        from .ops.special import chi2_ppf_host

        return chi2_ppf_host(p, np.asarray(df, np.float64))

    if sigma_test == 0:
        dof = dofmin
        chisquare = float(_ppf(significance_level, dof)) / dof
        signif = fft_theor * chisquare
    elif sigma_test == 1:
        dof = np.asarray(dof, dtype=np.float64)
        if dof.ndim == 0:
            dof = np.full(J + 1, float(dof))
        dof = dof.copy()
        dof[dof < 1] = 1
        # TC98 eq. 23.
        dof = dofmin * (1 + (dof * dt / gamma_fac / scales) ** 2) ** 0.5
        dof[dof < dofmin] = dofmin
        chisquare = _ppf(significance_level, dof) / dof
        signif = fft_theor * chisquare
    elif sigma_test == 2:
        if len(dof) != 2:
            raise Exception("DOF must be set to [s1, s2], the range of scale-averages")
        if Cdelta == -1:
            raise ValueError(
                f"Cdelta and dj0 not defined for {wavelet.name} with these parameters"
            )
        s1, s2 = dof
        sel = find((scales >= s1) & (scales <= s2))
        navg = sel.size
        if navg == 0:
            raise ValueError(f"No valid scales between {s1} and {s2}.")
        # TC98 eq. 25 (Savg), power-of-two midpoint, eq. 28 (dof),
        # eq. 27 (spectrum), eq. 26 (level).
        Savg = 1 / np.sum(1.0 / scales[sel])
        Smid = np.exp((np.log(s1) + np.log(s2)) / 2.0)
        dof = (dofmin * navg * Savg / Smid) * ((1 + (navg * dj / dj0) ** 2) ** 0.5)
        fft_theor = Savg * np.sum(fft_theor[sel] / scales[sel])
        chisquare = float(_ppf(significance_level, float(dof))) / dof
        signif = (dj * dt / Cdelta / Savg) * fft_theor * chisquare
    else:
        raise ValueError("sigma_test must be either 0, 1, or 2.")

    return signif, fft_theor
