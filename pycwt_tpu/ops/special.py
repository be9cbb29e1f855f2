"""Special functions needed on device: inverse regularized incomplete gamma
and the chi-square percent-point function.

The reference uses ``scipy.stats.chi2.ppf`` (``/root/reference/pycwt/wavelet.py:7,
270, 282, 307, 415``) — host-only.  We implement the PPF natively in JAX
(Wilson–Hilferty initial guess + guarded Newton on the regularized lower
incomplete gamma) so significance tests run on device inside jitted pipelines,
and validate against scipy in the test suite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln, ndtri

__all__ = ["gammaincinv", "chi2_ppf", "chi2_ppf_np"]


def gammaincinv(a, p, *, iters: int = 40):
    """Inverse of the regularized lower incomplete gamma: solve P(a, x) = p.

    Parameters
    ----------
    a: shape parameter(s), > 0 (need not be integer — TC98 eq. 23/28 dofs are real).
    p: probability in (0, 1).
    iters: Newton iterations (fixed count for jit-friendliness; converges in
        <10 for typical (a, p), the rest are no-ops at machine precision).
    """
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    dtype = jnp.result_type(a, p, jnp.float32)
    a = a.astype(dtype)
    p = p.astype(dtype)

    # Wilson–Hilferty: chi2_ppf(p, 2a)/2 ≈ a·(1 − 1/(9a) + z·sqrt(1/(9a)))³
    z = ndtri(p)
    t = 1.0 - 1.0 / (9.0 * a) + z * jnp.sqrt(1.0 / (9.0 * a))
    x0 = a * jnp.maximum(t, 1e-8) ** 3
    x0 = jnp.maximum(x0, jnp.finfo(dtype).tiny * 1e8)

    log_gamma_a = gammaln(a)

    def newton(x, _):
        f = gammainc(a, x) - p
        # P'(a, x) = x^(a−1)·e^(−x)/Γ(a)
        logpdf = (a - 1.0) * jnp.log(x) - x - log_gamma_a
        step = f * jnp.exp(-logpdf)
        x_new = x - step
        # Guard: keep iterates positive; bisect toward 0 on overshoot.
        x_new = jnp.where(jnp.isfinite(x_new) & (x_new > 0), x_new, x * 0.5)
        return x_new, None

    x, _ = jax.lax.scan(newton, x0, None, length=iters)
    return x


def chi2_ppf(p, df):
    """Chi-square percent-point function (inverse CDF).

    ``chi2.ppf(p, df) == 2·gammaincinv(df/2, p)``.  Matches
    ``scipy.stats.chi2.ppf`` to ~1e-12 in float64 (tested).
    """
    return 2.0 * gammaincinv(jnp.asarray(df) / 2.0, p)


# ----- host float64 twins (chip processes run without jax_enable_x64) -----
#
# The jnp implementations above compute in f32 when x64 is disabled — fine
# inside fused device pipelines, but the API-level significance tests
# (stats.significance) should be f64-exact regardless of process flags
# (measured 3e-5 relative drift on a no-x64 chip process, round 5).  These
# twins use only the stdlib (math.lgamma, statistics.NormalDist) + numpy —
# scalar host math on tiny (J+1,) arrays.

def _gser_np(a: float, x: float, itmax: int = 500,
             eps: float = 3e-16) -> float:
    """Series for the regularized lower incomplete gamma, x < a+1."""
    import math

    ap = a
    s = 1.0 / a
    delt = s
    for _ in range(itmax):
        ap += 1.0
        delt *= x / ap
        s += delt
        if abs(delt) < abs(s) * eps:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf_np(a: float, x: float, itmax: int = 500,
            eps: float = 3e-16) -> float:
    """Lentz continued fraction for the regularized UPPER gamma Q(a, x)."""
    import math

    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / max(b, tiny)
    h = d
    for i in range(1, itmax):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def _gammainc_np_scalar(a: float, x: float) -> float:
    if x <= 0.0:
        return 0.0
    if x < a + 1.0:
        return _gser_np(a, x)
    return 1.0 - _gcf_np(a, x)


def _gammaincinv_np_scalar(a: float, p: float, iters: int = 60) -> float:
    import math
    import statistics

    # Wilson–Hilferty start (same as the jnp path); Newton's fixed point is
    # set by the f64 gammainc, so start accuracy only affects iteration
    # count.
    z = statistics.NormalDist().inv_cdf(p)
    t = 1.0 - 1.0 / (9.0 * a) + z * math.sqrt(1.0 / (9.0 * a))
    x = a * max(t, 1e-8) ** 3
    x = max(x, 1e-300)
    lg = math.lgamma(a)
    for _ in range(iters):
        f = _gammainc_np_scalar(a, x) - p
        logpdf = (a - 1.0) * math.log(x) - x - lg
        x_new = x - f * math.exp(-logpdf)
        if not (x_new > 0 and math.isfinite(x_new)):
            x_new = x * 0.5
        if abs(x_new - x) <= 1e-15 * x:
            x = x_new
            break
        x = x_new
    return x


def chi2_ppf_np(p, df):
    """Host float64 chi-square PPF — x64-flag-independent twin of
    :func:`chi2_ppf` (matches it, and scipy, to ~1e-12 in f64; tested)."""
    import numpy as np

    fn = np.vectorize(lambda a, q: 2.0 * _gammaincinv_np_scalar(a / 2.0, q),
                      otypes=[np.float64])
    return fn(np.asarray(df, np.float64), np.asarray(p, np.float64))


def chi2_ppf_host(p, df):
    """Chi-square PPF (scalar or elementwise over arrays) in guaranteed
    float64 on the HOST, regardless
    of the process's x64 flag: jnp (f64) when x64 is on, the stdlib twin
    otherwise.  The one dispatch rule for every API-level significance
    scalar (stats.significance, coherence.xwt*)."""
    import jax

    if jax.config.jax_enable_x64:
        import jax.numpy as jnp
        import numpy as np

        return np.asarray(chi2_ppf(jnp.asarray(p, jnp.float64), df))
    return chi2_ppf_np(p, df)
