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

__all__ = ["gammaincinv", "chi2_ppf"]


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
