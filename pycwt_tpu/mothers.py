"""Mother wavelets as pure, jit-friendly frozen dataclasses.

TPU-first redesign of the reference's mother-wavelet classes
(``/root/reference/pycwt/mothers.py``).  Differences from the reference:

* Mothers are **frozen (hashable) dataclasses** so they can be passed as static
  arguments through ``jax.jit`` — all methods are pure jnp functions of their
  inputs.
* Every mother exposes the factorization ``psi_ft(f) = psi_ft_const() *
  psi_ft_envelope(f)`` where the envelope is a *real* function and the constant
  a complex scalar.  This is what lets the Pallas filter-bank kernel work on
  real tiles and apply the complex constant once (see ``ops/filterbank.py``).
* ``psi_ft_envelope`` is computed in a numerically-safe form (e.g. Paul uses
  ``exp(m·log f − f)`` instead of ``f**m · exp(−f)``) so the f32 TPU path does
  not overflow where the reference's naive formula does.  The reference's
  overflow-induced NaN rows (``wavelet.py:111-115`` drops them) are replicated
  at the API layer via :meth:`reference_nan_rows`.
* ``smooth`` (WCT smoothing, reference ``mothers.py:61-104``, Morlet-only there)
  is implemented as a standalone op in ``ops/smoothing.py`` and is available for
  **all** mothers that define ``deltaj0`` — in the reference, ``wct`` with
  Paul/DOG raises ``AttributeError``; here it works (documented fix).

Constants are the Torrence & Compo (1998) Table-2 values, including the ``-1``
sentinels for parameterizations without tabulated factors (reference
``mothers.py:46-59, 142-155, 205-222``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Union

import jax.numpy as jnp
import numpy as np

__all__ = ["Morlet", "Paul", "DOG", "MexicanHat", "Mother", "as_mother"]


def _hermitenorm_coeffs(n: int) -> tuple[float, ...]:
    """Coefficients (highest power first) of the probabilists' Hermite
    polynomial He_n, via the recurrence He_{n+1}(x) = x·He_n(x) − n·He_{n−1}(x).

    Replaces the reference's ``scipy.special.orthogonal.hermitenorm``
    (``mothers.py:8, 189``) without a scipy dependency on device.
    """
    if n == 0:
        return (1.0,)
    prev = np.array([1.0])          # He_0
    cur = np.array([1.0, 0.0])      # He_1 = x
    for k in range(1, n):
        nxt = np.concatenate([cur, [0.0]])          # x * He_k
        nxt[2:] -= k * prev                          # − k * He_{k−1}
        prev, cur = cur, nxt
    return tuple(float(c) for c in cur)


def _double_factorial_range(lo: int, hi: int) -> float:
    """``np.prod(range(lo, hi))`` with the empty-product-is-1 convention the
    reference relies on (``mothers.py:121, 126-127``)."""
    out = 1.0
    for k in range(lo, hi):
        out *= k
    return out


@dataclasses.dataclass(frozen=True)
class Morlet:
    """Morlet mother wavelet (reference ``mothers.py:13-104``).

    ``f`` and ``f0`` are angular frequencies; the default ``f0=6`` carries the
    TC98 Table-2 constants.
    """

    f0: float = 6.0
    name: str = dataclasses.field(default="Morlet", compare=False)

    # -- spectrum -----------------------------------------------------------
    def psi_ft(self, f):
        """ψ̂(f) = π^(−1/4)·exp(−(f−f0)²/2)   (reference ``mothers.py:26-28``)."""
        return self.psi_ft_const() * self.psi_ft_envelope(f)

    def psi_ft_envelope(self, f):
        return jnp.exp(-0.5 * (f - self.f0) ** 2)

    def psi_ft_const(self) -> complex:
        return math.pi ** -0.25

    def analytic_negligible_negative(self) -> bool:
        """True when ψ̂(f≤0) is below f32 round-off (max envelope on the
        negative axis is exp(−f0²/2): 1.5e-8 for f0=6), letting kernels skip
        the negative-frequency half of the filtered spectrum."""
        return math.exp(-0.5 * self.f0 ** 2) < 1e-7

    def psi(self, t):
        """ψ(t) = π^(−1/4)·exp(i f0 t − t²/2)  (reference ``mothers.py:30-32``)."""
        t = jnp.asarray(t)
        return (math.pi ** -0.25) * jnp.exp(1j * self.f0 * t - t ** 2 / 2)

    def psi0(self) -> complex:
        """ψ(0) as a host scalar (used by icwt, reference ``wavelet.py:169``)."""
        return math.pi ** -0.25

    # -- geometry -----------------------------------------------------------
    def flambda(self) -> float:
        """Fourier wavelength (reference ``mothers.py:34-36``)."""
        return (4 * math.pi) / (self.f0 + math.sqrt(2 + self.f0 ** 2))

    def coi(self) -> float:
        """e-folding time factor (reference ``mothers.py:38-40``)."""
        return 1.0 / math.sqrt(2)

    def sup(self) -> float:
        """Support from the e-folding time (reference ``mothers.py:42-44``)."""
        return 1.0 / self.coi()

    # -- TC98 Table-2 constants (reference ``mothers.py:46-59``) ------------
    @property
    def dofmin(self) -> float:
        return 2.0

    @property
    def cdelta(self) -> float:
        return 0.776 if self.f0 == 6 else -1.0

    @property
    def gamma(self) -> float:
        return 2.32 if self.f0 == 6 else -1.0

    @property
    def deltaj0(self) -> float:
        return 0.60 if self.f0 == 6 else -1.0

    # -- API-parity convenience --------------------------------------------
    def smooth(self, W, dt, dj, scales):
        """WCT smoothing (reference ``mothers.py:61-104``); delegates to the op."""
        from .ops.smoothing import smooth as _smooth

        return _smooth(W, dt, dj, scales, self)

    def reference_nan_rows(self, scales: np.ndarray, ftfreqs: np.ndarray) -> np.ndarray:
        """Boolean mask of scale rows whose filter-bank row would contain
        non-finite values under the *reference's* naive f64 formula — the rows
        the reference silently drops (``wavelet.py:111-115``).  Morlet never
        overflows (the Gaussian underflows to 0)."""
        return np.zeros(len(scales), dtype=bool)


@dataclasses.dataclass(frozen=True)
class Paul:
    """Paul mother wavelet of order ``m`` (reference ``mothers.py:107-155``)."""

    m: int = 4
    name: str = dataclasses.field(default="Paul", compare=False)

    def psi_ft(self, f):
        """ψ̂(f) = 2^m/√(m·(2m−1)!)·f^m·e^(−f)·H(f)  (reference ``mothers.py:118-122``)."""
        return self.psi_ft_const() * self.psi_ft_envelope(f)

    def psi_ft_envelope(self, f):
        # Safe form: f^m·e^(−f) = exp(m·log f − f) for f>0, exactly 0 otherwise.
        # The reference's naive product overflows for large negative f (e^{-f}
        # → inf) and yields 0·inf = NaN; see `reference_nan_rows`.
        f = jnp.asarray(f)
        pos = f > 0
        safe_f = jnp.where(pos, f, 1.0)
        return jnp.where(pos, jnp.exp(self.m * jnp.log(safe_f) - safe_f), 0.0)

    def psi_ft_const(self) -> complex:
        # 2^m / sqrt(m * (2m-1)!)   — np.prod(range(2, 2m)) = (2m-1)!
        return 2.0 ** self.m / math.sqrt(self.m * _double_factorial_range(2, 2 * self.m))

    def analytic_negligible_negative(self) -> bool:
        """ψ̂ is EXACTLY zero for f ≤ 0 (Heaviside factor) — fully analytic."""
        return True

    def psi(self, t):
        """ψ(t) (reference ``mothers.py:124-128``), including the reference's
        quirky ``np.prod(range(2, m−1))`` factor (empty product = 1 for m ≤ 3)."""
        t = jnp.asarray(t)
        c = (
            2 ** self.m
            * (1j ** self.m)
            * _double_factorial_range(2, self.m - 1)
            / math.sqrt(math.pi * _double_factorial_range(2, 2 * self.m + 1))
        )
        return c * (1 - 1j * t) ** (-(self.m + 1))

    def psi0(self) -> complex:
        return complex(
            2 ** self.m
            * (1j ** self.m)
            * _double_factorial_range(2, self.m - 1)
            / math.sqrt(math.pi * _double_factorial_range(2, 2 * self.m + 1))
        )

    def flambda(self) -> float:
        return 4 * math.pi / (2 * self.m + 1)

    def coi(self) -> float:
        return math.sqrt(2)

    def sup(self) -> float:
        return 1 / self.coi()

    @property
    def dofmin(self) -> float:
        return 2.0

    @property
    def cdelta(self) -> float:
        return 1.132 if self.m == 4 else -1.0

    @property
    def gamma(self) -> float:
        return 1.17 if self.m == 4 else -1.0

    @property
    def deltaj0(self) -> float:
        return 1.50 if self.m == 4 else -1.0

    def smooth(self, W, dt, dj, scales):
        from .ops.smoothing import smooth as _smooth

        return _smooth(W, dt, dj, scales, self)

    def reference_nan_rows(self, scales: np.ndarray, ftfreqs: np.ndarray) -> np.ndarray:
        """Rows where the reference's naive ``c·f^m·e^(−f)·(f>0)``
        (``mothers.py:118-122``) produces inf·0 = NaN in float64 — large
        negative ``s·ω`` overflows ``e^(−f)`` and the (f>0) gate turns the inf
        into NaN, making the whole row NaN after the iFFT.  The exact constant
        prefactor matters for the overflow threshold, so replicate it."""
        with np.errstate(over="ignore", invalid="ignore"):
            f = scales[:, None] * ftfreqs[None, :]
            # Same association order as the reference expression:
            # ((c · f^m) · e^(−f)) · (f>0)
            ref = float(self.psi_ft_const()) * f ** self.m * np.exp(-f) * (f > 0)
        return ~np.isfinite(ref).all(axis=1)


@dataclasses.dataclass(frozen=True)
class DOG:
    """Derivative-of-Gaussian mother wavelet of order ``m``
    (reference ``mothers.py:158-222``); m=2 is the Mexican hat."""

    m: int = 2
    name: str = dataclasses.field(default="DOG", compare=False)

    def psi_ft(self, f):
        """ψ̂(f) = −(i^m)/√Γ(m+1/2)·f^m·e^(−f²/2)  (reference ``mothers.py:170-173``,
        with the unary minus per the TC98 errata)."""
        return self.psi_ft_const() * self.psi_ft_envelope(f)

    def psi_ft_envelope(self, f):
        f = jnp.asarray(f)
        return f ** self.m * jnp.exp(-0.5 * f ** 2)

    def psi_ft_const(self) -> complex:
        return complex(-(1j ** self.m) / math.sqrt(math.gamma(self.m + 0.5)))

    def analytic_negligible_negative(self) -> bool:
        """DOG's envelope is symmetric in f — the negative half carries half
        the energy; never skippable."""
        return False

    def psi(self, t):
        """ψ(t) via probabilists' Hermite polynomials (reference ``mothers.py:175-191``)."""
        t = jnp.asarray(t)
        coeffs = jnp.asarray(_hermitenorm_coeffs(self.m), dtype=t.dtype)
        return (
            (-1.0) ** (self.m + 1)
            * jnp.polyval(coeffs, t)
            * jnp.exp(-(t ** 2) / 2)
            / math.sqrt(math.gamma(self.m + 0.5))
        )

    def psi0(self) -> complex:
        he0 = float(np.polyval(np.asarray(_hermitenorm_coeffs(self.m)), 0.0))
        return (-1.0) ** (self.m + 1) * he0 / math.sqrt(math.gamma(self.m + 0.5))

    def flambda(self) -> float:
        return 2 * math.pi / math.sqrt(self.m + 0.5)

    def coi(self) -> float:
        return 1 / math.sqrt(2)

    def sup(self) -> float:
        return 1 / self.coi()

    @property
    def dofmin(self) -> float:
        # Reference ``mothers.py:210`` — DOG's dofmin is 1, unlike Morlet/Paul.
        return 1.0

    @property
    def cdelta(self) -> float:
        return {2: 3.541, 6: 1.966}.get(self.m, -1.0)

    @property
    def gamma(self) -> float:
        return {2: 1.43, 6: 1.37}.get(self.m, -1.0)

    @property
    def deltaj0(self) -> float:
        return {2: 1.40, 6: 0.97}.get(self.m, -1.0)

    def smooth(self, W, dt, dj, scales):
        from .ops.smoothing import smooth as _smooth

        return _smooth(W, dt, dj, scales, self)

    def reference_nan_rows(self, scales: np.ndarray, ftfreqs: np.ndarray) -> np.ndarray:
        """The Gaussian factor underflows before f^m can overflow — finite
        everywhere in f64, like the reference."""
        return np.zeros(len(scales), dtype=bool)


@dataclasses.dataclass(frozen=True)
class MexicanHat(DOG):
    """Mexican-hat = DOG(m=2) (reference ``mothers.py:225-233``)."""

    m: int = 2
    name: str = dataclasses.field(default="Mexican Hat", compare=False)


Mother = Union[Morlet, Paul, DOG, MexicanHat]

_REGISTRY = {
    "morlet": Morlet,
    "paul": Paul,
    "dog": DOG,
    "mexicanhat": MexicanHat,
}


def as_mother(wavelet: Union[str, Mother]) -> Mother:
    """Coerce a string or mother instance to a mother instance.

    Mirror of ``_check_parameter_wavelet`` (reference ``wavelet.py:650-663``).
    """
    if isinstance(wavelet, str):
        try:
            return _REGISTRY[wavelet.lower()]()
        except KeyError:
            raise ValueError(
                f"Unknown mother wavelet {wavelet!r}; expected one of {sorted(_REGISTRY)}"
            ) from None
    return wavelet
