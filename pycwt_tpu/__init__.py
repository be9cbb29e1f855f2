"""pycwt-tpu — a TPU-native continuous wavelet analysis framework.

A from-scratch JAX/XLA/Pallas reimplementation of continuous wavelet spectral
analysis (Torrence & Compo, 1998) with the full capability surface of the
reference ``pycwt`` library (forward/inverse CWT, chi-square and Monte-Carlo
significance, cross-wavelet transform, wavelet coherence, four mother
wavelets), redesigned TPU-first:

* batched, statically-shaped, jit-compiled transform cores
  (:mod:`pycwt_tpu.transform`);
* a Pallas-fused filter-bank × four-step-iFFT kernel for the hot loop
  (:mod:`pycwt_tpu.ops.pallas_fft`);
* sharding over a ``(data × scale × mc)`` device mesh with psum-reduced
  Monte-Carlo ensembles (:mod:`pycwt_tpu.parallel`);
* a drop-in, pycwt-compatible user API (this module's top level).

Public API mirrors the reference's ``pycwt/__init__.py:85-90``.
"""

from . import mothers, sample  # noqa: F401
from .api import cwt, cwt_power, icwt, significance  # noqa: F401
from .coherence import (wct, wct_matrix, wct_pairs, wct_significance,  # noqa: F401
                        wct_significance_batch, xwt,
                        xwt_pairs, xwt_pairs_planar, xwt_planar)
from .mothers import DOG, MexicanHat, Morlet, Paul  # noqa: F401
from .ops.twofloat import (cwt_twofloat, wct_twofloat,  # noqa: F401
                           xwt_twofloat)
from .stats import ar1, ar1_batch, ar1_spectrum, rednoise  # noqa: F401
from .utils.helpers import boxpdf, find, get_cache_dir, rect  # noqa: F401

__all__ = [
    "cwt", "cwt_power", "icwt", "significance", "xwt", "xwt_pairs",
    "xwt_pairs_planar", "xwt_planar",
    "wct", "wct_matrix", "wct_pairs", "wct_significance",
    "wct_significance_batch",
    # Chip-side f64-class parity mode (ops/twofloat.py; BASELINE.md round 5)
    "cwt_twofloat", "xwt_twofloat", "wct_twofloat",
    "mothers", "Morlet", "Paul", "DOG", "MexicanHat",
    "ar1", "ar1_batch", "ar1_spectrum", "rednoise", "find", "rect", "boxpdf",
    "get_cache_dir",
]
__version__ = "0.1.0"
