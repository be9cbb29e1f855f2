"""TPU compute ops: filter banks, smoothing, special functions, Pallas kernels."""

from .filterbank import filter_bank, apply_filter_bank  # noqa: F401
from .smoothing import smooth  # noqa: F401
from .special import chi2_ppf, gammaincinv  # noqa: F401
