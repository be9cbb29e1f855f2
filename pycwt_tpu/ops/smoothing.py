"""WCT smoothing operator: Gaussian in time (Fourier domain) + boxcar in scale.

TPU-first rewrite of ``Morlet.smooth`` (reference
``/root/reference/pycwt/mothers.py:61-104``).  Semantics replicated exactly:

* time axis: multiply the (pow-2 padded) spectrum by ``exp(−(s/dt)²k²/2)``
  where ``k = 2π·fftfreq(nfft)`` with **unit** sample spacing (the reference
  passes no ``d`` to fftfreq — ``mothers.py:83``), then inverse FFT and trim;
* scale axis: 'same' 2-D convolution with a normalized boxcar of width
  ``round(deltaj0/dj·2)`` whose end taps are 0.5 (``helpers.py:176-191``,
  ``mothers.py:98-102``).

Differences from the reference:

* batched — accepts ``(..., S, N)``, smoothing the trailing two axes;
* defined for **all** mothers with a tabulated ``deltaj0`` (the reference only
  defines ``smooth`` on Morlet, so ``wct`` with Paul/DOG crashes; here it works).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import next_pow2
from ..mothers import Mother
from .fft import fft as engine_fft, ifft as engine_ifft

__all__ = ["smooth", "smooth_planar_real", "smooth_planar_pair",
           "smooth_scale_sharded", "rect_window", "scale_boxcar_same",
           "scale_boxcar_same_sharded"]


def rect_window(width: int, normalize: bool = True) -> np.ndarray:
    """Boxcar with 0.5 end-weights (reference ``helpers.py:176-191``)."""
    if width < 1:
        raise ValueError("window width must be >= 1")
    win = np.ones(width, dtype=np.float64)
    win[0] = win[-1] = 0.5
    if normalize:
        win /= win.sum()
    return win


def time_gaussian_smooth(W, scales, dt: float, nfft: int, *, engine: str | None = None):
    """Per-scale Gaussian smoothing along the time axis via the convolution
    theorem (reference ``mothers.py:83-96``).  The FFT pair honors the engine
    policy (``ops/fft.py``) so WCT/MC run on backends without XLA's FFT call."""
    n = W.shape[-1]
    real_in = not jnp.iscomplexobj(W)
    k = (2 * jnp.pi) * jnp.fft.fftfreq(nfft).astype(jnp.asarray(scales).dtype)
    snorm = jnp.asarray(scales) / dt
    F = jnp.exp(-0.5 * (snorm[:, None] ** 2) * (k ** 2)[None, :])  # (S, nfft)
    spec = engine_fft(W, n=nfft, engine=engine)
    out = engine_ifft(F * spec, engine=engine)[..., :n]
    return out.real if real_in else out


@functools.lru_cache(maxsize=64)
def _boxcar_band_matrix(S: int, win_key: tuple, f64: bool):
    """Dense (S, S) 'same'-convolution operator for the scale boxcar:
    ``M[i, t] = win[i + start - t]`` (zero outside the window), so the
    L-term shifted-slice sum collapses into one matmul along the scale axis.
    """
    win = np.asarray(win_key, np.float64)
    L = len(win)
    start = (L - 1) // 2
    M = np.zeros((S, S), np.float64)
    for i in range(S):
        for t in range(max(0, i + start - (L - 1)), min(S, i + start + 1)):
            M[i, t] = win[i + start - t]
    return M if f64 else M.astype(np.float32)


def scale_boxcar_same(T, win: np.ndarray):
    """'same'-mode convolution along the scale axis (axis −2), matching
    ``scipy.signal.convolve2d(T, win[:, None], 'same')``
    (reference ``mothers.py:102``) including the even-width centering.

    Implemented as ONE banded-matrix contraction over the (small) scale axis
    instead of an L-term shifted-slice loop — one MXU op on TPU.
    """
    L = len(win)
    if L == 1:
        return T * win[0]
    S = T.shape[-2]
    rdt = T.real.dtype if jnp.iscomplexobj(T) else T.dtype
    M = jnp.asarray(_boxcar_band_matrix(S, tuple(np.asarray(win).tolist()),
                                        jnp.dtype(rdt) == jnp.float64),
                    dtype=rdt)
    return jnp.einsum("st,...tn->...sn", M, T,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=T.dtype)


def _scale_window(mother: Mother, dj: float) -> np.ndarray:
    if mother.deltaj0 == -1:
        raise ValueError(
            f"deltaj0 is not tabulated for {mother.name} with these parameters; "
            "cannot build the scale-smoothing window (TC98 Table 2)."
        )
    wsize = mother.deltaj0 / dj * 2
    return rect_window(int(round_half_even_np(wsize)), normalize=True)


def smooth_planar_real(T, dt: float, dj: float, scales, mother: Mother,
                       precision=None):
    """:func:`smooth` for a REAL ``(..., S, N)`` array with NO complex dtype
    anywhere: the time Gaussian rides the planar MXU DFT and the scale boxcar
    is real arithmetic.  A complex field is smoothed by calling this on each
    plane (the smoothing kernel is real, so it commutes with Re/Im) — or, at
    ~2/3 the einsum count, by :func:`smooth_planar_pair`.

    This is the WCT-smoothing path for runtimes whose complex64 support is
    missing or flapping (see ``ops/fft.py``); numerically it matches
    :func:`smooth` to planar-DFT round-off.
    """
    win = _scale_window(mother, dj)
    from .mxu_dft import _dft_planar

    precision = jax.lax.Precision.HIGHEST if precision is None else precision
    n = T.shape[-1]
    nfft = next_pow2(n)
    pad = [(0, 0)] * (T.ndim - 1) + [(0, nfft - n)]
    Tp = jnp.pad(T, pad)
    yr, yi = _dft_planar(Tp, None, nfft, -1, precision)
    k = (2 * jnp.pi) * jnp.fft.fftfreq(nfft).astype(T.dtype)
    snorm = jnp.asarray(scales) / dt
    F = jnp.exp(-0.5 * (snorm[:, None] ** 2) * (k ** 2)[None, :])
    zr, _ = _dft_planar(F * yr, F * yi, nfft, +1, precision)
    sm = (zr / nfft)[..., :n]
    return scale_boxcar_same(sm, win)


def smooth_planar_pair(Ta, Tb, dt: float, dj: float, scales, mother: Mother,
                       precision=None):
    """Smooth TWO real ``(..., S, N)`` planes with ONE complex planar DFT
    pair (the classic two-real-FFTs-in-one-complex-FFT packing): with
    ``x = Ta + i·Tb``, the real smoothing kernel commutes with Re/Im, so
    ``smooth(x) = smooth(Ta) + i·smooth(Tb)`` and the planar inverse's two
    output planes ARE the two smoothed fields.  Bit-compatible with calling
    :func:`smooth_planar_real` twice up to matmul reassociation (~f32
    round-off); 16 vs 24 stage-einsums for the pair.

    The WCT/MC hot path (``coherence._wct_core_planar``) packs
    (|W1|², |W2|²) and (Re W12, Im W12) this way.
    """
    win = _scale_window(mother, dj)
    from .mxu_dft import _dft_planar

    precision = jax.lax.Precision.HIGHEST if precision is None else precision
    n = Ta.shape[-1]
    nfft = next_pow2(n)
    pad = [(0, 0)] * (Ta.ndim - 1) + [(0, nfft - n)]
    yr, yi = _dft_planar(jnp.pad(Ta, pad), jnp.pad(Tb, pad), nfft, -1,
                         precision)
    k = (2 * jnp.pi) * jnp.fft.fftfreq(nfft).astype(Ta.dtype)
    snorm = jnp.asarray(scales) / dt
    F = jnp.exp(-0.5 * (snorm[:, None] ** 2) * (k ** 2)[None, :])
    zr, zi = _dft_planar(F * yr, F * yi, nfft, +1, precision)
    sa = (zr / nfft)[..., :n]
    sb = (zi / nfft)[..., :n]
    return scale_boxcar_same(sa, win), scale_boxcar_same(sb, win)


def scale_boxcar_same_sharded(T, win: np.ndarray, axis_name: str = "scale"):
    """Scale-axis 'same' boxcar when the scale axis (−2) is SHARDED over a
    mesh axis — inside a ``shard_map``.

    The boxcar couples each scale row to its ⌈(L−1)/2⌉ neighbors (reference
    ``/root/reference/pycwt/mothers.py:98-102``), so sharded blocks exchange
    halo rows with their mesh neighbors via two ``ppermute`` shifts.
    ``ppermute`` fills pairs with no source with zeros — exactly the 'same'
    convolution's zero-pad semantics at the global scale-grid edges, so edge
    devices need no special casing.

    ``T``: local block ``(..., S_loc, N)``.  Requires halo ≤ S_loc (one-hop
    exchange; dj≥1/24-style grids sharded 8-way satisfy this comfortably).
    """
    L = len(win)
    if L == 1:
        return T * win[0]
    start = (L - 1) // 2    # rows needed ABOVE (higher scale index)
    h_up = start
    h_dn = L - 1 - start    # rows needed BELOW (lower scale index)
    S_loc = T.shape[-2]
    if max(h_up, h_dn) > S_loc:
        raise ValueError(
            f"boxcar halo {max(h_up, h_dn)} exceeds local scale block {S_loc}; "
            "use fewer 'scale' shards or a coarser dj"
        )
    n_shards = jax.lax.axis_size(axis_name)
    ndim = T.ndim

    parts = []
    if h_dn:
        # Each device's LAST h_dn rows go to the next device (i → i+1);
        # device 0 receives zeros (global lower edge).
        tail = jax.lax.slice_in_dim(T, S_loc - h_dn, S_loc, axis=ndim - 2)
        below = jax.lax.ppermute(
            tail, axis_name, [(i, i + 1) for i in range(n_shards - 1)])
        parts.append(below)
    parts.append(T)
    if h_up:
        # Each device's FIRST h_up rows go to the previous device (i → i−1);
        # the last device receives zeros (global upper edge).
        head = jax.lax.slice_in_dim(T, 0, h_up, axis=ndim - 2)
        above = jax.lax.ppermute(
            head, axis_name, [(i + 1, i) for i in range(n_shards - 1)])
        parts.append(above)
    T_ext = jnp.concatenate(parts, axis=ndim - 2)

    # out[s] = Σ_j win[j] · T_global[lo + s + start − j]
    #        = Σ_j win[j] · T_ext[h_dn + s + start − j]
    w = jnp.asarray(win, dtype=T.real.dtype if jnp.iscomplexobj(T) else T.dtype)
    out = None
    for j in range(L):
        lo = h_dn + start - j
        term = w[j] * jax.lax.slice_in_dim(T_ext, lo, lo + S_loc, axis=ndim - 2)
        out = term if out is None else out + term
    return out


def smooth_scale_sharded(W, dt: float, dj: float, scales_local, mother: Mother,
                         *, axis_name: str = "scale",
                         n_true_scales: int | None = None,
                         engine: str | None = None):
    """:func:`smooth` for use INSIDE a ``shard_map`` whose scale axis (−2) is
    sharded on mesh axis ``axis_name``.

    The time-Gaussian pass is row-local (each device smooths its own scale
    rows with its local scale values); the scale boxcar exchanges halo rows
    via :func:`scale_boxcar_same_sharded`.  ``n_true_scales`` masks
    replication-padded rows (``parallel.sharded.pad_scales``) to zero *before*
    the boxcar so they contribute exactly the zero padding the unsharded
    'same' convolution sees.
    """
    if mother.deltaj0 == -1:
        raise ValueError(
            f"deltaj0 is not tabulated for {mother.name} with these parameters; "
            "cannot build the scale-smoothing window (TC98 Table 2)."
        )
    n = W.shape[-1]
    nfft = next_pow2(n)
    T = time_gaussian_smooth(W, scales_local, dt, nfft, engine=engine)
    if n_true_scales is not None:
        S_loc = T.shape[-2]
        global_row = jax.lax.axis_index(axis_name) * S_loc + jnp.arange(S_loc)
        T = jnp.where((global_row < n_true_scales)[:, None], T, 0)
    wsize = mother.deltaj0 / dj * 2
    win = rect_window(int(round_half_even_np(wsize)), normalize=True)
    return scale_boxcar_same_sharded(T, win, axis_name=axis_name)


def smooth(W, dt: float, dj: float, scales, mother: Mother, *,
           engine: str | None = None):
    """Full WCT smoothing: time Gaussian then scale boxcar.

    Parameters
    ----------
    W: ``(..., S, N)`` real or complex array (e.g. ``|W|²/s`` or ``W₁W₂*/s``).
    dt: sampling interval.
    dj: scale spacing (sets the boxcar width ``round(deltaj0/dj·2)``).
    scales: (S,) wavelet scales.
    mother: mother wavelet providing ``deltaj0``.
    engine: FFT engine for the time-Gaussian pass (``ops/fft.py``).
    """
    if mother.deltaj0 == -1:
        raise ValueError(
            f"deltaj0 is not tabulated for {mother.name} with these parameters; "
            "cannot build the scale-smoothing window (TC98 Table 2)."
        )
    n = W.shape[-1]
    nfft = next_pow2(n)
    T = time_gaussian_smooth(W, scales, dt, nfft, engine=engine)
    wsize = mother.deltaj0 / dj * 2
    win = rect_window(int(round_half_even_np(wsize)), normalize=True)
    return scale_boxcar_same(T, win)


def round_half_even_np(x: float) -> int:
    """int(np.round(x)) — banker's rounding, as the reference uses
    (``mothers.py:101``)."""
    return int(np.round(x))
