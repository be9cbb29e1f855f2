"""Distributed (pencil / transpose) FFT over a device mesh — SURVEY §2b P3.

The overlap-save path (`ops/overlap.py`) covers long-signal CWT by blocked
convolution with ppermute halos; this module is the OTHER long-context
design SURVEY names — the Ulysses-style transpose decomposition of the FFT
itself, for workloads that want the *exact global spectrum* of a time-sharded
signal (no truncated-filter edge effects at any scale).

Four-step Cooley-Tukey with the factor split ``N = R1·R2``,
``n = n1·R2 + n2``, ``k = k1 + R1·k2``:

    X[k1 + R1·k2] = Σ_{n2} e^{s·2πi·n2·k1/N} · F2[n2, k2] ·
                    (Σ_{n1} F1[k1, n1] · x[n1·R2 + n2])

With the time axis sharded in contiguous slabs (n1-major), the stages map to

    all_to_all (slab → n2-pencil) → MXU DFT over n1 → twiddle →
    all_to_all (n2-pencil → k1-pencil) → MXU DFT over n2 →
    all_to_all (k1-pencil → natural-order k-slab)

i.e. three ``all_to_all`` collectives riding ICI and two local matmul DFT
stages on the MXU — no FFT custom call anywhere.  Each device holds O(N/D)
at all times; no device ever materializes the full signal or spectrum.

The reference has no distributed anything (its only long-signal concession
is pow-2 padding, ``/root/reference/pycwt/helpers.py:27-30``).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["sharded_dft", "sharded_idft", "sharded_cwt_spectral",
           "sharded_dft_planar", "sharded_cwt_spectral_planar"]


def _split_for(N: int, D: int) -> tuple[int, int]:
    """Balanced pow-2 split N = R1·R2 with D | R1 and D | R2."""
    p = N.bit_length() - 1
    if (1 << p) != N:
        raise ValueError(f"distributed DFT needs pow-2 N, got {N}")
    d = D.bit_length() - 1
    if (1 << d) != D:
        raise ValueError(f"mesh axis size must be pow-2, got {D}")
    R1 = 1 << (p // 2)
    R2 = N // R1
    if R1 % D or R2 % D:
        raise ValueError(
            f"N={N} too small to pencil-decompose over {D} devices "
            f"(needs {D} | {R1} and {D} | {R2})")
    return R1, R2


@functools.lru_cache(maxsize=16)
def _dft_mats(R1: int, R2: int, sign: int, f64: bool):
    dt = np.complex128 if f64 else np.complex64
    k1 = np.arange(R1)
    n2 = np.arange(R2)
    F1 = np.exp(sign * 2j * np.pi * np.outer(k1, k1) / R1).astype(dt)
    F2 = np.exp(sign * 2j * np.pi * np.outer(n2, n2) / R2).astype(dt)
    return F1, F2


@functools.lru_cache(maxsize=32)
def _sharded_dft_fn(mesh: Mesh, N: int, sign: int, f64: bool,
                    axis_name: str, batch_rank: int):
    D = mesh.shape[axis_name]
    R1, R2 = _split_for(N, D)
    A = R1 // D          # local n1 rows
    R2l = R2 // D        # local n2/k2 pencil width
    F1, F2 = _dft_mats(R1, R2, sign, f64)
    cdt = jnp.complex128 if f64 else jnp.complex64
    rdt = jnp.float64 if f64 else jnp.float32
    b = batch_rank

    def shard_fn(x_loc):
        # x_loc: (..., N/D) — contiguous slab of the n1-major (R1, R2) view.
        B = x_loc.shape[:-1]
        X = x_loc.reshape(B + (A, R2)).astype(cdt)
        # slab → n2-pencil: all n1 rows for my R2/D columns.
        X = jax.lax.all_to_all(X, axis_name, split_axis=b + 1, concat_axis=b,
                               tiled=True)                    # (..., R1, R2l)
        # MXU DFT over n1.
        Y = jnp.einsum("kn,...nj->...kj", jnp.asarray(F1), X,
                       precision=jax.lax.Precision.HIGHEST)
        # Twiddle e^{s·2πi·n2·k1/N} with GLOBAL n2 of my pencil.
        d = jax.lax.axis_index(axis_name)
        n2g = (d * R2l + jnp.arange(R2l)).astype(rdt)
        k1 = jnp.arange(R1).astype(rdt)
        phase = (sign * 2 * jnp.pi / N) * jnp.outer(k1, n2g)
        Y = Y * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        # n2-pencil → k1-pencil: my R1/D rows, all n2.
        U = jax.lax.all_to_all(Y, axis_name, split_axis=b, concat_axis=b + 1,
                               tiled=True)                    # (..., R1l, R2)
        # MXU DFT over n2.
        Z = jnp.einsum("...kn,nj->...kj", U, jnp.asarray(F2),
                       precision=jax.lax.Precision.HIGHEST)
        # k1-pencil → natural-order slab: all k1, my R2/D values of k2.
        V = jax.lax.all_to_all(Z, axis_name, split_axis=b + 1, concat_axis=b,
                               tiled=True)                    # (..., R1, R2l)
        # k = k1 + R1·k2 → k2-major flatten of (R2l, R1).
        return jnp.swapaxes(V, -1, -2).reshape(B + (R1 * R2l,))

    spec = P(*([None] * b), axis_name)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
        check_vma=False,  # the twiddle uses axis_index (position-dependent)
    )
    return jax.jit(fn)


def sharded_dft(mesh: Mesh, x, *, sign: int = -1, axis_name: str = "data"):
    """DFT of a 1-D pow-2 signal whose time axis is (or will be) sharded in
    contiguous slabs over ``axis_name``.

    Matches ``jnp.fft.fft(x)`` (``sign=-1``) / the UNSCALED inverse
    (``sign=+1``) while every device only ever holds O(N/D).  Real or complex
    input; output is the full complex spectrum, sharded ``P(axis_name)`` in
    natural frequency order.
    """
    x = jnp.asarray(x)
    N = x.shape[-1]
    f64 = x.dtype in (jnp.float64, jnp.complex128)
    b = x.ndim - 1
    fn = _sharded_dft_fn(mesh, N, sign, f64, axis_name, b)
    x = jax.device_put(x, NamedSharding(mesh, P(*([None] * b), axis_name)))
    return fn(x)


def sharded_idft(mesh: Mesh, X, *, axis_name: str = "data"):
    """Inverse of :func:`sharded_dft` (matches ``jnp.fft.ifft``)."""
    X = jnp.asarray(X)
    return sharded_dft(mesh, X, sign=+1, axis_name=axis_name) / X.shape[-1]


@functools.lru_cache(maxsize=16)
def _dft_mats_planar(R1: int, R2: int, sign: int, f64: bool):
    dt = np.float64 if f64 else np.float32
    k1 = np.arange(R1)
    n2 = np.arange(R2)
    F1 = np.exp(sign * 2j * np.pi * np.outer(k1, k1) / R1)
    F2 = np.exp(sign * 2j * np.pi * np.outer(n2, n2) / R2)
    pl = lambda z: (np.ascontiguousarray(z.real, dt),
                    np.ascontiguousarray(z.imag, dt))
    return pl(F1), pl(F2)


@functools.lru_cache(maxsize=32)
def _sharded_dft_planar_fn(mesh: Mesh, N: int, sign: int, f64: bool,
                           axis_name: str, batch_rank: int, has_imag: bool):
    """PLANAR pencil DFT — the complex-free re-expression of
    :func:`_sharded_dft_fn` on ``(re, im)`` float planes (VERDICT r3 #3: the
    complex pipeline cannot run on runtimes whose complex64 support is
    absent, e.g. the tunneled axon TPU — exactly the runtime the planar
    single-chip stack serves).  Same three ``all_to_all`` + two MXU-DFT
    stages; every matmul/twiddle is a 4-real (or 2-real for real input)
    expansion of its complex counterpart."""
    D = mesh.shape[axis_name]
    R1, R2 = _split_for(N, D)
    A = R1 // D
    R2l = R2 // D
    (F1r, F1i), (F2r, F2i) = _dft_mats_planar(R1, R2, sign, f64)
    rdt = jnp.float64 if f64 else jnp.float32
    b = batch_rank

    def a2a(v, split, concat):
        return jax.lax.all_to_all(v, axis_name, split_axis=split,
                                  concat_axis=concat, tiled=True)

    def shard_fn(xr_loc, xi_loc):
        B = xr_loc.shape[:-1]
        Xr = a2a(xr_loc.reshape(B + (A, R2)).astype(rdt), b + 1, b)
        M1r = jnp.asarray(F1r)
        M1i = jnp.asarray(F1i)
        # HIGHEST matmul tier: DEFAULT lowers to single-pass bf16 on TPU,
        # which silently cost the whole pencil pipeline ~5e-3 accuracy
        # (caught by the round-5 blocked-vs-global chip comparison).
        em = functools.partial(jnp.einsum,
                               precision=jax.lax.Precision.HIGHEST)
        if has_imag:
            Xi = a2a(xi_loc.reshape(B + (A, R2)).astype(rdt), b + 1, b)
            Yr = (em("kn,...nj->...kj", M1r, Xr)
                  - em("kn,...nj->...kj", M1i, Xi))
            Yi = (em("kn,...nj->...kj", M1r, Xi)
                  + em("kn,...nj->...kj", M1i, Xr))
        else:
            Yr = em("kn,...nj->...kj", M1r, Xr)
            Yi = em("kn,...nj->...kj", M1i, Xr)
        # Twiddle e^{s·2πi·n2·k1/N} with GLOBAL n2 of my pencil — planar.
        d = jax.lax.axis_index(axis_name)
        n2g = (d * R2l + jnp.arange(R2l)).astype(rdt)
        k1 = jnp.arange(R1).astype(rdt)
        phase = (sign * 2 * jnp.pi / N) * jnp.outer(k1, n2g)
        c, s = jnp.cos(phase), jnp.sin(phase)
        Tr = Yr * c - Yi * s
        Ti = Yr * s + Yi * c
        Ur = a2a(Tr, b, b + 1)
        Ui = a2a(Ti, b, b + 1)
        M2r = jnp.asarray(F2r)
        M2i = jnp.asarray(F2i)
        Zr = (em("...kn,nj->...kj", Ur, M2r)
              - em("...kn,nj->...kj", Ui, M2i))
        Zi = (em("...kn,nj->...kj", Ur, M2i)
              + em("...kn,nj->...kj", Ui, M2r))
        Vr = a2a(Zr, b + 1, b)
        Vi = a2a(Zi, b + 1, b)
        out = lambda v: jnp.swapaxes(v, -1, -2).reshape(B + (R1 * R2l,))
        return out(Vr), out(Vi)

    spec = P(*([None] * b), axis_name)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,  # the twiddle uses axis_index (position-dependent)
    )
    return jax.jit(fn)


def sharded_dft_planar(mesh: Mesh, xr, xi=None, *, sign: int = -1,
                       axis_name: str = "data"):
    """:func:`sharded_dft` on PLANAR ``(re, im)`` planes — no complex dtype
    anywhere, so the exact sequence-parallel spectrum runs on complex-free
    runtimes (the production axon chip).  ``xi=None`` marks real input
    (halves stage 1's matmuls).  Returns ``(Xr, Xi)``, each sharded
    ``P(axis_name)`` in natural frequency order."""
    xr = jnp.asarray(xr)
    N = xr.shape[-1]
    f64 = xr.dtype == jnp.float64
    b = xr.ndim - 1
    has_imag = xi is not None
    fn = _sharded_dft_planar_fn(mesh, N, sign, f64, axis_name, b, has_imag)
    sh = NamedSharding(mesh, P(*([None] * b), axis_name))
    xr = jax.device_put(xr, sh)
    if has_imag:
        xi = jax.device_put(jnp.asarray(xi), sh)
    else:
        xi = xr  # ignored by the real-input branch; keeps one cached fn shape
    return fn(xr, xi)


def sharded_cwt_spectral_planar(mesh: Mesh, x, scales, dt: float, *, mother,
                                axis_name: str = "data"):
    """:func:`sharded_cwt_spectral` with NO complex dtype anywhere: planar
    pencil forward DFT → planar filter bank on each local frequency pencil →
    planar pencil inverse.  Equal to the complex pipeline to round-off;
    returns ``(wr, wi)``, each ``(S, N)`` time-sharded ``P(None, axis_name)``.
    This is the no-truncation sequence-parallel CWT that runs on the very
    runtime the planar single-chip stack was built for (VERDICT r3 #3)."""
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError("sharded_cwt_spectral_planar expects a 1-D signal")
    N = x.shape[-1]
    f64 = x.dtype == jnp.float64
    rdt = jnp.float64 if f64 else jnp.float32
    scales = jnp.asarray(scales, rdt)
    sr, si = sharded_dft_planar(mesh, x.astype(rdt), axis_name=axis_name)

    cconst = np.conj(complex(mother.psi_ft_const()))
    cr, ci = float(cconst.real), float(cconst.imag)

    def filt(sr_loc, si_loc, sj):
        Nl = sr_loc.shape[-1]
        d = jax.lax.axis_index(axis_name)
        k = d * Nl + jnp.arange(Nl)
        kf = jnp.where(k >= N // 2, k - N, k).astype(rdt)
        omega = (2 * jnp.pi / (N * dt)) * kf
        env = mother.psi_ft_envelope(sj[:, None] * omega[None, :]).astype(rdt)
        norm = jnp.sqrt(2 * jnp.pi * sj / dt).astype(rdt)
        br = (norm[:, None] * env) * cr        # bank planes (S, Nl)
        bi = (norm[:, None] * env) * ci
        yr = sr_loc[None, :] * br - si_loc[None, :] * bi
        yi = sr_loc[None, :] * bi + si_loc[None, :] * br
        return yr, yi

    Yr, Yi = shard_map(
        filt, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=(P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    )(sr, si, scales)
    wr, wi = sharded_dft_planar(mesh, Yr, Yi, sign=+1, axis_name=axis_name)
    return wr / N, wi / N


def sharded_cwt_spectral(mesh: Mesh, x, scales, dt: float, *, mother,
                         axis_name: str = "data"):
    """EXACT sequence-parallel CWT via the distributed FFT: the global
    spectrum of a time-sharded pow-2 signal, the per-scale filter bank
    applied to each device's local frequency pencil, and a batched
    distributed inverse.

    Unlike :func:`pycwt_tpu.ops.overlap.sharded_cwt_overlap_save` this has NO
    blocked-convolution truncation — every scale (including the near-Nyquist
    ones where overlap-save degrades to ~1e-2, see ``ops/overlap.py``) equals
    the single-device global transform to round-off.  The price is three
    ``all_to_all`` collectives per FFT instead of one ``ppermute`` halo.

    Returns ``(S, N)`` complex W, time-sharded ``P(None, axis_name)``; no
    device ever holds more than S·N/D samples.  ``N`` must be a pow-2
    (zero-pad upstream for other lengths — same semantics as the reference's
    pow-2 FFT padding, ``/root/reference/pycwt/helpers.py:27-30``).
    """
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError("sharded_cwt_spectral expects a 1-D signal")
    N = x.shape[-1]
    f64 = x.dtype == jnp.float64
    rdt = jnp.float64 if f64 else jnp.float32
    scales = jnp.asarray(scales, rdt)
    spec = sharded_dft(mesh, x, axis_name=axis_name)

    cconst = np.conj(complex(mother.psi_ft_const()))

    def filt(spec_loc, sj):
        Nl = spec_loc.shape[-1]
        d = jax.lax.axis_index(axis_name)
        k = d * Nl + jnp.arange(Nl)
        kf = jnp.where(k >= N // 2, k - N, k).astype(rdt)
        omega = (2 * jnp.pi / (N * dt)) * kf
        env = mother.psi_ft_envelope(sj[:, None] * omega[None, :]).astype(rdt)
        norm = jnp.sqrt(2 * jnp.pi * sj / dt).astype(rdt)
        bank = (norm[:, None] * env) * jnp.asarray(
            cconst, spec_loc.dtype)
        return spec_loc[None, :] * bank

    Y = shard_map(
        filt, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(None, axis_name),
        check_vma=False,
    )(spec, scales)
    return sharded_idft(mesh, Y, axis_name=axis_name)
