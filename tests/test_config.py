"""Padding-policy / dtype-policy config tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import CWTConfig, DEFAULT, next_pow2, round_half_even
from pycwt_tpu.transform import build_scale_grid, cwt_batch
from tests.conftest import rel_err


def test_fft_length_policy():
    assert DEFAULT.fft_length(504) == 512
    assert DEFAULT.fft_length(512) == 512
    assert DEFAULT.fft_length(513) == 1024
    nopad = CWTConfig(pad_pow2=False)
    assert nopad.fft_length(504) == 504  # the pyfftw no-padding path


def test_round_half_even_matches_numpy():
    for x in [0.5, 1.5, 2.5, 3.49999, 101.5, 96.5, 7.5000001, -0.0]:
        assert round_half_even(x) == int(np.round(x)), x


def test_unpadded_cwt_close_to_padded():
    """No-padding policy gives the same transform away from the edges (the
    circular-wrap region differs, inside the COI)."""
    rng = np.random.default_rng(0)
    N = 504
    x = rng.standard_normal(N)
    # scales >= 4dt: clear of the near-Nyquist ringing (see ops/overlap.py)
    grid = build_scale_grid(N, 0.25, dj=0.5, s0=1.0, J=5)
    Wp, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(grid.sj), 0.25,
                      mother=wt.Morlet(6), nfft=next_pow2(N))
    Wn, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(grid.sj), 0.25,
                      mother=wt.Morlet(6), nfft=N)
    Wp, Wn = np.asarray(Wp[0]), np.asarray(Wn[0])
    mid = slice(N // 4, 3 * N // 4)
    assert rel_err(Wn[:, mid], Wp[:, mid]) < 1e-5


def test_dtype_policy_follows_x64():
    assert DEFAULT.real_dtype == jnp.float64  # conftest enables x64
    assert DEFAULT.complex_dtype == jnp.complex128
    f32cfg = CWTConfig(dtype=jnp.float32)
    assert f32cfg.complex_dtype == jnp.complex64


def test_precision_ladder_validation():
    """CWTConfig.precision: three-tier ladder, validated at construction;
    default is the measured-invisible 'high' (bf16x2) tier (BASELINE.md)."""
    assert DEFAULT.precision == "high"
    for tier in ("highest", "high", "fast"):
        assert CWTConfig(precision=tier).precision == tier
    with pytest.raises(ValueError):
        CWTConfig(precision="exact")
