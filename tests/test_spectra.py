"""Parseval global-spectrum shortcut vs the full transform."""
import numpy as np
import pytest

import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import next_pow2
from pycwt_tpu.ops.spectra import global_power_parseval
from pycwt_tpu.transform import build_scale_grid, cwt_batch
from tests.conftest import rel_err


@pytest.mark.parametrize("mother", [wt.Morlet(6), wt.Paul(4), wt.DOG(2)],
                         ids=lambda m: m.name)
def test_parseval_exact_when_unpadded(mother):
    rng = np.random.default_rng(0)
    N = 1024  # pow-2: nfft == N, identity is exact
    X = rng.standard_normal((3, N))
    grid = build_scale_grid(N, 1.0, dj=0.5, s0=2.0, J=7)
    W, _ = cwt_batch(jnp.asarray(X), jnp.asarray(grid.sj), 1.0,
                     mother=mother, nfft=N)
    ref = (np.abs(np.asarray(W)) ** 2).sum(-1)
    fast = np.asarray(global_power_parseval(
        jnp.asarray(X), jnp.asarray(grid.sj), dt=1.0, mother=mother, nfft=N))
    assert rel_err(fast, ref) < 1e-10


def test_parseval_padded_close():
    """With zero padding the identity includes pad-region (edge-wrap) power —
    small relative to the total for interior-supported signals."""
    rng = np.random.default_rng(1)
    N = 700
    nfft = next_pow2(N)
    X = rng.standard_normal((2, N))
    grid = build_scale_grid(N, 1.0, dj=0.5, s0=2.0, J=6)
    W, _ = cwt_batch(jnp.asarray(X), jnp.asarray(grid.sj), 1.0,
                     mother=wt.Morlet(6), nfft=nfft)
    ref = (np.abs(np.asarray(W)) ** 2).sum(-1)  # trimmed to N
    fast = np.asarray(global_power_parseval(
        jnp.asarray(X), jnp.asarray(grid.sj), dt=1.0, mother=wt.Morlet(6),
        nfft=nfft))
    # fast includes the pad region: always >= trimmed, within ~20%
    assert np.all(fast >= ref - 1e-9)
    assert np.abs(fast - ref).max() / ref.max() < 0.2


def test_analysis_global_spectrum_matches_full_pipeline():
    """analysis.global_spectrum (Parseval fast path, no iFFT) matches the full
    cwt_analysis global spectrum on a pow-2 workload."""
    import pycwt_tpu as wt
    from pycwt_tpu.analysis import cwt_analysis, global_spectrum

    rng = np.random.default_rng(8)
    x = np.cumsum(rng.standard_normal(512))
    gws, sj, freqs = global_spectrum(x, 1.0, dj=1 / 6)
    full = cwt_analysis(x, 1.0, dj=1 / 6)
    np.testing.assert_allclose(gws, full.global_power, rtol=1e-10)
    np.testing.assert_allclose(sj, full.scales, rtol=1e-12)


def test_global_spectrum_exact_trim_matches_materialized():
    """exact_trim=True reproduces the reference demo's trimmed time-mean
    exactly for non-pow-2 signals (ADVICE r2: the Parseval fast path counts
    zero-pad tail energy the demo excludes)."""
    import pycwt_tpu as wt
    from pycwt_tpu.analysis import global_spectrum

    rng = np.random.default_rng(8)
    x = np.cumsum(rng.standard_normal(300))  # non-pow-2 → nfft=512 padding
    gws_t, sj, _ = global_spectrum(x, 1.0, dj=1 / 6, exact_trim=True)
    # materialized reference
    W, sj2, freqs, coi, _, _ = wt.cwt((x - x.mean()) / x.std(), 1.0, dj=1 / 6)
    ref = (np.abs(W) ** 2).mean(-1) * x.std() ** 2
    np.testing.assert_allclose(gws_t, ref, rtol=1e-10)
    # and the fast path is close but not identical (documented deviation)
    gws_f, _, _ = global_spectrum(x, 1.0, dj=1 / 6)
    assert not np.allclose(gws_f, ref, rtol=1e-10)
    # the deviation is concentrated at large scales (COI-masked edge energy);
    # the smallest scales agree tightly
    np.testing.assert_allclose(gws_f[:10], ref[:10], rtol=2e-2)
