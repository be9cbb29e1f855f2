"""Multi-device sharding tests on an 8-device virtual CPU mesh (SURVEY §4.4):
the same computation on a 1-device and an 8-device mesh must agree to
float64 round-off, and with the unsharded reference cores exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import DEFAULT
from pycwt_tpu.parallel import (
    MeshSpec,
    make_mesh,
    sharded_cwt,
    sharded_mc_histogram,
    sharded_power_pipeline,
    sharded_wct,
)
from pycwt_tpu.parallel.sharded import pad_scales
from pycwt_tpu.transform import build_scale_grid, cwt_batch, icwt_batch
from tests.conftest import rel_err

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

N0 = 256
DT = 0.5
MOTHER = wt.Morlet(6)


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, N0))
    grid = build_scale_grid(N0, DT, dj=1 / 8)
    nfft = DEFAULT.fft_length(N0)
    return X, grid, nfft


@pytest.mark.parametrize("spec", [MeshSpec(data=8), MeshSpec(data=4, scale=2),
                                  MeshSpec(data=2, scale=2, mc=2)])
def test_sharded_cwt_matches_single_device(workload, spec):
    X, grid, nfft = workload
    mesh = make_mesh(spec)
    sj_pad, S = pad_scales(grid.sj, spec.scale)
    W_ref, _ = cwt_batch(jnp.asarray(X), jnp.asarray(grid.sj), DT,
                         mother=MOTHER, nfft=nfft)
    W_sh, _ = sharded_cwt(mesh, jnp.asarray(X), jnp.asarray(sj_pad), DT,
                          mother=MOTHER, nfft=nfft)
    assert rel_err(np.asarray(W_sh)[:, :S, :], np.asarray(W_ref)) < 1e-12


def test_sharded_power_pipeline(workload):
    X, grid, nfft = workload
    spec = MeshSpec(data=4, scale=2)
    mesh = make_mesh(spec)
    sj_pad, S = pad_scales(grid.sj, spec.scale)
    power, gws, iw, savg = sharded_power_pipeline(
        mesh, jnp.asarray(X), jnp.asarray(sj_pad), DT, grid.dj,
        mother=MOTHER, nfft=nfft, n_true_scales=S,
    )
    # Reference: unsharded equivalents
    Xn = (X - X.mean(1, keepdims=True)) / X.std(1, keepdims=True)
    W_ref, _ = cwt_batch(jnp.asarray(Xn), jnp.asarray(grid.sj), DT,
                         mother=MOTHER, nfft=nfft)
    p_ref = np.abs(np.asarray(W_ref)) ** 2
    assert rel_err(np.asarray(power)[:, :S, :], p_ref) < 1e-11
    assert rel_err(np.asarray(gws)[:, :S], p_ref.mean(-1)) < 1e-11
    iw_ref = np.asarray(icwt_batch(W_ref, jnp.asarray(grid.sj), DT, grid.dj,
                                   mother=MOTHER))
    assert rel_err(np.asarray(iw), iw_ref) < 1e-10
    savg_ref = (grid.dj * DT / MOTHER.cdelta) * (
        p_ref / grid.sj[None, :, None]).sum(1)
    assert rel_err(np.asarray(savg), savg_ref) < 1e-10


def test_sharded_wct_matches_host(workload):
    X, grid, nfft = workload
    mesh = make_mesh(MeshSpec(data=8))
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((8, N0))
    from pycwt_tpu.coherence import _wct_core

    R_ref, _, _ = _wct_core(jnp.asarray(X), jnp.asarray(Y),
                            jnp.asarray(grid.sj), DT, mother=MOTHER,
                            nfft=nfft, dj=grid.dj)
    R_sh, _, _ = sharded_wct(mesh, jnp.asarray(X), jnp.asarray(Y),
                             grid.sj, DT, grid.dj, mother=MOTHER, nfft=nfft)
    assert rel_err(np.asarray(R_sh), np.asarray(R_ref)) < 1e-11


@pytest.mark.parametrize("spec", [MeshSpec(data=2, scale=4),
                                  MeshSpec(data=4, scale=2),
                                  MeshSpec(scale=8)])
def test_sharded_wct_scale_sharded_matches_host(workload, spec):
    """Scale-SHARDED WCT (ppermute halo boxcar) == replicated result to 1e-11
    (VERDICT r1 item 2).  The boxcar window for dj=1/8 is round(0.6/dj·2)=10
    taps → 5/4 halo rows exchanged across scale-block boundaries."""
    X, grid, nfft = workload
    mesh = make_mesh(spec)
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((8, N0))
    from pycwt_tpu.coherence import _wct_core

    sj_pad, S = pad_scales(grid.sj, spec.scale)
    R_ref, a_ref, W12_ref = _wct_core(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(grid.sj), DT,
        mother=MOTHER, nfft=nfft, dj=grid.dj)
    R_sh, a_sh, W12_sh = sharded_wct(
        mesh, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(sj_pad), DT,
        grid.dj, mother=MOTHER, nfft=nfft, n_true_scales=S)
    assert rel_err(np.asarray(R_sh)[:, :S], np.asarray(R_ref)) < 1e-11
    assert rel_err(np.asarray(W12_sh)[:, :S], np.asarray(W12_ref)) < 1e-11
    assert np.abs(np.asarray(a_sh)[:, :S] - np.asarray(a_ref)).max() < 1e-11


def test_sharded_mc_histogram_psum(workload):
    """8-way mc-sharded histogram == sum of the 8 per-shard histograms,
    and total counts == batch × (#outside-COI samples)."""
    _, grid, nfft = workload
    spec = MeshSpec(mc=8)
    mesh = make_mesh(spec)
    n = N0
    coi = np.linspace(0, 20, n)
    period = 1.0 / grid.freqs
    outsidecoi = period[:, None] <= coi[None, :]
    key = jax.random.PRNGKey(0)
    hist = sharded_mc_histogram(
        mesh, key, jnp.asarray(grid.sj), outsidecoi, DT, mother=MOTHER,
        nfft=nfft, dj=grid.dj, per_device_batch=2, n=n, al1=0.5, al2=0.6,
    )
    hist = np.asarray(hist)
    assert hist.shape == (len(grid.sj), 1000)
    total = hist.sum()
    expected = 8 * 2 * outsidecoi.sum()
    assert total == expected, (total, expected)


def test_mc_histogram_cross_mesh_determinism(workload):
    """Same (seed, total mc count) ⇒ bit-identical histogram for ANY
    factorization: 8-device mc mesh, 2-device mc mesh, and the single-device
    chunked host loop all key surrogate streams by global ensemble index
    (VERDICT r1 item 10)."""
    from pycwt_tpu.coherence import _mc_histogram_chunk

    _, grid, nfft = workload
    n = N0
    coi = np.linspace(0, 20, n)
    period = 1.0 / grid.freqs
    outsidecoi = period[:, None] <= coi[None, :]
    key = jax.random.PRNGKey(5)
    kw = dict(dt=DT, mother=MOTHER, nfft=nfft, dj=grid.dj, n=n,
              al1=0.5, al2=0.6)

    h8 = np.asarray(sharded_mc_histogram(
        make_mesh(MeshSpec(mc=8)), key, jnp.asarray(grid.sj), outsidecoi,
        per_device_batch=2, **kw))
    h2 = np.asarray(sharded_mc_histogram(
        make_mesh(MeshSpec(data=4, mc=2)), key, jnp.asarray(grid.sj),
        outsidecoi, per_device_batch=8, **kw))
    # Host loop: two chunks of 8 starting at global indices 0 and 8.
    oc = jnp.asarray(outsidecoi)
    h_host = sum(
        np.asarray(_mc_histogram_chunk(
            key, jnp.int32(start), jnp.asarray(grid.sj), oc, DT,
            mother=MOTHER, nfft=nfft, dj=grid.dj, batch=8, n=n,
            al1=0.5, al2=0.6))
        for start in (0, 8)
    )
    np.testing.assert_array_equal(h8, h2)
    np.testing.assert_array_equal(h8, h_host)


def test_sharded_wct_pairs_equals_host():
    """B pairs data-parallel over an 8-device mesh == unsharded wct_pairs."""
    from pycwt_tpu.parallel.mesh import MeshSpec, make_mesh
    from pycwt_tpu.parallel.sharded import sharded_wct_pairs
    from pycwt_tpu.transform import build_scale_grid

    rng = np.random.default_rng(17)
    B, N = 8, 256
    y1 = rng.standard_normal((B, N))
    y2 = 0.5 * y1 + rng.standard_normal((B, N))
    mother = wt.Morlet(6)
    grid = build_scale_grid(N, 1.0, dj=1 / 6, mother=mother)
    mesh = make_mesh(MeshSpec(data=8))
    Wsh, ash = sharded_wct_pairs(mesh, y1, y2, grid.sj, 1.0, 1 / 6,
                                 mother=mother, nfft=256)
    Wref, aref, _, _ = wt.wct_pairs(y1, y2, 1.0, dj=1 / 6, s0=grid.sj[0],
                                    J=len(grid.sj) - 1)
    np.testing.assert_allclose(np.asarray(Wsh), Wref, rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ash), aref, rtol=0, atol=1e-10)


def test_sharded_wct_matrix_equals_single_device(workload):
    """Pair-axis-sharded all-pairs coherence == the 1-device wct_matrix core
    (signals replicated, pair list sharded, amortization per chip)."""
    from pycwt_tpu.coherence import wct_matrix
    from pycwt_tpu.parallel import sharded_wct_matrix

    X, grid, nfft = workload
    B = 8
    # 16 pairs = 8 devices x block 2
    pairs = np.array([(i, (i + k) % B) for k in (1, 2) for i in range(B)],
                     np.int32)
    mesh = make_mesh(MeshSpec(data=8))
    R_sh, a_sh = sharded_wct_matrix(
        mesh, jnp.asarray(X, jnp.float32), pairs,
        jnp.asarray(grid.sj, jnp.float32), DT, 1 / 8, mother=MOTHER,
        nfft=nfft, block=2)
    R_ref, a_ref, _, _, _ = wct_matrix(X, DT, dj=1 / 8, pairs=pairs)
    assert {s.data.shape[0] for s in R_sh.addressable_shards} == {2}
    np.testing.assert_allclose(np.asarray(R_sh), R_ref, rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(a_sh), a_ref, rtol=0, atol=5e-5)


def test_sharded_wct_matrix_rejects_ragged_pairs(workload):
    from pycwt_tpu.parallel import sharded_wct_matrix

    X, grid, nfft = workload
    mesh = make_mesh(MeshSpec(data=8))
    with pytest.raises(ValueError, match="divisible"):
        sharded_wct_matrix(mesh, jnp.asarray(X, jnp.float32),
                           np.zeros((10, 2), np.int32),
                           jnp.asarray(grid.sj, jnp.float32), DT, 1 / 8,
                           mother=MOTHER, nfft=nfft, block=2)


def test_sharded_mc_histogram_pairs_matches_single_device(workload):
    """The pair-sharded batched-null MC (8 nulls over an 8-device 'mc' axis)
    is BIT-identical to the single-device fused run over the same slots:
    member streams are keyed by (hash slot, global member index), never by
    device or position (round-5 surface)."""
    from pycwt_tpu.coherence import _mc_histogram_run_pairs
    from pycwt_tpu.parallel import sharded_mc_histogram_pairs

    _, grid, nfft = workload
    n = N0
    coi = np.linspace(0, 20, n)
    period = 1.0 / grid.freqs
    outsidecoi = period[:, None] <= coi[None, :]
    key = jax.random.PRNGKey(9)
    slots = np.asarray([11, 5003, 7, 123457, 42, 9999, 31337, 2], np.int64)
    g1 = np.linspace(0.1, 0.8, 8)
    g2 = np.linspace(0.7, 0.05, 8)
    kw = dict(mother=MOTHER, nfft=nfft, dj=grid.dj, batch=3, nchunks=2,
              n=n, tau=64)

    mesh = make_mesh(MeshSpec(mc=8))
    sharded = np.asarray(sharded_mc_histogram_pairs(
        mesh, key, jnp.asarray(grid.sj), outsidecoi, slots, g1, g2, 5, DT,
        **kw))
    single = np.asarray(_mc_histogram_run_pairs(
        key, jnp.asarray(grid.sj), jnp.asarray(outsidecoi),
        jnp.asarray(slots), jnp.asarray(g1), jnp.asarray(g2),
        jnp.asarray(5, jnp.int32), DT, **kw))
    assert sharded.shape == single.shape == (8, len(grid.sj), 1000)
    np.testing.assert_array_equal(sharded, single)
    # Exact-count masking holds in the sharded form too: 5 members of the
    # 6 drawn (2 chunks x batch 3) are histogrammed per null.
    np.testing.assert_allclose(sharded.sum(axis=(1, 2)),
                               5 * outsidecoi.sum())


def test_sharded_mc_histogram_pairs_rejects_indivisible():
    from pycwt_tpu.parallel import sharded_mc_histogram_pairs

    mesh = make_mesh(MeshSpec(mc=8))
    with pytest.raises(ValueError, match="divide"):
        sharded_mc_histogram_pairs(
            mesh, jax.random.PRNGKey(0), jnp.zeros(4), np.ones((4, 8), bool),
            np.arange(3), np.zeros(3), np.zeros(3), 5, 1.0,
            mother=MOTHER, nfft=8, dj=0.25, batch=2, nchunks=1, n=8, tau=0)


def test_wct_significance_batch_mesh_equals_single_device():
    """The user surface with mesh= spreads distinct nulls over devices and
    returns bit-identical curves to the single-device run (chunking and
    device placement never enter the member streams)."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=10, progress=False,
              cache=False, seed=4)
    al1 = [0.2, 0.45, 0.6, 0.7, 0.15]
    al2 = [0.3, 0.5, 0.25, 0.6, 0.4]
    single = wct_significance_batch(al1, al2, mc_batch=5, **kw)
    mesh = make_mesh(MeshSpec(mc=8))
    sharded = wct_significance_batch(al1, al2, mesh=mesh, **kw)
    np.testing.assert_array_equal(single, sharded)
