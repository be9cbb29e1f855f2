"""Overlap-save long-signal CWT: interior parity with the global transform,
streaming (lax.scan) memory bounds, and the time-sharded ppermute variant."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import next_pow2
from pycwt_tpu.ops.overlap import (
    cwt_overlap_save,
    halo_samples,
    sharded_cwt_overlap_save,
    streamed_global_power,
)
from pycwt_tpu.transform import build_scale_grid, cwt_batch


def test_halo_sizing():
    assert halo_samples(10.0, 1.0) == int(np.ceil(np.sqrt(-2 * np.log(1e-7)) * 10))
    assert halo_samples(10.0, 0.5) == 2 * halo_samples(10.0, 1.0)


def test_overlap_save_interior_matches_global():
    rng = np.random.default_rng(0)
    N = 4096
    x = rng.standard_normal(N)
    dt = 1.0
    grid = build_scale_grid(N, dt, dj=0.5, s0=2.0, J=8)  # s_max = 2·2^4 = 32
    scales = np.asarray(grid.sj)

    W_global, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(scales), dt,
                            mother=wt.Morlet(6), nfft=next_pow2(N))
    W_global = np.asarray(W_global[0])

    W_blocked = np.asarray(cwt_overlap_save(x, scales, dt, mother=wt.Morlet(6),
                                            chunk=1024))
    assert W_blocked.shape == W_global.shape

    H = halo_samples(scales.max(), dt)
    interior = slice(H, N - H)
    err = np.abs(W_blocked[:, interior] - W_global[:, interior])
    # Scales clear of Nyquist (s >= 4dt): round-off parity.  Near-Nyquist
    # scales carry O(ψ̂(s·π/dt)) discretization ringing (see module docstring).
    for i, s in enumerate(scales):
        rel = err[i].max() / np.abs(W_global[i]).max()
        if s >= 4 * dt:
            assert rel < 1e-6, (s, rel)
        else:
            nyq = float(np.exp(-0.5 * (s * np.pi / dt - 6.0) ** 2))
            assert rel < max(10 * nyq, 1e-6), (s, rel, nyq)


def test_streamed_global_power_matches_full_transform():
    """Peak-memory-∝-chunk global spectrum == Σ_t |W|² of the streamed full
    transform on the interior-dominated workload (VERDICT r1 item 3)."""
    rng = np.random.default_rng(3)
    N = 4096
    x = rng.standard_normal(N)
    dt = 1.0
    grid = build_scale_grid(N, dt, dj=0.5, s0=4.0, J=6)  # all scales ≥ 4dt
    scales = np.asarray(grid.sj)

    W_blocked = np.asarray(cwt_overlap_save(x, scales, dt, mother=wt.Morlet(6),
                                            chunk=1024))
    p_stream = np.asarray(streamed_global_power(x, scales, dt,
                                                mother=wt.Morlet(6), chunk=1024))
    p_full = (np.abs(W_blocked) ** 2).sum(-1)
    np.testing.assert_allclose(p_stream, p_full, rtol=1e-10)

    # And against the global-FFT transform.  N is pow-2 here so the global
    # path is a CIRCULAR convolution (no zero pad); blocked edges zero-pad —
    # the ~2H edge samples differ by construction, bounding total power to a
    # few percent.  Interior samples agree to round-off (test above).
    W_global, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(scales), dt,
                            mother=wt.Morlet(6), nfft=next_pow2(N))
    p_global = (np.abs(np.asarray(W_global[0])) ** 2).sum(-1)
    np.testing.assert_allclose(p_stream, p_global, rtol=0.05)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_overlap_save_matches_single_device():
    """Time-axis sharded (ppermute halo) overlap-save == the single-device
    scan exactly — same chunking, same zero-pad edges."""
    from pycwt_tpu.parallel import MeshSpec, make_mesh

    rng = np.random.default_rng(4)
    N = 8192
    x = rng.standard_normal(N)
    dt = 1.0
    grid = build_scale_grid(N, dt, dj=0.5, s0=2.0, J=8)
    scales = np.asarray(grid.sj)
    mesh = make_mesh(MeshSpec(data=8))

    W_sh = np.asarray(sharded_cwt_overlap_save(
        mesh, x, scales, dt, mother=wt.Morlet(6), chunk=512))
    W_1 = np.asarray(cwt_overlap_save(x, scales, dt, mother=wt.Morlet(6),
                                      chunk=512))
    assert W_sh.shape == W_1.shape
    np.testing.assert_allclose(W_sh, W_1, rtol=0, atol=1e-12)


def test_sharded_overlap_save_validations():
    from pycwt_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8))
    x = np.zeros(1000)  # not divisible by 8 evenly into chunks
    grid = build_scale_grid(1000, 1.0, dj=0.5, s0=2.0, J=4)
    with pytest.raises(ValueError):
        sharded_cwt_overlap_save(mesh, x, grid.sj, 1.0, mother=wt.Morlet(6),
                                 chunk=512)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_overlap_save_auto_pad():
    """auto_pad zero-pads a non-divisible N and trims — equal to the
    single-device scan on the same signal."""
    from pycwt_tpu.parallel import MeshSpec, make_mesh

    rng = np.random.default_rng(7)
    N = 5000  # not a multiple of 8·512
    x = rng.standard_normal(N)
    grid = build_scale_grid(N, 1.0, dj=0.5, s0=2.0, J=6)
    mesh = make_mesh(MeshSpec(data=8))
    W_sh = np.asarray(sharded_cwt_overlap_save(
        mesh, x, grid.sj, 1.0, mother=wt.Morlet(6), chunk=512, auto_pad=True))
    assert W_sh.shape == (len(grid.sj), N)
    W_1 = np.asarray(cwt_overlap_save(np.pad(x, (0, 8 * 512 * 2 - N)),
                                      grid.sj, 1.0, mother=wt.Morlet(6),
                                      chunk=512))[:, :N]
    np.testing.assert_allclose(W_sh, W_1, rtol=0, atol=1e-12)


def test_overlap_save_short_signal_passthrough():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(500)
    grid = build_scale_grid(500, 1.0, dj=0.5)
    W = np.asarray(cwt_overlap_save(x, grid.sj, 1.0, mother=wt.Morlet(6),
                                    chunk=1 << 18))
    W_ref, _ = cwt_batch(jnp.asarray(x)[None], jnp.asarray(grid.sj), 1.0,
                         mother=wt.Morlet(6), nfft=next_pow2(500))
    np.testing.assert_allclose(W, np.asarray(W_ref[0]), rtol=0, atol=1e-12)


def test_overlap_near_nyquist_warns():
    """A scale grid starting at the TC98 default s0=2dt/lambda must trigger
    the near-Nyquist warning; a coarse grid (s >= 4dt) must not."""
    import warnings

    import pytest

    from pycwt_tpu.ops.overlap import cwt_overlap_save

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(512))
    fine = jnp.asarray([0.5, 2.0, 8.0])    # 0.5 = 2dt/lambda-ish
    with pytest.warns(UserWarning, match="Nyquist"):
        cwt_overlap_save(x, fine, 1.0, mother=wt.Morlet(6), chunk=256)
    coarse = jnp.asarray([8.0, 16.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cwt_overlap_save(x, coarse, 1.0, mother=wt.Morlet(6), chunk=256)


def test_overlap_planar_matches_complex_overlap():
    """The complex-free planar overlap-save (the chip-measurable variant)
    equals the complex surface to f32 round-off on interior samples, and
    the planar streamed power equals the full-W power sum."""
    from pycwt_tpu.ops.overlap import (cwt_overlap_save,
                                       cwt_overlap_save_planar,
                                       streamed_global_power_planar)

    rng = np.random.default_rng(9)
    N = 4096
    x = rng.standard_normal(N).astype(np.float32)
    scales = jnp.asarray([8.0, 16.0, 32.0], jnp.float32)
    W = np.asarray(cwt_overlap_save(jnp.asarray(x), scales, 1.0,
                                    mother=wt.Morlet(6), chunk=1024))
    wr, wi = cwt_overlap_save_planar(x, scales, 1.0, mother=wt.Morlet(6),
                                     chunk=1024)
    Wp = np.asarray(wr) + 1j * np.asarray(wi)
    assert Wp.shape == W.shape
    scale = np.abs(W).max()
    assert np.abs(Wp - W).max() < 2e-5 * scale

    pw = np.asarray(streamed_global_power_planar(
        x, scales, 1.0, mother=wt.Morlet(6), chunk=1024))
    ref = (np.abs(W) ** 2).sum(axis=-1)
    np.testing.assert_allclose(pw, ref, rtol=3e-5)


def test_overlap_planar_short_signal_passthrough():
    from pycwt_tpu.ops.overlap import cwt_overlap_save_planar

    rng = np.random.default_rng(11)
    x = rng.standard_normal(500).astype(np.float32)
    scales = jnp.asarray([8.0, 16.0], jnp.float32)
    wr, wi = cwt_overlap_save_planar(x, scales, 1.0, mother=wt.Morlet(6),
                                     chunk=1 << 18)
    W_ref, _ = cwt_batch(jnp.asarray(x, jnp.float32)[None], scales, 1.0,
                         mother=wt.Morlet(6), nfft=512)
    W_ref = np.asarray(W_ref[0])
    got = np.asarray(wr) + 1j * np.asarray(wi)
    assert got.shape == W_ref.shape  # trimmed to N like the complex surface
    assert np.abs(got - W_ref).max() < 2e-5 * np.abs(W_ref).max()


def test_wct_overlap_planar_matches_global_core():
    """Blocked long-signal COHERENCE (round 5): each chunk's interior WCT
    equals the global planar coherence core to f32 round-off for s >= 4dt
    (the composed wavelet+smoothing halo contract)."""
    from pycwt_tpu.coherence import _wct_core
    from pycwt_tpu.ops.overlap import halo_samples, wct_overlap_planar

    rng = np.random.default_rng(21)
    N = 4096
    y1 = rng.standard_normal(N)
    y2 = 0.5 * y1 + rng.standard_normal(N)
    scales = jnp.asarray([8.0, 16.0, 32.0], jnp.float32)
    dj = 0.5
    R, A = wct_overlap_planar(y1, y2, scales, 1.0, mother=wt.Morlet(6),
                              dj=dj, chunk=1024)
    assert R.shape == (3, N)

    y1n = (y1 - y1.mean()) / y1.std()
    y2n = (y2 - y2.mean()) / y2.std()
    Rg, Ag, _ = _wct_core(
        jnp.asarray(y1n, jnp.float32)[None], jnp.asarray(y2n, jnp.float32)[None],
        scales, 1.0, mother=wt.Morlet(6), nfft=N, dj=dj, engine="planar")
    Rg, Ag = np.asarray(Rg[0]), np.asarray(Ag[0])
    H = 2 * halo_samples(32.0, 1.0)
    sl = slice(H, N - H)
    np.testing.assert_allclose(np.asarray(R)[:, sl], Rg[:, sl],
                               rtol=0, atol=2e-4)
    dphi = np.angle(np.exp(1j * (np.asarray(A)[:, sl] - Ag[:, sl])))
    # Phase compared where coherence is meaningful (angle of a near-zero
    # cross spectrum is noise in any formulation).
    m = Rg[:, sl] > 0.2
    assert np.abs(dphi[m]).max() < 2e-3


def test_wct_overlap_planar_validates_inputs():
    from pycwt_tpu.ops.overlap import wct_overlap_planar

    with pytest.raises(ValueError, match="matching 1-D"):
        wct_overlap_planar(np.zeros(100), np.zeros(50), jnp.asarray([8.0]),
                           1.0, mother=wt.Morlet(6), dj=0.5)


def test_sharded_wct_overlap_matches_single_device():
    """Time-sharded blocked coherence: every shard of the 8-device run
    equals the single-device wct_overlap_planar (P3 symmetry — the
    sequence-parallel coherence surface, round 5)."""
    from pycwt_tpu.ops.overlap import (sharded_wct_overlap_planar,
                                       wct_overlap_planar)
    from pycwt_tpu.parallel import MeshSpec, make_mesh

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(31)
    N = 8 * 1024
    y1 = rng.standard_normal(N).astype(np.float32)
    y2 = (0.5 * y1 + rng.standard_normal(N)).astype(np.float32)
    scales = jnp.asarray([8.0, 16.0, 32.0], jnp.float32)
    mesh = make_mesh(MeshSpec(data=8))
    Rs, As = sharded_wct_overlap_planar(mesh, y1, y2, scales, 1.0,
                                        mother=wt.Morlet(6), dj=0.5,
                                        chunk=1024)
    R1, A1 = wct_overlap_planar(y1, y2, scales, 1.0, mother=wt.Morlet(6),
                                dj=0.5, chunk=1024)
    np.testing.assert_allclose(np.asarray(Rs), np.asarray(R1), rtol=0,
                               atol=1e-5)
    dphi = np.angle(np.exp(1j * (np.asarray(As) - np.asarray(A1))))
    m = np.asarray(R1) > 0.2
    assert np.abs(dphi[m]).max() < 1e-4


def test_sharded_wct_overlap_validates():
    from pycwt_tpu.ops.overlap import sharded_wct_overlap_planar
    from pycwt_tpu.parallel import MeshSpec, make_mesh

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshSpec(data=8))
    with pytest.raises(ValueError, match="divisible"):
        sharded_wct_overlap_planar(mesh, np.zeros(1001), np.zeros(1001),
                                   jnp.asarray([8.0]), 1.0,
                                   mother=wt.Morlet(6), dj=0.5)


def test_xwt_overlap_planar_matches_global():
    """Blocked long-signal XWT: interiors equal the global planar cross
    spectrum to f32 round-off for s >= 4dt."""
    from pycwt_tpu.ops.overlap import halo_samples, xwt_overlap_planar

    rng = np.random.default_rng(23)
    N = 4096
    y1 = rng.standard_normal(N)
    y2 = 0.5 * y1 + rng.standard_normal(N)
    scales = jnp.asarray([8.0, 16.0, 32.0], jnp.float32)
    M, A = xwt_overlap_planar(y1, y2, scales, 1.0, mother=wt.Morlet(6),
                              chunk=1024)
    y1n = (y1 - y1.mean()) / y1.std()
    y2n = (y2 - y2.mean()) / y2.std()
    W1, _ = cwt_batch(jnp.asarray(y1n, jnp.float32)[None], scales, 1.0,
                      mother=wt.Morlet(6), nfft=N)
    W2, _ = cwt_batch(jnp.asarray(y2n, jnp.float32)[None], scales, 1.0,
                      mother=wt.Morlet(6), nfft=N)
    W12 = np.asarray(W1[0]) * np.conj(np.asarray(W2[0]))
    H = halo_samples(32.0, 1.0)
    sl = slice(H, N - H)
    ref = np.abs(W12)
    scale = ref.max()
    np.testing.assert_allclose(np.asarray(M)[:, sl], ref[:, sl],
                               rtol=0, atol=3e-5 * scale)
    m = ref[:, sl] > 1e-3 * scale
    dphi = np.angle(np.exp(1j * (np.asarray(A)[:, sl]
                                 - np.angle(W12)[:, sl])))
    assert np.abs(dphi[m]).max() < 2e-3


def test_icwt_planar_reconstructs_from_blocked_w():
    """End-to-end long-signal round trip with NO complex dtype: blocked
    planar CWT -> on-device planar inverse reconstructs the signal (same
    SNR contract as the complex icwt path)."""
    from pycwt_tpu.ops.overlap import cwt_overlap_save_planar
    from pycwt_tpu.transform import icwt_batch, icwt_planar

    rng = np.random.default_rng(17)
    N = 4096
    x = rng.standard_normal(N).astype(np.float32)
    grid = build_scale_grid(N, 1.0, dj=0.25, s0=2.0, J=24)
    scales = jnp.asarray(grid.sj, jnp.float32)
    wr, wi = cwt_overlap_save_planar(x, scales, 1.0, mother=wt.Morlet(6),
                                     chunk=1024)
    iw = np.asarray(icwt_planar(wr, scales, 1.0, 0.25, mother=wt.Morlet(6)))
    # Equals the complex inverse of the same planes exactly...
    W = jnp.asarray(np.asarray(wr) + 1j * np.asarray(wi))
    iw_c = np.asarray(icwt_batch(W, scales, 1.0, 0.25, mother=wt.Morlet(6)))
    np.testing.assert_allclose(iw, iw_c, rtol=0, atol=1e-6)
    # ...and reconstructs the signal (TC98 truncated-grid fidelity).
    sl = slice(512, N - 512)
    corr = np.corrcoef(iw[sl], x[sl])[0, 1]
    assert corr > 0.85, corr
