"""Monte-Carlo WCT significance: distributional parity with the reference's
fixed-seed 300-surrogate curve, determinism, and the disk-cache contract.

Bitwise parity with the reference is impossible (it uses the global numpy RNG,
``helpers.py:170``); BASELINE.json asks for distributional agreement of the
300-surrogate significance curves.
"""
import os

import numpy as np
import pytest

import pycwt_tpu as wt
from pycwt_tpu.coherence import wct_significance


@pytest.fixture(scope="module")
def sig_inputs(request):
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "wct_sig_jao_jbaltic.npz"))
    return g


def test_mc_distributional_parity(sig_inputs):
    g = sig_inputs
    sig95 = wct_significance(float(g["al1"]), float(g["al2"]),
                             dt=float(g["dt"]), dj=float(g["dj"]),
                             s0=float(g["s0"]), J=int(g["J"]),
                             mc_count=300, progress=False, cache=False,
                             seed=7)
    ref = g["sig95"]
    assert sig95.shape == ref.shape
    # NaN/zero structure must match exactly (COI bookkeeping).
    assert np.array_equal(np.isnan(sig95), np.isnan(ref))
    assert np.array_equal(sig95 == 0, ref == 0)
    valid = np.isfinite(ref) & (ref != 0)
    diff = np.abs(sig95[valid] - ref[valid])
    # 95th-percentile-of-coherence curves from two independent 300-sample
    # ensembles: allow a modest MC tolerance band.
    assert diff.max() < 0.06, f"max |Δsig95| = {diff.max():.4f}"
    assert diff.mean() < 0.02, f"mean |Δsig95| = {diff.mean():.4f}"


def test_mc_deterministic_given_seed(sig_inputs):
    g = sig_inputs
    kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
              J=int(g["J"]), mc_count=20, progress=False, cache=False, seed=3)
    a = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    b = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    np.testing.assert_array_equal(a, b)


def test_mc_cache_roundtrip(sig_inputs, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    g = sig_inputs
    kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
              J=int(g["J"]), mc_count=10, progress=False, cache=True, seed=0)
    a = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name.startswith("wct_sig_")
    b = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    out = capsys.readouterr().out
    assert "loaded from cache" in out
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_mc_checkpoint_exact_resume(tmp_path):
    """A run resumed from a mid-flight checkpoint is bit-identical to an
    uninterrupted run (global-index member keying makes resume exact)."""
    import numpy as np
    from pycwt_tpu.coherence import wct_significance

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=4, mc_batch=4)
    full = wct_significance(0.5, 0.6, **kw)

    # Simulate an interrupted run: same params but only 8 members completed,
    # leaving a checkpoint mid-way toward mc_count=12.
    ck = str(tmp_path / "mc.ckpt")
    partial_kw = dict(kw, mc_count=12)
    # Run the first two chunks by hand through the public API with a
    # checkpoint, then truncate the recorded progress to 8 members.
    _ = wct_significance(0.5, 0.6, checkpoint=ck, **partial_kw)
    z = np.load(ck)
    assert int(z["done"]) == 12
    # Rebuild a truly partial checkpoint (first 8 members only).
    import jax
    import jax.numpy as jnp

    import pycwt_tpu as wt
    from pycwt_tpu.coherence import _mc_histogram_chunk, NBINS
    from pycwt_tpu.config import DEFAULT
    from pycwt_tpu.transform import build_scale_grid, coi_bartlett

    s0, J, dj, dt = 2.0, 7, 1 / 4, 1.0
    ms = s0 * (2 ** (J * dj)) / dt
    n = int(np.ceil(ms * 6))
    grid = build_scale_grid(n, dt, dj=dj, s0=s0, J=J)
    coi = coi_bartlett(n, dt, wt.Morlet(6))
    period = 1.0 / grid.freqs[:, None] * np.ones((1, n))
    outsidecoi = period <= coi[None, :]
    key = jax.random.PRNGKey(4)
    dtype = jnp.float64
    wlc8 = np.zeros((J + 1, NBINS))
    for start in (0, 4):
        wlc8 += np.asarray(_mc_histogram_chunk(
            key, jnp.int32(start), jnp.asarray(grid.sj, dtype),
            jnp.asarray(outsidecoi), dt, mother=wt.Morlet(6),
            nfft=DEFAULT.fft_length(n), dj=dj, batch=4, n=n,
            al1=0.5, al2=0.6))
    meta = np.asarray(z["meta"])
    with open(ck, "wb") as f:
        np.savez(f, meta=meta, wlc=wlc8, done=np.int64(8))

    resumed = wct_significance(0.5, 0.6, checkpoint=ck, **partial_kw)
    valid = np.isfinite(full)
    np.testing.assert_array_equal(resumed[valid], full[valid])


def test_mc_checkpoint_rejects_different_wavelet(tmp_path):
    """A checkpoint written under one mother must NOT be resumed under
    another (meta fingerprint folds in the wavelet)."""
    import numpy as np
    from pycwt_tpu.coherence import wct_significance

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, progress=False,
              cache=False, seed=5, mc_batch=4)
    ck = str(tmp_path / "mix.ckpt")
    _ = wct_significance(0.5, 0.6, wavelet="morlet", checkpoint=ck, **kw)
    clean_paul = wct_significance(0.5, 0.6, wavelet="paul", **kw)
    resumed_paul = wct_significance(0.5, 0.6, wavelet="paul", checkpoint=ck,
                                    **kw)
    valid = np.isfinite(clean_paul)
    # The Morlet checkpoint must be ignored: Paul-with-checkpoint == clean Paul.
    np.testing.assert_array_equal(resumed_paul[valid], clean_paul[valid])


def test_mc_checkpoint_extends_mc_count(tmp_path):
    """Re-running with a LARGER mc_count against an existing checkpoint must
    resume from the completed members (global-index keying makes the
    extension exact), not silently start from zero (ADVICE r2)."""
    import numpy as np
    from pycwt_tpu.coherence import wct_significance

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, progress=False, cache=False,
              seed=6, mc_batch=4)
    full12 = wct_significance(0.5, 0.6, mc_count=12, **kw)
    ck = str(tmp_path / "ext.ckpt")
    _ = wct_significance(0.5, 0.6, mc_count=8, checkpoint=ck, **kw)
    assert int(np.load(ck)["done"]) == 8
    extended = wct_significance(0.5, 0.6, mc_count=12, checkpoint=ck, **kw)
    assert int(np.load(ck)["done"]) == 12
    valid = np.isfinite(full12)
    np.testing.assert_array_equal(extended[valid], full12[valid])


def test_mc_fused_dispatch_matches_chunked(tmp_path):
    """The no-checkpoint fast path (all full chunks in one device dispatch)
    is bit-identical to the per-chunk dispatch loop."""
    import numpy as np
    from pycwt_tpu.coherence import wct_significance

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=4, mc_batch=4)
    fused = wct_significance(0.5, 0.6, **kw)          # 3 chunks, 1 dispatch
    chunked = wct_significance(0.5, 0.6, checkpoint=str(tmp_path / "c.ckpt"),
                               **kw)                  # 3 dispatches
    valid = np.isfinite(fused)
    np.testing.assert_array_equal(fused[valid], chunked[valid])


def test_mc_cache_key_isolates_config(tmp_path, monkeypatch):
    """A non-default CWTConfig gets its own cache entry — an engine='mxu'
    curve must never be served from the default-config file (ADVICE r2)."""
    from pycwt_tpu.coherence import wct_significance
    from pycwt_tpu.config import CWTConfig

    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, seed=1, mc_batch=4,
              progress=False, cache=True)
    _ = wct_significance(0.5, 0.6, **kw)
    _ = wct_significance(0.5, 0.6, config=CWTConfig(engine="mxu"), **kw)
    names = sorted(f.name for f in tmp_path.iterdir())
    assert len(names) == 2, names
    assert any("_cfgmxu-" in n for n in names), names


def test_mc_cache_key_isolates_seed_and_count(tmp_path, monkeypatch):
    """Non-default (mc_count, seed) must not hit the default cache entry."""
    import numpy as np
    from pycwt_tpu.coherence import wct_significance

    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, progress=False, cache=True)
    s_a = wct_significance(0.5, 0.6, mc_count=8, seed=1, mc_batch=4, **kw)
    s_b = wct_significance(0.5, 0.6, mc_count=16, seed=9, mc_batch=4, **kw)
    # Different ensembles ⇒ (almost surely) different curves; identical
    # curves would mean the second call read the first call's cache file.
    valid = np.isfinite(s_a) & np.isfinite(s_b)
    assert valid.any()
    assert not np.array_equal(s_a[valid], s_b[valid])
    # And each repeated call DOES hit its own cache entry exactly.
    s_b2 = wct_significance(0.5, 0.6, mc_count=16, seed=9, mc_batch=4, **kw)
    np.testing.assert_array_equal(s_b[valid], s_b2[valid])


def test_mc_auto_batch_model():
    """The bytes model lands the AO/Baltic workload at the measured-optimal
    chunk scale (~250-300), caps at mc_count, and floors small workloads."""
    from pycwt_tpu.coherence import _mc_auto_batch

    b = _mc_auto_batch(10_000, 76, 1024, 885)   # AO/Baltic dims
    assert 200 <= b <= 400, b
    assert _mc_auto_batch(100, 76, 1024, 885) == 100
    # Huge workloads: the bytes model governs (a hard floor used to
    # override it and OOM long-surrogate runs — round-4 regression).
    assert _mc_auto_batch(10_000, 400, 65536, 60000) == 1
    assert _mc_auto_batch(300, 119, 16384, 10543) == 15
    assert _mc_auto_batch(10**6, 8, 256, 200) == 1024       # tiny: ceiling


def test_mc_auto_batch_default_matches_explicit():
    """mc_batch=None (auto) gives the identical curve to an explicit batch —
    chunking never changes results (global-index member streams)."""
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=3)
    s_auto = wct_significance(0.5, 0.6, mc_batch=None, **kw)
    s_explicit = wct_significance(0.5, 0.6, mc_batch=5, **kw)
    np.testing.assert_array_equal(s_auto, s_explicit)


def test_wct_significance_batch_chunking_invariant():
    """The batched-alpha MC surface is mc_batch-invariant (member streams
    keyed by (pair slot, global index))."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=2)
    a = wct_significance_batch([0.4, 0.7], [0.5, 0.2], mc_batch=3, **kw)
    b = wct_significance_batch([0.4, 0.7], [0.5, 0.2], mc_batch=6, **kw)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(a, b)


def test_wct_significance_batch_agrees_with_single_pair():
    """Each batched curve agrees with the single-pair surface to MC noise
    (different member streams by design — distributional agreement, like
    two seeds of the same null), and zero/white-noise alphas work."""
    from pycwt_tpu.coherence import wct_significance, wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, progress=False, cache=False)
    batch = wct_significance_batch([0.0, 0.6], [0.0, 0.5], mc_count=64,
                                   seed=3, mc_batch=16, **kw)
    for p, (a1_, a2_) in enumerate([(0.0, 0.0), (0.6, 0.5)]):
        single = wct_significance(a1_, a2_, mc_count=64, seed=4, mc_batch=16,
                                  **kw)
        valid = np.isfinite(single) & (single != 0) & np.isfinite(batch[p])
        assert valid.any()
        assert np.abs(batch[p][valid] - single[valid]).max() < 0.25


def test_wct_significance_batch_seeds_single_pair_cache(tmp_path,
                                                        monkeypatch, capsys):
    """Curves written by the batch surface are picked up by later
    single-pair wct_significance calls (reference-compatible keys)."""
    from pycwt_tpu.coherence import wct_significance, wct_significance_batch

    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, seed=6,
              progress=False)
    batch = wct_significance_batch([0.3], [0.4], cache=True, mc_batch=4,
                                   **kw)
    got = wct_significance(0.3, 0.4, cache=True, **kw)
    out = capsys.readouterr().out
    assert "loaded from cache" in out
    np.testing.assert_allclose(got, batch[0], atol=1e-12)


def test_wct_significance_batch_rejects_nan_alpha():
    from pycwt_tpu.coherence import wct_significance_batch

    with pytest.raises(ValueError, match="non-finite"):
        wct_significance_batch([0.5, np.nan], [0.4, 0.3], dt=1.0, dj=1 / 4,
                               s0=2.0, J=7, mc_count=8, progress=False,
                               cache=False)


def test_wct_significance_batch_clamps_oversized_mc_batch():
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=6, progress=False,
              cache=False, seed=2)
    a = wct_significance_batch([0.4], [0.5], mc_batch=1000, **kw)
    b = wct_significance_batch([0.4], [0.5], mc_batch=6, **kw)
    np.testing.assert_array_equal(a, b)  # clamped to mc_count, same draws


def test_wct_significance_batch_rejects_nonstationary_alpha():
    from pycwt_tpu.coherence import wct_significance_batch

    with pytest.raises(ValueError, match="alpha"):
        wct_significance_batch([0.5, 1.0], [0.4, 0.3], dt=1.0, dj=1 / 4,
                               s0=2.0, J=7, mc_count=8, progress=False,
                               cache=False)


def test_wct_significance_batch_cache_round_trip(tmp_path, monkeypatch,
                                                 capsys):
    """A rerun with cache=True returns the stored curves without recompute."""
    from pycwt_tpu.coherence import wct_significance_batch

    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, seed=7,
              progress=True, cache=True, mc_batch=4)
    a = wct_significance_batch([0.3, 0.6], [0.4, 0.2], **kw)
    b = wct_significance_batch([0.3, 0.6], [0.4, 0.2], **kw)
    out = capsys.readouterr().out
    assert "loaded from cache" in out
    np.testing.assert_allclose(b, a, atol=1e-12)


def test_wct_significance_batch_pair_blocking_invariant():
    """Blocking the pair list over fixed-shape executables is bit-invariant
    (streams keyed by GLOBAL pair slot) — one compile serves any P."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, progress=False,
              cache=False, seed=8, mc_batch=4)
    al1 = [0.2, 0.4, 0.6, 0.7, 0.1]
    al2 = [0.3, 0.5, 0.2, 0.6, 0.4]
    a = wct_significance_batch(al1, al2, pair_block=5, **kw)
    b = wct_significance_batch(al1, al2, pair_block=2, **kw)  # ragged tail
    np.testing.assert_array_equal(a, b)


def test_wct_significance_batch_exact_count_invariance():
    """Non-divisor mc_batch values give the IDENTICAL curve: the tail
    chunk's over-drawn members are masked out of the histogram, so the
    ensemble holds exactly mc_count members for any chunking (round-5 fix
    of ADVICE r4 #1 — previously 300 at batch 37 silently became 333)."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=13, progress=False,
              cache=False, seed=2)
    a = wct_significance_batch([0.4], [0.5], mc_batch=13, **kw)
    b = wct_significance_batch([0.4], [0.5], mc_batch=5, **kw)   # 3 chunks=15
    c = wct_significance_batch([0.4], [0.5], mc_batch=4, **kw)   # 4 chunks=16
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_wct_significance_batch_dedups_equivalent_nulls():
    """Pairs whose coefficients fold to the same canonical null key —
    sorted, alpha_quant-rounded — share ONE computed ensemble: unordered
    symmetry, sub-quantum perturbations, and exact duplicates all return
    bit-identical curves."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, progress=False,
              cache=False, seed=5, mc_batch=4)
    al1 = [0.3, 0.5, 0.3004, 0.3]
    al2 = [0.5, 0.3, 0.5, 0.5]
    sig = wct_significance_batch(al1, al2, **kw)
    np.testing.assert_array_equal(sig[0], sig[1])  # unordered symmetry
    np.testing.assert_array_equal(sig[0], sig[2])  # rounds to same key
    np.testing.assert_array_equal(sig[0], sig[3])  # exact duplicate

    # alpha_quant=0 keeps symmetric/exact sharing but not sub-quantum.
    sig0 = wct_significance_batch(al1, al2, alpha_quant=0, **kw)
    np.testing.assert_array_equal(sig0[0], sig0[1])
    np.testing.assert_array_equal(sig0[0], sig0[3])
    assert np.nanmax(np.abs(sig0[0] - sig0[2])) > 0  # distinct null now


def test_wct_significance_batch_dedup_cache_state_independent():
    """A null key's member streams are keyed by a stable hash of the key —
    NOT a positional slot — so the computed curve for a pair is identical
    whether it runs alone, in any batch composition, or after other pairs
    were already cached."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, progress=False,
              cache=False, seed=5, mc_batch=4)
    alone = wct_significance_batch([0.6], [0.2], **kw)
    in_batch = wct_significance_batch([0.1, 0.6, 0.4], [0.3, 0.2, 0.4], **kw)
    np.testing.assert_array_equal(alone[0], in_batch[1])


def test_wct_significance_batch_partial_cache_hit(tmp_path, monkeypatch):
    """A partial cache hit computes ONLY the missing nulls: the cached
    pair's row is returned byte-for-byte from disk (proven with a sentinel
    curve that no computation would produce)."""
    from pycwt_tpu.coherence import (_sig_cache_name, wct_significance_batch)
    from pycwt_tpu.config import DEFAULT
    from pycwt_tpu.mothers import as_mother

    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=8, seed=6)
    sentinel = np.linspace(0.123, 0.789, 8)
    name = _sig_cache_name(0.3, 0.4, 1 / 4, 2.0, 1.0, 7,
                           as_mother("morlet"), 8, 6, DEFAULT)
    np.savetxt(f"{tmp_path}/{name}.gz", sentinel)

    sig = wct_significance_batch([0.3, 0.6], [0.4, 0.2], cache=True,
                                 progress=False, mc_batch=4, **kw)
    np.testing.assert_allclose(sig[0], sentinel, atol=1e-12)
    assert np.isfinite(sig[1][1:]).any() and not np.allclose(sig[1], sig[0])
    # And the freshly computed pair equals a cache=False run of its null.
    fresh = wct_significance_batch([0.6], [0.2], cache=False, progress=False,
                                   mc_batch=4, **kw)
    np.testing.assert_array_equal(sig[1], fresh[0])


def test_sig_cache_name_keys_on_resolved_policy():
    """Cache filenames key on the RESOLVED engine/dtype (VERDICT r4 weak
    #3): engine=None resolves platform-dependently, so a planar-f32 chip
    run and an xla-f64 CPU run must never share the reference-compatible
    default name."""
    from pycwt_tpu.coherence import _sig_cache_name
    from pycwt_tpu.config import CWTConfig, DEFAULT
    from pycwt_tpu.mothers import as_mother

    m = as_mother("morlet")
    args = (0.3, 0.4, 1 / 12, 2.0, 1.0, 40, m, 300, 0)
    # On the CPU-x64 test backend the default config resolves to xla/f64 →
    # the reference's bare, interoperable filename.
    base = _sig_cache_name(*args, DEFAULT)
    assert "_cfg" not in base
    planar32 = _sig_cache_name(
        *args, CWTConfig(engine="planar", dtype="float32"))
    assert planar32.startswith(base) and "_cfgplanar-float32" in planar32
    # Same engine, different resolved dtype → still distinct.
    planar64 = _sig_cache_name(
        *args, CWTConfig(engine="planar", dtype="float64"))
    assert planar64 != planar32


def test_wct_significance_batch_auto_quant_scales_with_mc_count():
    """The default alpha_quant follows the ensemble's sampling noise:
    q = clip(0.05*sqrt(300/mc_count), 0.01, 0.05).  Alphas 0.02 apart share
    a null at the default-noise grid (q=0.05) but not under a
    high-precision ensemble's finer grid (q=0.01)."""
    from pycwt_tpu.coherence import wct_significance_batch

    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, progress=False, cache=False,
              seed=3, mc_batch=4)
    coarse = wct_significance_batch([0.44, 0.46], [0.3, 0.3], mc_count=8,
                                    **kw)
    np.testing.assert_array_equal(coarse[0], coarse[1])  # q=0.05 -> shared
    kw_fine = dict(kw, mc_batch=100)
    fine = wct_significance_batch([0.44, 0.46], [0.3, 0.3], mc_count=100,
                                  **kw_fine)
    # q = 0.05*sqrt(3) clipped to 0.05? sqrt(300/100)=1.73 -> 0.0866 -> 0.05
    np.testing.assert_array_equal(fine[0], fine[1])
    very_fine = wct_significance_batch([0.44, 0.46], [0.3, 0.3],
                                       mc_count=12000, mc_batch=3000,
                                       dt=1.0, dj=1 / 4, s0=2.0, J=7,
                                       progress=False, cache=False, seed=3)
    # q = 0.05*sqrt(300/12000) = 0.0079 -> clipped to 0.01: distinct keys.
    assert np.nanmax(np.abs(very_fine[0] - very_fine[1])) > 0


def test_wct_significance_batch_boundary_alpha_does_not_round_to_one():
    """Quantization must never push a valid stationary coefficient to
    exactly +-1 (where the AR(1) burn-in diverges): alpha=0.99 — exactly
    what wct_matrix_analysis's stationarity clip produces — runs, and its
    canonical value stays q/2 inside the boundary (round-5 review fix)."""
    from pycwt_tpu.coherence import wct_significance_batch

    sig = wct_significance_batch([0.99, -0.99], [0.5, 0.5], dt=1.0,
                                 dj=1 / 4, s0=2.0, J=7, mc_count=4,
                                 progress=False, cache=False, seed=1,
                                 mc_batch=4)
    assert np.isfinite(sig[:, 1:5]).any()
    # 0.99 and 0.98 share the clamped top cell at q=0.05 (both round to
    # 1.0 and clamp to 0.975).
    sig2 = wct_significance_batch([0.98, -0.99], [0.5, 0.5], dt=1.0,
                                  dj=1 / 4, s0=2.0, J=7, mc_count=4,
                                  progress=False, cache=False, seed=1,
                                  mc_batch=4)
    np.testing.assert_array_equal(sig[0], sig2[0])


def test_sig_cache_rejects_cross_policy_entries(tmp_path, monkeypatch):
    """Curves carry a resolved-policy header: a curve cached under one
    numeric policy is a cache MISS for a different resolved policy even
    when the filename collides, while headerless (reference-written) files
    are still accepted (round-5 review fix for the legacy bare-name hole)."""
    from pycwt_tpu.coherence import (_sig_cache_read, _sig_cache_write,
                                     _sig_cfg_tag)
    from pycwt_tpu.config import CWTConfig, DEFAULT

    curve = np.linspace(0, 1, 9)
    path = str(tmp_path / "wct_sig_test.gz")
    _sig_cache_write(path, curve, DEFAULT)
    # Same resolved policy reads back.
    np.testing.assert_allclose(_sig_cache_read(path, DEFAULT), curve)
    # A different resolved policy must miss.
    other = CWTConfig(engine="mxu", dtype="float32")
    assert _sig_cfg_tag(other) != _sig_cfg_tag(DEFAULT)
    with pytest.raises(OSError, match="different resolved"):
        _sig_cache_read(path, other)
    # Headerless files (the reference's own writes) are accepted.
    np.savetxt(path, curve)
    np.testing.assert_allclose(_sig_cache_read(path, DEFAULT), curve)
    np.testing.assert_allclose(_sig_cache_read(path, other), curve)
