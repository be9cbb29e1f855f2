#!/usr/bin/env python
"""Per-stage on-device timing of the Monte-Carlo WCT-significance chunk.

Answers VERDICT r2 #1's open question: of the chunk pipeline

    AR(1) surrogates → batched planar CWT ×2 → smoothing ×3 → coherence →
    scatter-add histogram

which stage dominates on the chip?  Each cumulative prefix of the pipeline is
timed as its own jitted ``lax.fori_loop`` over ``ITERS`` chunks (the chunk's
global start index varies per iteration, so no loop-invariant hoisting can
elide work); stage cost = difference of consecutive prefix timings.

Workload: the AO/Baltic golden (same as tools/tpu_bench_mc.py), mc_batch=75.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The axon sitecustomize pins the TPU platform; honor an explicit override
# the same way the other tools do (jax.config beats the env var).
if os.environ.get("PYCWT_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYCWT_TPU_PLATFORM"])

from pycwt_tpu.config import DEFAULT  # noqa: E402
from pycwt_tpu.coherence import NBINS, _wct_core  # noqa: E402
from pycwt_tpu.mothers import Morlet  # noqa: E402
from pycwt_tpu.stats import rednoise_members  # noqa: E402
from pycwt_tpu.transform import build_scale_grid, coi_bartlett  # noqa: E402
from pycwt_tpu.utils.helpers import find  # noqa: E402

g = np.load(os.path.join(ROOT, "tests/golden/wct_sig_jao_jbaltic.npz"))
al1, al2 = float(g["al1"]), float(g["al2"])
dt, dj, s0, J = float(g["dt"]), float(g["dj"]), float(g["s0"]), int(g["J"])
BATCH = int(os.environ.get("PYCWT_TPU_MC_BATCH", "75"))
ITERS = int(os.environ.get("PYCWT_TPU_MC_ITERS", "8"))

mother = Morlet(6)
ms = s0 * (2 ** (J * dj)) / dt
n = int(np.ceil(ms * 6))
grid = build_scale_grid(n, dt, dj=dj, s0=s0, J=J, mother=mother)
coi = coi_bartlett(n, dt, mother)
period = 1.0 / grid.freqs[:, None] * np.ones((1, n))
outsidecoi = jnp.asarray(period <= coi[None, :])
nfft = DEFAULT.fft_length(n)
scales = jnp.asarray(grid.sj, jnp.float32)
key = jax.random.PRNGKey(0)
S = scales.shape[0]

print(f"workload: n={n} nfft={nfft} S={S} batch={BATCH} iters={ITERS}",
      file=sys.stderr)


def noise_pair(start):
    k1, k2 = jax.random.split(key)
    idx = start + jnp.arange(BATCH)
    n1 = rednoise_members(k1, idx, n, al1, 1.0, dtype=jnp.float32)
    n2 = rednoise_members(k2, idx, n, al2, 1.0, dtype=jnp.float32)
    return n1, n2


def stage_surrogates(start):
    n1, n2 = noise_pair(start)
    return n1.sum() + n2.sum()


def _planar_cwts(start):
    from pycwt_tpu.coherence import _wct_core_planar  # noqa: F401
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar
    from pycwt_tpu.ops.pallas_fft import _small_planar_xla, fused_cwt_planar, \
        supported_nfft

    n1, n2 = noise_pair(start)
    interpret = jax.default_backend() not in ("tpu", "axon")

    if supported_nfft(nfft):
        def one_w(a, b):
            return fused_cwt_planar(a, b, scales, mother=mother, nfft=nfft,
                                    dt=dt, interpret=interpret)
    else:
        def one_w(a, b):
            return _small_planar_xla(a, b, scales, mother=mother, nfft=nfft,
                                     dt=dt,
                                     precision=jax.lax.Precision.HIGHEST)

    def planar_w(y):
        sr, si = fft_of_real_planar(y, nfft)
        wr, wi = jax.vmap(one_w)(sr, si)
        return wr[..., :n], wi[..., :n]

    return planar_w(n1), planar_w(n2)


def stage_cwt(start):
    (w1r, w1i), (w2r, w2i) = _planar_cwts(start)
    return w1r.sum() + w1i.sum() + w2r.sum() + w2i.sum()


def _smoothed(start):
    from pycwt_tpu.ops.smoothing import smooth_planar_real

    (w1r, w1i), (w2r, w2i) = _planar_cwts(start)
    s_col = scales[:, None]
    S1 = smooth_planar_real((w1r ** 2 + w1i ** 2) / s_col, dt, dj, scales,
                            mother)
    S2 = smooth_planar_real((w2r ** 2 + w2i ** 2) / s_col, dt, dj, scales,
                            mother)
    w12r = w1r * w2r + w1i * w2i
    w12i = w1i * w2r - w1r * w2i
    S12r = smooth_planar_real(w12r / s_col, dt, dj, scales, mother)
    S12i = smooth_planar_real(w12i / s_col, dt, dj, scales, mother)
    return S1, S2, S12r, S12i


def stage_smooth(start):
    S1, S2, S12r, S12i = _smoothed(start)
    return S1.sum() + S2.sum() + S12r.sum() + S12i.sum()


def _coherence(start):
    S1, S2, S12r, S12i = _smoothed(start)
    return (S12r ** 2 + S12i ** 2) / (S1 * S2)


def stage_coherence(start):
    return _coherence(start).sum()


def stage_scatter_hist(start):
    """The round-2 scatter-add histogram formulation, kept for comparison
    against the library's MXU factored-one-hot histogram (stage_full)."""
    R2 = _coherence(start)
    bins = jnp.clip(jnp.floor(R2 * NBINS).astype(jnp.int32), 0, NBINS - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BATCH, S, n), 1)
    flat = (rows * NBINS + bins).reshape(-1)
    weights = jnp.broadcast_to(outsidecoi[None], (BATCH, S, n)).reshape(-1)
    hist = jnp.zeros((S * NBINS,), jnp.float32).at[flat].add(
        weights.astype(jnp.float32))
    return hist.sum()


def stage_full(start):
    """THE library chunk (coherence._mc_histogram_chunk) — measures exactly
    what wct_significance dispatches, including the histogram formulation
    that actually ships."""
    from pycwt_tpu.coherence import _mc_histogram_chunk

    h = _mc_histogram_chunk(
        key, start, scales, outsidecoi.astype(jnp.float32), dt, mother=mother,
        nfft=nfft, dj=dj, batch=BATCH, n=n, al1=al1, al2=al2, engine="planar")
    return h.sum()


STAGES = [
    ("surrogates", stage_surrogates),
    ("+cwt", stage_cwt),
    ("+smooth", stage_smooth),
    ("+coherence", stage_coherence),
    ("+scatter-hist (round-2 formulation)", stage_scatter_hist),
    ("+histogram (full chunk)", stage_full),
]


def timed(fn):
    @jax.jit
    def loop():
        def body(i, acc):
            return acc + fn(jnp.int32(i * BATCH))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    np.asarray(loop())           # compile + warm
    t0 = time.perf_counter()
    out = np.asarray(loop())
    wall = time.perf_counter() - t0
    assert np.isfinite(out)
    return wall / ITERS


results = {}
prev = 0.0
for name, fn in STAGES:
    per_chunk = timed(fn)
    results[name] = {"per_chunk_s": per_chunk,
                     "delta_s": per_chunk - prev}
    prev = per_chunk
    print(f"  {name:26s} {per_chunk * 1e3:8.2f} ms/chunk "
          f"(Δ {results[name]['delta_s'] * 1e3:+8.2f} ms)", file=sys.stderr)

full = results["+histogram (full chunk)"]["per_chunk_s"]
print(json.dumps({
    "metric": "mc_chunk_stage_profile",
    "batch": BATCH,
    "per_chunk_s": full,
    "per_300_surrogates_s": full * 300 / BATCH,
    "stages": results,
}))
