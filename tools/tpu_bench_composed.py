"""Composed 32-station production workload, end-to-end (BASELINE.md r4/r5).

`wct_matrix_analysis`: all-pairs coherence maps PLUS per-pair Monte-Carlo
nulls for a 32-station network (N=1024, dt=0.25, mc_count=300) — the round-4
flagship measured 197.7 s steady.  Round 5 deduplicates the nulls to
distinct canonical keys (sorted, alpha_quant-rounded coefficients) with an
incremental cache (`coherence.wct_significance_batch`), so the measured
quantity now includes the distinct-null count the VERDICT asked to report.

Also prints the alpha-sensitivity experiment that CALIBRATES alpha_quant:
null curves for symmetric alpha pairs across [0, 0.9] at mc_count=3000
(sampling noise ~0.009) — the measured curve drift per 0.05 of alpha is what
justifies the default quantization being safely below MC noise at 300.

Usage: timeout 2000 python tools/tpu_bench_composed.py [--skip-sensitivity]
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    # Isolated cache dir: the measurement must not hit curves from earlier
    # runs, and the cached-rerun row must hit exactly this run's writes.
    cache_dir = tempfile.mkdtemp(prefix="pycwt_composed_")
    os.environ["PYCWT_TPU_CACHE_DIR"] = cache_dir

    import jax  # noqa: E402

    from pycwt_tpu.analysis import wct_matrix_analysis  # noqa: E402
    from pycwt_tpu.coherence import wct_significance_batch  # noqa: E402
    from pycwt_tpu.utils.helpers import enable_compilation_cache  # noqa

    enable_compilation_cache()
    out = {"platform": jax.devices()[0].platform}

    # --- alpha-sensitivity calibration (one compile, ~10 s steady) -------
    if "--skip-sensitivity" not in sys.argv:
        # The composed workload's own scale grid (N=1024, dt=0.25 ->
        # s0=2dt/lambda=0.484, J=109; surrogate n ~ 6.3k, nfft 8192).
        als = np.asarray([0.0, 0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
        sig = wct_significance_batch(
            als, als, dt=0.25, dj=1 / 12, s0=0.484, J=109, mc_count=3000,
            seed=0, cache=False, progress=False, alpha_quant=0)
        drift = {}
        for i in range(len(als) - 1):
            a, b = sig[i], sig[i + 1]
            m = np.isfinite(a) & np.isfinite(b) & (a != 0) & (b != 0)
            drift[f"{als[i]:.1f}->{als[i+1]:.1f}"] = round(
                float(np.abs(a[m] - b[m]).max()), 4)
        out["alpha_sensitivity_max_abs_curve_drift_mc3000"] = drift

    # --- the composed 32-station workload --------------------------------
    rng = np.random.default_rng(7)
    B, n0 = 32, 1024
    g_true = rng.uniform(0.4, 0.8, B)
    y = np.empty((B, n0))
    for b in range(B):
        e = rng.standard_normal(n0 + 256)
        for t in range(1, len(e)):
            e[t] += g_true[b] * e[t - 1]
        y[b] = e[256:]

    t0 = time.time()
    res = wct_matrix_analysis(y, dt=0.25, mc_count=300)
    np.asarray(res["sig95"]).sum()
    out["cold_s"] = round(time.time() - t0, 1)

    # Steady state: fresh cache (recompute nulls with warm executables).
    shutil.rmtree(cache_dir)
    os.makedirs(cache_dir)
    t0 = time.time()
    res = wct_matrix_analysis(y, dt=0.25, mc_count=300)
    np.asarray(res["sig95"]).sum()
    out["steady_s"] = round(time.time() - t0, 1)
    P = len(res["pairs"])
    out["pairs"] = P

    # Distinct nulls under the default (auto) alpha_quant — computed with
    # the library's OWN key rule so the count always matches what ran.
    from pycwt_tpu.coherence import _auto_alpha_quant, _canonical_null_key

    g = res["alpha"]
    q = _auto_alpha_quant(300)
    keys = {_canonical_null_key(g[i], g[j], q) for i, j in res["pairs"]}
    out["alpha_quant"] = q
    out["distinct_nulls"] = len(keys)

    # Warm-cache rerun: every curve on disk -> no MC at all.
    t0 = time.time()
    res2 = wct_matrix_analysis(y, dt=0.25, mc_count=300)
    np.asarray(res2["sig95"]).sum()
    out["cached_rerun_s"] = round(time.time() - t0, 1)

    # Incremental: add one station -> only its new pairs' nulls run.
    y33 = np.vstack([y, y[:1] * 0.9 + 0.1 * rng.standard_normal(n0)])
    t0 = time.time()
    res3 = wct_matrix_analysis(y33, dt=0.25, mc_count=300)
    np.asarray(res3["sig95"]).sum()
    out["add_one_station_s"] = round(time.time() - t0, 1)
    out["add_one_station_pairs"] = len(res3["pairs"])

    shutil.rmtree(cache_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
