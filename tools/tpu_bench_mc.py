#!/usr/bin/env python
"""End-to-end wct_significance wall time on the TPU — the reference's
wall-clock dominator (102 s serial CPU for the same AO/Baltic workload;
see tests/golden/wct_sig_jao_jbaltic.npz provenance).

Reports COMPILE and STEADY-STATE separately (VERDICT r2 #1): the first call
pays trace+compile; the second call with a different seed re-runs the same
executables end-to-end (fresh surrogates, fresh histogram, host CDF) and is
what a production sweep over many signal pairs would pay per run.

Optional: set PYCWT_TPU_TRACE_DIR to wrap the steady run in a jax.profiler
trace (pycwt_tpu.utils.profiling.trace).
"""
import json
import logging
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pycwt_tpu.coherence import wct_significance  # noqa: E402
from pycwt_tpu.utils.helpers import enable_compilation_cache  # noqa: E402
from pycwt_tpu.utils.profiling import PhaseTimer, logger, trace  # noqa: E402

enable_compilation_cache()  # compile is per-machine, not per-process

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(name)s %(message)s")

g = np.load(os.path.join(ROOT, "tests/golden/wct_sig_jao_jbaltic.npz"))
_mcb = os.environ.get("PYCWT_TPU_MC_BATCH")
kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
          J=int(g["J"]), mc_count=300, progress=False, cache=False,
          # None → library auto-sizing (_mc_auto_batch bytes model)
          mc_batch=int(_mcb) if _mcb else None)

timer = PhaseTimer()
with timer.phase("cold (trace+compile+run)"):
    sig95 = wct_significance(float(g["al1"]), float(g["al2"]), seed=11, **kw)
with trace(os.environ.get("PYCWT_TPU_TRACE_DIR")):
    with timer.phase("steady (new seed, cached executables)"):
        sig95_b = wct_significance(float(g["al1"]), float(g["al2"]), seed=12,
                                   **kw)
timer.log()

rep = timer.report()
cold = rep["cold (trace+compile+run)"]["seconds"]
steady = rep["steady (new seed, cached executables)"]["seconds"]
ref = g["sig95"]
valid = np.isfinite(ref) & (ref != 0)
print(json.dumps({
    "metric": "wct_significance_300_surrogates_wall_s",
    "value": steady,
    "cold_wall_s": cold,
    "compile_overhead_s": cold - steady,
    "mc_batch": kw["mc_batch"],
    "reference_cpu_serial_s": 102.0,
    "speedup": 102.0 / steady,
    "max_abs_diff_vs_reference_curve": float(
        np.abs(sig95[valid] - ref[valid]).max()),
    "max_abs_diff_between_seeds": float(
        np.abs(sig95[valid] - sig95_b[valid]).max()),
}))
