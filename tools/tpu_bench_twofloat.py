"""Cost of the compensated two-float parity mode on the real chip.

Parity mode (``ops/twofloat.py``) trades speed for ~1e-11 chip parity vs the
f64 goldens; this records the price next to the f32 throughput path so
BASELINE.md can state it (VERDICT r4 next #2 'Done' clause).

Methodology: min-of-3 chained-loop slopes with a HOST FETCH as the
completion barrier (axon's block_until_ready can return early); the device
part alone is timed (host split/assembly excluded — it is one memcpy-shaped
pass, and the split bank is reusable across signals of a batch).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _slope(fn, reps=3, iters=4):
    best = None
    for _ in range(reps):
        t1 = time.perf_counter()
        fn(1)
        t1 = time.perf_counter() - t1
        tn = time.perf_counter()
        fn(iters)
        tn = time.perf_counter() - tn
        s = (tn - t1) / (iters - 1) if tn > t1 else tn / iters
        best = s if best is None else min(best, s)
    return best


def main():
    sys.path.insert(0, ".")
    import pycwt_tpu as wt
    from pycwt_tpu.ops.twofloat import (_cwt_df_device, _filter_bank_f64,
                                        cwt_twofloat, df_from_f64)
    from pycwt_tpu.transform import build_scale_grid

    wt.utils.enable_compilation_cache()
    out = {"platform": jax.devices()[0].platform}

    # --- NINO3-shaped parity workload (the tpu_parity_report row) --------
    g = np.load("tests/golden/cwt_nino3_morlet6.npz")
    sig, dt = np.asarray(g["signal"], np.float64), float(g["dt"])
    t0 = time.perf_counter()
    W, sj, fr, coi = cwt_twofloat(sig, dt)  # includes compile
    out["nino3_cold_s"] = round(time.perf_counter() - t0, 3)

    def run_nino3(k):
        for _ in range(k):
            W, *_ = cwt_twofloat(sig, dt)
        float(np.asarray(W[0, 0]).real)  # host fetch barrier
    out["nino3_per_transform_s"] = round(_slope(run_nino3), 5)

    # --- headline-shaped workload: 1M-pt Morlet-6 x 64 scales ------------
    N = 1 << 20
    S = 64
    mother = wt.Morlet(6)
    sj_big = np.asarray(
        build_scale_grid(N, 1.0, dj=0.25, s0=2.0, J=S - 1).sj)  # bench.py grid
    bank = _filter_bank_f64(mother, sj_big, N, 1.0)
    rng = np.random.default_rng(0)
    x = np.zeros(N)
    x[:] = rng.standard_normal(N)
    xh, xl = df_from_f64(x)
    brh, brl = df_from_f64(bank.real)
    bih, bil = df_from_f64(bank.imag)
    args = tuple(jnp.asarray(a) for a in (xh, xl, brh, brl, bih, bil))

    t0 = time.perf_counter()
    o = _cwt_df_device(*args, nfft=N)
    np.asarray(o[0][0, :8])
    out["big_cold_s"] = round(time.perf_counter() - t0, 2)

    def run_big(k):
        for _ in range(k):
            o = _cwt_df_device(*args, nfft=N)
        np.asarray(o[0][0, :8])  # host fetch barrier
    per = _slope(run_big, reps=3, iters=3)
    out["big_per_transform_s"] = round(per, 4)
    out["big_sample_scales_per_s"] = round(N * S / per, 0)
    out["vs_f32_default_8.4e9"] = round((N * S / per) / 8.4e9, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
