"""Long-signal paths measured on the REAL chip (VERDICT r4 next #3).

Runs the three long-N surfaces at N = 2^22, 2^23, 2^24 (64 scales) on the
tunneled v5e and records throughput, device-memory peaks, and the
blocked-vs-global error profile — turning the claims in ``ops/overlap.py``
(2^24 feasibility, N-independent streamed memory, the ~1e-2 near-Nyquist
bound, round-off agreement for s ≥ 4·dt) into measured facts:

* ``cwt_overlap_save_planar``      — full (S, N) planar W, scan-blocked;
* ``streamed_global_power_planar`` — (S,) accumulator only;
* ``sharded_cwt_spectral_planar``  — the pencil/transpose global-spectrum
  CWT on a 1-device mesh (exact, no truncation halo).

Every (surface, N) measurement runs in its OWN child process: a 2^24 full-W
attempt can legitimately exhaust HBM, and leftover buffers from one
measurement must never contaminate the next (the first sweep's 2^24 rows
OOMed only because the 2^23 outputs were still resident).

Grid: 64 scales, s0 = 2dt, dj = 1/8 → s_max ≈ 469·dt (halo ≈ 2.7k samples
≪ chunk) — the physically meaningful long-N regime (N ≫ s_max).  The
TC98-default dj=1/4 bench grid would put s_max ≈ 1.1e5·dt, where a 2^18
chunk cannot contain the largest wavelet; overlap-save targets long signals,
not extreme scales (use the pencil path for those).

Usage: ``python tools/tpu_bench_long.py [--sizes=22,23,24]``.
Prints one JSON line per (surface, N) plus an error-profile line.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

S = 64
DT = 1.0
SURFACES = ("cwt_overlap_save_planar", "streamed_global_power_planar",
            "sharded_cwt_spectral_planar", "wct_overlap_planar")


def _scales():
    return 2.0 * 2.0 ** (np.arange(S) / 8.0)  # s0=2dt, dj=1/8


def _mem_peak():
    try:
        import jax

        st = jax.local_devices()[0].memory_stats()
        return int(st.get("peak_bytes_in_use", 0)) if st else None
    except Exception:
        return None


def _time_fetch(fn, fetch, reps=2):
    """Best-of-reps wall time with a HOST FETCH barrier (axon's
    block_until_ready can return early — BASELINE.md backend caveat).
    The previous rep's output is RELEASED before re-running: holding two
    generations of a 2^24 full-W result (8.6 GB each) is itself an OOM."""
    best = None
    out = None
    for _ in range(reps):
        out = None  # free the previous rep's device buffers first
        t0 = time.perf_counter()
        out = fn()
        fetch(out)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best, out


def child(surface: str, p: int):
    import warnings

    warnings.filterwarnings("ignore")
    import jax
    import jax.numpy as jnp

    import pycwt_tpu as wt
    from pycwt_tpu.ops.overlap import (cwt_overlap_save_planar,
                                       streamed_global_power_planar)
    from pycwt_tpu.parallel.dist_fft import sharded_cwt_spectral_planar
    from pycwt_tpu.parallel.mesh import MeshSpec, make_mesh

    wt.utils.enable_compilation_cache()
    mother = wt.Morlet(6)
    N = 1 << p
    scales = jnp.asarray(_scales(), jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    if surface == "cwt_overlap_save_planar":
        fn = lambda: cwt_overlap_save_planar(x, scales, DT, mother=mother)
        fetch = lambda o: np.asarray(o[0][0, :8])
    elif surface == "wct_overlap_planar":
        from pycwt_tpu.ops.overlap import wct_overlap_planar

        x2 = jnp.asarray(
            0.5 * np.asarray(x) + np.asarray(
                rng.standard_normal(N), np.float32))
        fn = lambda: wct_overlap_planar(x, x2, scales, DT, mother=mother,
                                        dj=0.125)
        fetch = lambda o: np.asarray(o[0][0, :8])
    elif surface == "streamed_global_power_planar":
        fn = lambda: streamed_global_power_planar(x, scales, DT,
                                                  mother=mother)
        fetch = np.asarray
    else:
        mesh = make_mesh(MeshSpec(data=1))
        pencil = jax.jit(lambda v: sharded_cwt_spectral_planar(
            mesh, v, scales, DT, mother=mother))
        fn = lambda: pencil(x)
        fetch = lambda o: np.asarray(o[0][0, :8])

    t, _ = _time_fetch(fn, fetch)
    peak = _mem_peak()
    print(json.dumps({"surface": surface, "logN": p, "wall_s": round(t, 3),
                      "sample_scales_per_s": round(N * S / t, 0),
                      "peak_hbm_gb": round((peak or 0) / 1e9, 2)}))


def child_errprofile(p: int):
    import warnings

    warnings.filterwarnings("ignore")
    import jax
    import jax.numpy as jnp

    import pycwt_tpu as wt
    from pycwt_tpu.ops.overlap import cwt_overlap_save_planar, halo_samples
    from pycwt_tpu.parallel.dist_fft import sharded_cwt_spectral_planar
    from pycwt_tpu.parallel.mesh import MeshSpec, make_mesh

    wt.utils.enable_compilation_cache()
    mother = wt.Morlet(6)
    N = 1 << p
    sj = _scales()
    scales = jnp.asarray(sj, jnp.float32)
    H = halo_samples(float(sj.max()), DT)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    # precision="highest" isolates the BLOCKING error from the default
    # bf16x2 kernel tier (both sides then at ~f32-exact matmuls).
    wr, wi = cwt_overlap_save_planar(x, scales, DT, mother=mother,
                                     precision="highest")
    mesh = make_mesh(MeshSpec(data=1))
    gr, gi = jax.jit(lambda v: sharded_cwt_spectral_planar(
        mesh, v, scales, DT, mother=mother))(x)
    wr, wi = np.asarray(wr), np.asarray(wi)
    gr, gi = np.asarray(gr)[:, :N], np.asarray(gi)[:, :N]
    sl = slice(H, N - H)  # interior: outer halo is COI-masked zero-pad land
    err = []
    for s in range(S):
        num = np.abs((wr[s, sl] - gr[s, sl])
                     + 1j * (wi[s, sl] - gi[s, sl])).max()
        den = np.abs(gr[s, sl] + 1j * gi[s, sl]).max()
        err.append(float(num / den))
    err = np.asarray(err)
    coarse = sj >= 4 * DT
    print(json.dumps({"error_profile": {
        "logN": p, "finest_scale": float(sj[0]),
        "err_finest": float(err[0]), "err_second": float(err[1]),
        "max_err_s_ge_4dt": float(err[coarse].max()),
        "n_scales_ge_4dt": int(coarse.sum())}}))


def main():
    sizes = [22, 23, 24]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(v) for v in a.split("=", 1)[1].split(",")]
        if a.startswith("--child="):
            surface, p = a.split("=", 1)[1].rsplit(":", 1)
            if surface == "errprofile":
                child_errprofile(int(p))
            else:
                child(surface, int(p))
            return

    sj = _scales()
    from pycwt_tpu.ops.overlap import halo_samples

    print(json.dumps({"grid": {"S": S, "s0": 2.0, "dj": 0.125,
                               "smax": float(sj.max()),
                               "halo": halo_samples(float(sj.max()), DT)}}),
          flush=True)
    jobs = [(srf, p) for p in sizes for srf in SURFACES]
    jobs.append(("errprofile", min(sizes)))
    for surface, p in jobs:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--child={surface}:{p}"],
                capture_output=True, text=True, timeout=1200,
                env=os.environ, cwd=ROOT)
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
                else None
            if out.returncode == 0 and line:
                print(line, flush=True)
            else:
                tail = (out.stderr or "")[-200:].replace("\n", " ")
                print(json.dumps({"surface": surface, "logN": p,
                                  "error": tail}), flush=True)
        except Exception as e:
            print(json.dumps({"surface": surface, "logN": p,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
