"""Tracing / profiling / observability hooks.

The reference's only observability is a tqdm bar on the MC loop
(``wavelet.py:609``).  Here: a ``jax.profiler`` trace context, wall-clock
phase timers with achieved-throughput accounting (the BASELINE.json
``sample-scales/s/chip`` counter), and structured logging of shard layouts.
"""
from __future__ import annotations

import contextlib
import dataclasses
import logging
import time

import jax

logger = logging.getLogger("pycwt_tpu")

__all__ = ["trace", "PhaseTimer", "log_sharding", "logger"]


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Wrap a region in a ``jax.profiler`` trace (no-op when log_dir is None).

    Open the result with TensorBoard / xprof to see per-kernel timings of the
    CWT pipeline (the FFT custom-calls and the Pallas ``fused_cwt`` kernels).
    """
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@dataclasses.dataclass
class PhaseTimer:
    """Accumulates per-phase wall time and derived throughput counters."""

    phases: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, samples: int = 0, scales: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            acc = self.phases.setdefault(name, {"seconds": 0.0,
                                                "sample_scales": 0})
            acc["seconds"] += dt
            acc["sample_scales"] += samples * scales

    def report(self) -> dict:
        out = {}
        for name, acc in self.phases.items():
            entry = {"seconds": acc["seconds"]}
            if acc["sample_scales"] and acc["seconds"] > 0:
                entry["sample_scales_per_s"] = acc["sample_scales"] / acc["seconds"]
            out[name] = entry
        return out

    def log(self):
        for name, entry in self.report().items():
            logger.info("phase %-20s %8.3f s%s", name, entry["seconds"],
                        f"  ({entry['sample_scales_per_s']:.3e} sample-scales/s)"
                        if "sample_scales_per_s" in entry else "")


def log_sharding(name: str, x):
    """Log the sharding layout of a jax array (shard shapes per device)."""
    try:
        sh = x.sharding
        logger.info("%s: shape=%s sharding=%s shard_shape=%s", name, x.shape,
                    sh, sh.shard_shape(x.shape))
    except (AttributeError, ValueError):
        logger.info("%s: shape=%s (no sharding info)", name, getattr(x, "shape", None))
