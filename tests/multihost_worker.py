"""Worker for the 2-process multi-host test (run via test_multihost.py).

Each process: initialize the distributed runtime, build a global mesh over
both processes' CPU devices, run the sharded MC histogram with a psum over
'mc', and verify the cache-broadcast path of wct_significance.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

coordinator = sys.argv[1]
process_id = int(sys.argv[2])

jax.distributed.initialize(coordinator_address=coordinator, num_processes=2,
                           process_id=process_id)

import numpy as np
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import DEFAULT
from pycwt_tpu.parallel import MeshSpec, make_mesh, sharded_mc_histogram
from pycwt_tpu.transform import build_scale_grid

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 per process

N0, dt = 128, 0.5
grid = build_scale_grid(N0, dt, dj=1 / 4)
nfft = DEFAULT.fft_length(N0)
coi = np.linspace(0, 20, N0)
period = 1.0 / grid.freqs
outsidecoi = period[:, None] <= coi[None, :]

mesh = make_mesh(MeshSpec(mc=4))
hist = sharded_mc_histogram(
    mesh, jax.random.PRNGKey(0), jnp.asarray(grid.sj, jnp.float32),
    outsidecoi, dt, mother=wt.Morlet(6), nfft=nfft, dj=1 / 4,
    per_device_batch=1, n=N0, al1=0.5, al2=0.5,
)
total = float(jnp.sum(hist).addressable_data(0)) if hasattr(jnp.sum(hist), "addressable_data") else float(np.asarray(jnp.sum(hist)))
expected = 4 * outsidecoi.sum()
assert abs(total - expected) < 0.5, (total, expected)

# host broadcast
from pycwt_tpu.parallel.distributed import host_broadcast_array

val = np.array([42.0 + process_id]) if process_id == 0 else np.array([-1.0])
out = host_broadcast_array(val)
assert out[0] == 42.0, out

print(f"MULTIHOST_OK process={process_id}", flush=True)
