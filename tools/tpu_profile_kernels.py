#!/usr/bin/env python
"""Time fused-CWT kernel A and kernel B separately on the TPU (chained loops)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pycwt_tpu as wt
from pycwt_tpu.ops import pallas_fft as pf

mother = wt.Morlet(6)
nfft = 1 << 20
dt = 1.0
S = 64
Ablk = Cblk = 256
R1, R2 = pf._nfft_factors(nfft)
consts2 = pf._dft_tables(R2)
consts1 = pf._dft_tables(R1)

a_idx = np.arange(R2, dtype=np.float64)
c_idx = np.arange(R1, dtype=np.float64)
twf = np.exp(2j * np.pi * np.outer(a_idx, c_idx) / nfft)
twr = jnp.asarray(twf.real, jnp.float32)
twi = jnp.asarray(twf.imag, jnp.float32)

rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal((R2, R1)), jnp.float32)
xi = jnp.asarray(rng.standard_normal((R2, R1)), jnp.float32)
scales = jnp.asarray(2.0 * 2 ** (np.arange(S) * 0.25), jnp.float32)


def table_inputs(consts):
    (f1r, f1i), (wr_, wi_), (f2r, f2i), r1, r2, G1, G2 = consts
    arrays = [jnp.asarray(a) for a in (f1r, f1i, wr_, wi_, f2r, f2i)]
    specs = [pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim) for a in arrays]
    return arrays, specs, r1, r2, G1, G2


tab2, tab2_specs, r1b, r2b, G1b, G2b = table_inputs(consts2)
tab1, tab1_specs, r1a, r2a, G1a, G2a = table_inputs(consts1)

kern_a = pf._make_kernel_a(mother, nfft, dt, R1, R2, Ablk, r1b, r2b, G1b, G2b)
t_shape = jax.ShapeDtypeStruct((S, R1, R2), jnp.float32)
grid_spec_a = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(R1 // Ablk, S),
    in_specs=[pl.BlockSpec((R2, Ablk), lambda j, s, *r: (0, j))] * 4 + tab2_specs,
    out_specs=[pl.BlockSpec((1, Ablk, R2), lambda j, s, *r: (s, j, 0))] * 2,
)
run_a = jax.jit(lambda sc, xr, xi: pl.pallas_call(
    kern_a, grid_spec=grid_spec_a, out_shape=[t_shape, t_shape],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)(sc, xr, xi, twr, twi, *tab2))

kern_b = pf._make_kernel_b(R1, R2, Cblk, r1a, r2a, G1a, G2a, 1.0 / nfft, True)
L = min(Cblk, 128)
run_b = jax.jit(lambda tr, ti: pl.pallas_call(
    kern_b, grid=(S, R2 // Cblk),
    in_specs=[pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c))] * 2 + tab1_specs,
    out_specs=[pl.BlockSpec((1, 8, L), lambda s, c: (s, 0, 0))],
    out_shape=[jax.ShapeDtypeStruct((S, 8, L), jnp.float32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)(tr, ti, *tab1)[0])


def chain_time(fn, args, iters_pair=(5, 15), salt_idx=[0]):
    def chained(iters, *args):
        def body(i, carry):
            # carry feeds the inputs so iterations can't be hoisted/overlapped
            out = fn(*[a + carry for a in args])
            s = jnp.sum(out[0][0]) if isinstance(out, (tuple, list)) else jnp.sum(out[0])
            return carry + s * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    times = {}
    for it in iters_pair:
        f = jax.jit(functools.partial(chained, it))
        salt_idx[0] += 1
        salted = [a * (1.0 + jnp.float32(salt_idx[0] * 1e-9)) for a in args]
        jax.block_until_ready(f(*salted))
        salt_idx[0] += 1
        salted = [a * (1.0 + jnp.float32(salt_idx[0] * 1e-9)) for a in args]
        t0 = time.perf_counter()
        jax.block_until_ready(f(*salted))
        times[it] = time.perf_counter() - t0
    lo, hi = iters_pair
    return (times[hi] - times[lo]) / (hi - lo)


ta = chain_time(lambda xr, xi: run_a(scales, xr, xi), [xr, xi])
print("kernel A per-iter: %.2f ms" % (ta * 1e3), flush=True)

tr0, ti0 = run_a(scales, xr, xi)
tb = chain_time(run_b, [tr0, ti0])
print("kernel B per-iter (power): %.2f ms" % (tb * 1e3), flush=True)
