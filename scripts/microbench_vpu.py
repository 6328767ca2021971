"""VPU op-cost microbench: decides round-2 perf directions with tiny,
cheap-to-compile kernels instead of restructuring the big fused kernel
on speculation.

Questions answered (each is one small pallas_call):
  1. Is packed bf16 elementwise arithmetic ~2x f32 on this chip's VPU?
     (drives VERDICT item 6 — bf16 intersection pre-pass: worth it or
     written off)
  2. sqrt / rsqrt cost relative to mul chains (the fused kernel issues
     13 sphere sqrts + ~10 normalizes per bounce).
  3. uint32 RNG draw cost: PCG (2 mults + variable shift, the round-1
     generator) vs Weyl-add + one-mult murmur finalizer (the proposed
     cheaper stream) vs hw prng_random_bits.

Method: each kernel loops `reps` times over a resident VMEM block
doing DEPTH dependent ops per rep. Each variant is timed at reps=R and
reps=4R and the SLOPE (t4-t1)/(3R*DEPTH*lanes) gives the per-op cost
with fixed dispatch overhead cancelled; BOTH raw times are printed so
a non-linear pair (loop eliminated / overhead-dominated) is visible
instead of silently producing nonsense — the round-2 version printed
only the slope and its rep counts timed ~equal, which went unnoticed.
The dependence chain defeats dead-code elimination.

ANSWERS (v5e, 2026-08-20, raw numbers in BENCH_NOTES.md round 3):
bf16 fma-chain = 0.91x f32 (NO packed-bf16 VPU gain on this chip) —
the bf16 intersection pre-pass is written off.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # f32 lanes per block: ROWS x 128
R1, R2 = 65536, 262144  # slope between these cancels dispatch overhead
DEPTH = 32
_U32 = jnp.uint32


def _time(fn, *args, n=3):
    # fence with a host readback: on the axon platform
    # block_until_ready returns before the device work completes
    # (measured round 3 — repeated fenced-by-block calls timed 0.1 ms
    # while np.asarray-fenced calls timed the real 105 ms), which is
    # what silently broke this script's round-2 numbers
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _slope(make_kernel, x):
    """Per-(lane*DEPTH*rep) op time via two-point slope. Returns
    (t1, t2, slope, ops_per_s); callers print t1/t2 so a broken pair
    (t2 !~ 4*t1) is visible."""
    ts = []
    for reps in (R1, R2):
        kernel = make_kernel(reps)
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        ts.append(_time(jax.jit(f), x))
    n_ops = ROWS * 128 * (R2 - R1) * DEPTH
    return ts[0], ts[1], ts[1] - ts[0], n_ops / max(ts[1] - ts[0], 1e-9)


def mul_chain(dtype):
    a = jnp.asarray(np.random.uniform(0.5, 1.5, (ROWS, 128)), dtype)

    def make(reps):
        def kernel(x_ref, o_ref):
            v = x_ref[:]
            c = (jnp.ones_like(v) * 1.0000001).astype(v.dtype)

            def body(_, v):
                for _ in range(DEPTH):
                    v = v * c + c
                return v

            o_ref[:] = jax.lax.fori_loop(0, reps, body, v)

        return kernel

    t1, t2, dt, ops_s = _slope(make, a)
    return t1, t2, ops_s * 2 / 1e12  # fma = 2 flop


def sqrt_chain(op):
    a = jnp.asarray(np.random.uniform(0.5, 1.5, (ROWS, 128)), jnp.float32)
    f = {"sqrt": jnp.sqrt, "rsqrt": jax.lax.rsqrt}[op]

    def make(reps):
        def kernel(x_ref, o_ref):
            v = x_ref[:]

            def body(_, v):
                for _ in range(DEPTH):
                    v = f(v + 1.0)
                return v

            o_ref[:] = jax.lax.fori_loop(0, reps, body, v)

        return kernel

    t1, t2, dt, ops_s = _slope(make, a)
    return t1, t2, ops_s / 1e12


def rng_chain(kind):
    a = jnp.asarray(
        np.random.randint(0, 2**31, (ROWS, 128), np.int64), jnp.uint32
    )

    def pcg(state):
        new = state * _U32(747796405) + _U32(2891336453)
        word = ((new >> ((new >> _U32(28)) + _U32(4))) ^ new) * _U32(277803737)
        out = (word >> _U32(22)) ^ word
        b24 = (out >> _U32(8)).astype(jnp.int32)
        return new, b24.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)

    def weyl(state):
        new = state + _U32(0x9E3779B9)
        w = new ^ (new >> _U32(16))
        w = w * _U32(0x7FEB352D)
        w = w ^ (w >> _U32(15))
        b24 = (w >> _U32(8)).astype(jnp.int32)
        return new, b24.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)

    step = {"pcg": pcg, "weyl": weyl}[kind]

    def make(reps):
        def kernel(x_ref, o_ref):
            s = x_ref[:]

            def body(_, carry):
                s, acc = carry
                for _ in range(DEPTH):
                    s, u = step(s)
                    acc = acc + u
                return s, acc

            s, acc = jax.lax.fori_loop(
                0, reps, body, (s, jnp.zeros(s.shape, jnp.float32))
            )
            o_ref[:] = s + acc.astype(jnp.int32).astype(jnp.uint32)

        return kernel

    t1, t2, dt, ops_s = _slope(make, a)
    return t1, t2, ops_s / 1e9


def hw_rng():
    a = jnp.zeros((ROWS, 128), jnp.uint32) + 7

    def make(reps):
        def kernel(x_ref, o_ref):
            pltpu.prng_seed(13)

            def body(_, acc):
                for _ in range(DEPTH):
                    bits = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), _U32)
                    b24 = (bits >> _U32(8)).astype(jnp.int32)
                    acc = acc + b24.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)
                return acc

            acc = jax.lax.fori_loop(0, reps, body, jnp.zeros(a.shape, jnp.float32))
            o_ref[:] = x_ref[:] + acc.astype(jnp.int32).astype(jnp.uint32)

        return kernel

    t1, t2, dt, ops_s = _slope(make, a)
    return t1, t2, ops_s / 1e9


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"device: {jax.devices()[0]}", flush=True)
    def raw(t1, t2):
        return f"t1 {t1*1e3:8.2f} ms  t4 {t2*1e3:8.2f} ms"

    for dt_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        t1, t2, tflops = mul_chain(dtype)
        print(f"fma-chain {dt_name:5s}: {raw(t1, t2)}  {tflops:6.3f} Tflop/s", flush=True)
    for op in ("sqrt", "rsqrt"):
        t1, t2, tops = sqrt_chain(op)
        print(f"{op:5s} chain    : {raw(t1, t2)}  {tops:6.3f} Top/s", flush=True)
    for kind in ("pcg", "weyl"):
        t1, t2, tdraw = rng_chain(kind)
        print(f"rng {kind:5s} draw : {raw(t1, t2)}  {tdraw:6.2f} Gdraw/s", flush=True)
    t1, t2, tdraw = hw_rng()
    print(f"rng hw    draw : {raw(t1, t2)}  {tdraw:6.2f} Gdraw/s", flush=True)


if __name__ == "__main__":
    main()
