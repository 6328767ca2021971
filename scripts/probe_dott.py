"""Probe: does Mosaic compile dot_general with a dim-0/dim-0
contraction (transposed-LHS matmul) on real TPU hardware?

The round-5 Woop table redesign stores the table as (8, 7*Tp) so the
minor (lane) dim is the long one — the old (6*Tp, 8) layout padded its
8-wide minor dim to 128 lanes in VMEM, a 16x waste that forced
MAX_TRIS = 2560. Chunked slices A_T (8, 7c) then need
R = dot_general(A_T, X, contracting ((0,), (0,))) -> (7c, N), i.e. a
transposed-LHS matmul. This probe checks (a) it compiles on hardware,
(b) values match numpy, (c) rough per-pass timing vs the old layout.
Fallback probed too: explicit jnp transpose of the slice.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 7
CHUNK = 64
N = 1024


def _kernel(x_ref, at_ref, o_ref, *, n_chunks, mode, prec):
    X = x_ref[...]  # (8, N)
    acc = jnp.zeros((1, N), jnp.float32)
    if prec == "3x":
        Xh = X.astype(jnp.bfloat16)
        Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)
        AT = at_ref[...]
        ATh = AT.astype(jnp.bfloat16)
        ATl = (AT - ATh.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(ci, acc):
        if mode == "dott":
            if prec == "3x":
                d = lambda a, b: jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                Ah = jax.lax.dynamic_slice(
                    ATh, (0, ci * ROWS * CHUNK), (8, ROWS * CHUNK))
                Al = jax.lax.dynamic_slice(
                    ATl, (0, ci * ROWS * CHUNK), (8, ROWS * CHUNK))
                R = d(Ah, Xh) + d(Ah, Xl) + d(Al, Xh)
            else:
                A = at_ref[:, pl.ds(ci * ROWS * CHUNK, ROWS * CHUNK)]
                R = jax.lax.dot_general(
                    A, X, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (7c, N)
        else:  # explicit transpose fallback
            A = at_ref[:, pl.ds(ci * ROWS * CHUNK, ROWS * CHUNK)]
            A = jnp.transpose(A, (1, 0))
            R = jax.lax.dot_general(
                A, X, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        return acc + jnp.sum(R, axis=0, keepdims=True) + jnp.min(
            R, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    o_ref[...] = jnp.broadcast_to(acc, o_ref.shape)


@functools.partial(jax.jit, static_argnames=("n_chunks", "mode", "prec",
                                             "interpret"))
def run(x, at, n_chunks, mode="dott", prec="highest", interpret=False):
    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, mode=mode, prec=prec),
        grid=(x.shape[0] // 8,),
        in_specs=[
            pl.BlockSpec((8, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(at.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), jnp.float32),
        interpret=interpret,
    )(x, at)


def main():
    on_cpu = jax.default_backend() == "cpu"
    print(f"device: {jax.devices()[0]}", flush=True)
    n_chunks = int(os.environ.get("NCH", "4"))
    Tp = n_chunks * CHUNK
    rng = np.random.default_rng(0)
    at = rng.normal(size=(8, ROWS * Tp)).astype(np.float32)
    x = rng.normal(size=(16, N)).astype(np.float32)

    # numpy reference
    ref = np.zeros((2, N), np.float32)
    for blk in range(2):
        Xb = x[blk * 8:(blk + 1) * 8]
        acc = np.zeros((1, N), np.float32)
        for ci in range(n_chunks):
            A = at[:, ci * ROWS * CHUNK:(ci + 1) * ROWS * CHUNK]
            R = A.T.astype(np.float64) @ Xb.astype(np.float64)
            acc = acc + R.sum(0, keepdims=True) + R.min(0, keepdims=True)
        ref[blk] = acc[0]  # compared against row blk*8 of out

    for mode in ("dott", "tr"):
        for prec in ("highest", "3x") if mode == "dott" else ("highest",):
            try:
                t0 = time.time()
                out = np.asarray(run(jnp.asarray(x), jnp.asarray(at),
                                     n_chunks, mode=mode, prec=prec,
                                     interpret=on_cpu))
                dt = time.time() - t0
                err = (np.abs(out[::8] - ref).max()
                       / (np.abs(ref).max() + 1e-9))
                print(f"{mode}/{prec}: OK compile {dt:.0f}s rel-err {err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"{mode}/{prec}: FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
