"""Can the retirement scatter-ADD become a unique-slot scatter-SET?

The round-3 gather microbench measured the hybrid's per-iteration
image scatter-add at ~40 ns/row (read-modify-write serialization)
while row scatter-SETs fuse to ~2-8 ns/row. Every work unit retires
exactly once, so a (n_pix * spp, 3) slot array indexed by work-unit
id takes SETs with genuinely unique indices (non-retiring lanes point
out of bounds, mode="drop"), and one dense (n_rows, n_pix, 3) sum at
dispatch end replaces all the adds.

    python scripts/microbench_scatter_set.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

POOL = 1 << 17
N_PIX = 720_000
SPP = 16
N_UNITS = N_PIX * SPP


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rg = np.random.default_rng(0)
    pix = jnp.asarray(rg.integers(0, N_PIX, POOL).astype(np.int32))
    unit = jnp.asarray(
        (rg.permutation(N_UNITS)[:POOL]).astype(np.int32)
    )  # unique slots
    term = jnp.asarray(rg.random(POOL) < 0.8)
    vals = jnp.asarray(rg.random((POOL, 3), dtype=np.float32))
    reps = 64

    def run_add(acc, pix, term, vals):
        def body(acc, _):
            idx = jnp.where(term, pix, N_PIX)
            v = jnp.where(term[:, None], vals, 0.0)
            return acc.at[idx].add(v), None
        acc, _ = jax.lax.scan(body, acc, None, length=reps)
        return jnp.sum(acc[:8])

    def run_set(slots, unit, term, vals):
        def body(slots, _):
            idx = jnp.where(term, unit, N_UNITS + 7)  # OOB -> dropped
            slots = slots.at[idx].set(
                vals, mode="drop", unique_indices=True
            )
            return slots, None
        slots, _ = jax.lax.scan(body, slots, None, length=reps)
        return jnp.sum(slots[:8])

    def run_set_final(slots, unit, term, vals):
        """set + the one dense per-dispatch reduction, to price the
        whole protocol"""
        def body(slots, _):
            idx = jnp.where(term, unit, N_UNITS + 7)
            slots = slots.at[idx].set(
                vals, mode="drop", unique_indices=True
            )
            return slots, None
        slots, _ = jax.lax.scan(body, slots, None, length=reps)
        img = jnp.sum(slots.reshape(SPP, N_PIX, 3), axis=0)
        return jnp.sum(img[:8])

    print(f"device: {jax.devices()[0]}", flush=True)
    acc0 = jnp.zeros((N_PIX + 1, 3), jnp.float32)
    slots0 = jnp.zeros((N_UNITS, 3), jnp.float32)

    t = timeit(jax.jit(run_add), acc0, pix, term, vals)
    print(f"scatter-add (pool,3)->(n_pix+1,3):        "
          f"{t/reps*1e3:7.3f} ms/iter  {t/reps/POOL*1e9:5.1f} ns/row",
          flush=True)
    t = timeit(jax.jit(run_set), slots0, unit, term, vals)
    print(f"unique scatter-set (pool,3)->(n_units,3): "
          f"{t/reps*1e3:7.3f} ms/iter  {t/reps/POOL*1e9:5.1f} ns/row",
          flush=True)
    t = timeit(jax.jit(run_set_final), slots0, unit, term, vals)
    print(f"  + one (spp,n_pix,3) sum per {reps} iters: "
          f"{t/reps*1e3:7.3f} ms/iter amortized", flush=True)


if __name__ == "__main__":
    main()
