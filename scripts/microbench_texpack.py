"""Does packing RGB texels into one u32 word make the per-fetch
gather cheaper than the slice-3 u8 gather?

The hybrid's sky resolve + texture fetches ride _fetch_rgb: ONE
lax.gather with slice_sizes=(3,) on the flat u8 pool. The device
trace (round 5, biplane) shows XLA lowers that to THREE separate u8
gathers (fusion.22/23/24, ~11 ns/texel-row each) — the slice does not
coalesce. If one u32 gather (4 bytes, byte-unpacked after) costs the
same ~11 ns/row, the fetch drops to a third.

    python scripts/microbench_texpack.py
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
TEXELS = 24 << 20  # 24M texels ~ the biplane sky pool (75 MB u8)


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rep_run(fn, *args, reps=64):
    def run(c, *a):
        def body(c, _):
            r, g, b = fn(c, *a)
            return r + g + b, None
        out, _ = jax.lax.scan(body, c, None, length=reps)
        return jnp.sum(out[:8])
    return jax.jit(run), reps


def main():
    rg = np.random.default_rng(0)
    pool8_np = rg.integers(0, 256, 3 * TEXELS, dtype=np.uint8)
    pool8 = jnp.asarray(pool8_np)
    pool32 = jnp.asarray(
        pool8_np[0::3].astype(np.uint32)
        | (pool8_np[1::3].astype(np.uint32) << 8)
        | (pool8_np[2::3].astype(np.uint32) << 16)
    )
    idx = jnp.asarray(rg.integers(0, TEXELS, POOL).astype(np.int32))
    inv = jnp.float32(1.0 / 255.0)

    def slice3(c, pool8, idx):
        i = (idx + c[:POOL].astype(jnp.int32) % 3) % (TEXELS - 1)
        g = jax.lax.gather(
            pool8, (3 * i)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(3,), mode=jax.lax.GatherScatterMode.CLIP,
        ).astype(jnp.float32) * inv
        return g[:, 0], g[:, 1], g[:, 2]

    def packed32(c, pool32, idx):
        i = (idx + c[:POOL].astype(jnp.int32) % 3) % (TEXELS - 1)
        w = jnp.take(pool32, i, axis=0)
        r = (w & 0xFF).astype(jnp.float32) * inv
        g = ((w >> 8) & 0xFF).astype(jnp.float32) * inv
        b = ((w >> 16) & 0xFF).astype(jnp.float32) * inv
        return r, g, b

    print(f"device: {jax.devices()[0]}  pool {POOL} lanes, "
          f"{TEXELS >> 20}M texels", flush=True)
    for name, fn, args in (
        ("slice-3 u8 gather (current)", slice3, (pool8, idx)),
        ("packed u32 gather", packed32, (pool32, idx)),
    ):
        run, reps = rep_run(fn, *args)
        c0 = jnp.zeros((POOL,), jnp.float32)
        t = timeit(run, c0, *args)
        print(f"{name:32s} {t / reps * 1e3:7.3f} ms/iter  "
              f"{t / reps / POOL * 1e9:6.2f} ns/lane", flush=True)


if __name__ == "__main__":
    main()
