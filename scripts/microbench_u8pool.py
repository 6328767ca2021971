"""u8/u16 texel-pool gather microbench (VERDICT round-3 ask 3).

The biplane floor decomposition attributes ~85 ns/path to random texel
gathers from a 450 MB f32 pool + the image scatter-add; the round-3
gather microbench showed ns/row grows with pool size (23 -> 41 ns from
4 MB to 448 MB). Question: does an integer pool (4x / 2x fewer HBM
bytes) make the same slice-3 gather cheaper, and what does the
post-gather convert cost?

Measures, at the biplane texel count (113M texels):
  f32 pool (452 MB), u16 (226 MB), u8 (113 MB) — slice-3 gather +
  convert-to-f32, 128k rows; plus a small (sky-sized) pool of each.
"""
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

POOL = 1 << 17  # lanes


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rg = np.random.default_rng(0)
    base = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(1.0))
    print(f"dispatch baseline: {base*1e3:.2f} ms", flush=True)

    for texels in (113_246_208, 1 << 20):
        idx = jnp.asarray(rg.integers(0, texels - 3, POOL).astype(np.int32))
        for dt_name, dt in (("f32", np.float32), ("u16", np.uint16),
                            ("u8", np.uint8)):
            if dt is np.float32:
                pool_arr = jnp.asarray(
                    rg.uniform(0, 1, texels).astype(np.float32))
            else:
                pool_arr = jnp.asarray(
                    rg.integers(0, np.iinfo(dt).max, texels, dtype=dt))

            def g(c, pool_arr, idx):
                i = (idx + c[:, 0].astype(jnp.int32) % 3) % (texels - 3)
                out = jax.lax.gather(
                    pool_arr, i[:, None],
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,)),
                    slice_sizes=(3,),
                    mode=jax.lax.GatherScatterMode.CLIP)
                if out.dtype == jnp.uint8:
                    out = out.astype(jnp.float32) / np.float32(255.0)
                elif out.dtype == jnp.uint16:
                    out = out.astype(jnp.float32) / np.float32(65535.0)
                return out

            def run(c, pool_arr, idx):
                out, _ = jax.lax.scan(
                    lambda cc, _: (g(cc, pool_arr, idx), None), c, None,
                    length=32)
                return jnp.sum(out[..., :1])

            f = jax.jit(run)
            t = (timeit(f, jnp.zeros((POOL, 3)), pool_arr, idx) - base) / 32
            mb = texels * np.dtype(dt).itemsize / 1e6
            print(f"slice3-gather {dt_name} pool {mb:7.0f} MB: "
                  f"{t*1e3:7.3f} ms ({t/POOL*1e9:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
