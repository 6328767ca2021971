"""Random-access op-cost microbench: gathers, scatter-adds, cumsum —
the XLA residue ops every wavefront/hybrid iteration pays per path
(BENCH_NOTES round 3). Quantifies, on hardware:

  1. texel-style gather: 128k random (slice-3) rows from flat f32
     pools of several sizes (does pool size / HBM locality matter?)
  2. one slice-3 gather vs three element gathers (the _fetch_rgb
     design choice, integrator.py)
  3. row gather from a (N, 32) packed matrix vs 17 separate element
     gathers of (N,) arrays — the single-matrix lane-carry question
     (VERDICT round-2 next-round item 1)
  4. scatter-add of (pool, 3) into random rows of a (n_pix+1, 3)
     accumulator (the retirement scatter)
  5. i32 cumsum over the pool (the refill rank prefix-sum)

Method: jit each op with donated dummy dependence, time fenced by
np.asarray readback of a small reduction (axon: block_until_ready
does not fence), subtract a no-op baseline dispatch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pins 'axon,cpu'
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

POOL = int(os.environ.get("GB_POOL", 1 << 17))  # lane pool
N_PIX = 1216 * 608


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"device: {jax.devices()[0]}, pool={POOL}", flush=True)
    rg = np.random.default_rng(0)

    # baseline dispatch+readback cost (scalar passthrough)
    base = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(1.0))
    print(f"dispatch+readback baseline: {base*1e3:.2f} ms", flush=True)

    def rep(fn, *args, reps=32):
        """Run the op `reps` times with a carried dependence so device
        time dominates the fixed dispatch cost."""
        def body(c, _):
            return fn(c, *args), None

        def run(c, *args):
            out, _ = jax.lax.scan(lambda c, _: (fn(c, *args), None), c,
                                  None, length=reps)
            return jnp.sum(out[..., :1])

        return jax.jit(run), reps

    # --- 1/2: texel gathers ---
    mbs = tuple(int(x) for x in os.environ.get("GB_MBS", "4,64,448").split(","))
    for mb in mbs:
        T = mb * (1 << 20) // 4
        pool_arr = jnp.asarray(rg.uniform(0, 1, T).astype(np.float32))
        idx = jnp.asarray(rg.integers(0, T - 3, POOL).astype(np.int32))

        def g_slice(c, pool_arr, idx):
            i = (idx + c[:, 0].astype(jnp.int32) % 3) % (T - 3)
            out = jax.lax.gather(
                pool_arr, i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(3,),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
            return out

        f, reps = rep(g_slice, pool_arr, idx)
        t = (timeit(f, jnp.zeros((POOL, 3)), pool_arr, idx) - base) / reps
        print(f"slice3-gather {mb:4d}MB pool: {t*1e3:7.3f} ms "
              f"({t/POOL*1e9:6.1f} ns/row, {POOL/t/1e6:7.1f} Mrow/s)", flush=True)

        if mb == mbs[-1]:
            def g_elem(c, pool_arr, idx):
                i = (idx + c[:, 0].astype(jnp.int32) % 3) % (T - 3)
                a = jnp.take(pool_arr, i, mode="clip")
                b = jnp.take(pool_arr, i + 1, mode="clip")
                d = jnp.take(pool_arr, i + 2, mode="clip")
                return jnp.stack([a, b, d], -1)

            f, reps = rep(g_elem, pool_arr, idx)
            t = (timeit(f, jnp.zeros((POOL, 3)), pool_arr, idx) - base) / reps
            print(f"3x elem-gather  {mb}MB pool: {t*1e3:7.3f} ms "
                  f"({t/POOL/3*1e9:6.1f} ns/elem)", flush=True)

    # --- 3: packed-matrix row gather vs 17 element gathers ---
    mat = jnp.asarray(rg.uniform(0, 1, (POOL, 32)).astype(np.float32))
    cols = [jnp.asarray(rg.uniform(0, 1, POOL).astype(np.float32)) for _ in range(17)]
    cw = POOL // 4
    lane_idx = jnp.asarray(rg.integers(0, POOL, cw).astype(np.int32))

    def g_mat(c, mat, lane_idx):
        i = (lane_idx + c[:, 0].astype(jnp.int32) % 2) % POOL
        return jnp.take(mat, i, axis=0)

    f, reps = rep(g_mat, mat, lane_idx)
    t = (timeit(f, jnp.zeros((cw, 32)), mat, lane_idx) - base) / reps
    print(f"row-gather (pool,32) cw={cw}: {t*1e3:7.3f} ms "
          f"({t/cw*1e9:6.1f} ns/row)", flush=True)

    def g_17(c, lane_idx, *cols):
        i = (lane_idx + c[:, 0].astype(jnp.int32) % 2) % POOL
        return jnp.stack([jnp.take(col, i) for col in cols], -1)

    f17 = jax.jit(lambda c, lane_idx, *cols: jnp.sum(
        jax.lax.scan(lambda cc, _: (g_17(cc, lane_idx, *cols)[:, :17], None),
                     c, None, length=32)[0][..., :1]))
    t = (timeit(f17, jnp.zeros((cw, 17)), lane_idx, *cols) - base) / 32
    print(f"17x elem-gather     cw={cw}: {t*1e3:7.3f} ms", flush=True)

    # scatter halves: matrix row-scatter vs 17 element scatters
    upd = jnp.asarray(rg.uniform(0, 1, (cw, 32)).astype(np.float32))

    def s_mat(c, upd, lane_idx):
        i = (lane_idx + c[:cw, 0].astype(jnp.int32) % 2) % POOL
        return c.at[i].set(upd, mode="drop")

    f = jax.jit(lambda c, upd, lane_idx: jnp.sum(
        jax.lax.scan(lambda cc, _: (s_mat(cc, upd, lane_idx), None),
                     c, None, length=32)[0][..., :1]))
    t = (timeit(f, mat + 0.0, upd, lane_idx) - base) / 32
    print(f"row-scatter (pool,32) cw={cw}: {t*1e3:7.3f} ms", flush=True)

    def s_17(cs, upd, lane_idx):
        i = (lane_idx + cs[0][:cw].astype(jnp.int32) % 2) % POOL
        return tuple(col.at[i].set(upd[:, k], mode="drop")
                     for k, col in enumerate(cs))

    f = jax.jit(lambda cs, upd, lane_idx: jnp.sum(
        jax.lax.scan(lambda cc, _: (s_17(cc, upd, lane_idx), None),
                     cs, None, length=32)[0][0][:1]))
    t = (timeit(f, tuple(c + 0.0 for c in cols), upd, lane_idx) - base) / 32
    print(f"17x elem-scatter      cw={cw}: {t*1e3:7.3f} ms", flush=True)

    # --- 4: retirement scatter-add ---
    acc = jnp.zeros((N_PIX + 1, 3), jnp.float32)
    pix = jnp.asarray(rg.integers(0, N_PIX, POOL).astype(np.int32))
    vals = jnp.asarray(rg.uniform(0, 1, (POOL, 3)).astype(np.float32))

    def sc_add(acc, pix, vals):
        return acc.at[pix].add(vals)

    f = jax.jit(lambda acc, pix, vals: jnp.sum(
        jax.lax.scan(lambda a, _: (sc_add(a, pix, vals), None),
                     acc, None, length=32)[0][:1]))
    t = (timeit(f, acc, pix, vals) - base) / 32
    print(f"scatter-add (pool,3)->({N_PIX}+1,3): {t*1e3:7.3f} ms", flush=True)

    # --- 5: refill cumsum ---
    flags = jnp.asarray(rg.integers(0, 2, POOL).astype(np.int32))

    def csum(c, flags):
        r = jnp.cumsum(flags + c[0, 0].astype(jnp.int32) % 2)
        return r.astype(jnp.float32)[:, None] * jnp.ones((1, 1))

    f = jax.jit(lambda c, flags: jnp.sum(
        jax.lax.scan(lambda cc, _: (csum(cc, flags), None),
                     c, None, length=32)[0][:1]))
    t = (timeit(f, jnp.zeros((POOL, 1)), flags) - base) / 32
    print(f"i32 cumsum pool: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
