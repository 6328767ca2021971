"""Time each piece of one wavefront iteration on a mesh scheme at the
real pool shape, to localize the ~50 ms/iteration cost the aggregate
profile can't split (the whole loop shows up as one while op).

    python scripts/microbench_wavefront.py [scheme] [pool]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.models.scene import build_scene
from raytrace_tpu.ops import raygen, rng
from raytrace_tpu.ops import vec as v3
from raytrace_tpu.ops.vec import Vec3
from raytrace_tpu.render.integrator import (
    IntegratorParams, _bounce_step, closest_hit, sample_cubemap,
)
from raytrace_tpu.render.renderer import camera_to_arrays

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
pool = int(sys.argv[2]) if len(sys.argv) > 2 else 131072

scheme = load_scheme(scheme_path)
W, H = scheme.render_info.width, scheme.render_info.height
scene = build_scene(scheme)
cam = camera_to_arrays(build_camera(scheme.cam, W, H))
rr = scheme.render_info.rad_info.russ_roull_info
# mesh_kernel=True = the product configuration on TPU (renderer.py);
# the default XLA cluster path (lax.cond per cluster) measured 332 ms
# per 128k-lane closest_hit and its full bounce step was too large to
# compile through the axon tunnel (HTTP 413) — not the product path.
params = IntegratorParams(
    assured_depth=rr.assured_depth,
    max_thres=jnp.float32(rr.max_thres),
    mesh_kernel=jax.default_backend() != "cpu",
)

key = np.random.default_rng(0)
x = jnp.asarray(key.integers(0, W, pool, dtype=np.int32))
y = jnp.asarray(key.integers(0, H, pool, dtype=np.int32))
state0 = rng.init_state(x, y, W, H, jnp.int32(0))
state0, ro, rd = raygen.generate(state0, x, y, cam)
zeros = jnp.zeros((pool,), jnp.float32)
ones = jnp.ones((pool,), jnp.float32)
st = dict(
    ro=ro, rd=rd, L=Vec3(zeros, zeros, zeros), ci=Vec3(ones, ones, ones),
    inten=ones, rng=state0, active=jnp.ones((pool,), bool),
    bounce=jnp.zeros((pool,), jnp.int32),
    miss_d=Vec3(zeros, zeros, ones), miss_w=Vec3(zeros, zeros, zeros),
)
n_pix = W * H
pix = y * W + x


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)  # axon: block_until_ready does not fence
    t0 = time.time()
    for _ in range(10):
        out = fn(*args)
    np.asarray(out)  # axon: block_until_ready does not fence
    print(f"{name:28s} {(time.time() - t0) / 10 * 1e3:8.2f} ms")
    return out


# 1. closest_hit alone
f_ch = jax.jit(lambda ro, rd, act: closest_hit(scene, params, ro, rd, active=act))
timeit("closest_hit", f_ch, st["ro"], st["rd"], st["active"])

# 2. full bounce step
f_b = jax.jit(lambda s: _bounce_step(scene, params, dict(s)))
timeit("bounce_step (full)", f_b, st)

# 3. rng draws
f_rng = jax.jit(lambda s: rng.next_f32_n(s, 8))
timeit("rng 8 draws", f_rng, state0)

# 4. assign-style: two cumsums + raygen + where-merge
def assign_like(active, q):
    need = ~active
    ranks = jnp.cumsum(need.astype(jnp.int32))
    ids = q + ranks - 1
    ids_c = jnp.clip(ids, 0, n_pix - 1)
    xx = ids_c % W
    yy = ids_c // W
    s0 = rng.init_state(xx, yy, W, H, jnp.int32(1))
    s0, ro0, rd0 = raygen.generate(s0, xx, yy, cam)
    return ro0.x + rd0.x, s0

f_as = jax.jit(assign_like)
timeit("assign (cumsum+raygen)", f_as, st["active"], jnp.int32(0))

# 5. scatter-add into the image rows
def scat(idx, val):
    acc = jnp.zeros((n_pix + 1,), jnp.float32)
    return (acc.at[idx].add(val), acc.at[idx].add(val * 2), acc.at[idx].add(val * 3))

f_sc = jax.jit(scat)
timeit("scatter-add x3", f_sc, pix, zeros + 1.0)

# 6. cubemap resolve full-width
if scene.has_cubemap:
    f_cm = jax.jit(lambda d: sample_cubemap(scene, d))
    timeit("cubemap gather (full)", f_cm, st["rd"])
