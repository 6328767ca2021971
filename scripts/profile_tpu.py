"""Probe steady-state TPU throughput of the sample-batch step on the
walled scene at a configurable size. Separates compile from execute."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _inline_walled_scheme
from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.models.scene import build_scene
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
H = int(sys.argv[2]) if len(sys.argv) > 2 else 600
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 50
SPD = int(sys.argv[4]) if len(sys.argv) > 4 else 1
MAXB = int(sys.argv[5]) if len(sys.argv) > 5 else 40

print("devices:", jax.devices(), flush=True)
scheme = _inline_walled_scheme(W, H, assured=5)
scene = jax.device_put(build_scene(scheme))
cam = camera_to_arrays(build_camera(scheme.cam, W, H))
params = IntegratorParams(assured_depth=5, max_bounces=MAXB)
flat = np.arange(W * H, dtype=np.int32)
x_idx = jnp.asarray(flat % W)
y_idx = jnp.asarray(flat // W)

step = jax.jit(
    lambda sc, c, xs, ys, base, n: sample_batch(
        sc, c, params, W, H, xs, ys, base, n, samples_per_dispatch=SPD
    )
)

t0 = time.time()
out = step(scene, cam, x_idx, y_idx, jnp.int32(0), jnp.int32(1))
np.asarray(out)  # axon: block_until_ready does not fence
print(f"compile+first: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
out = step(scene, cam, x_idx, y_idx, jnp.int32(1), jnp.int32(SPP))
np.asarray(out)  # axon: block_until_ready does not fence
dt = time.time() - t0
paths = W * H * SPP
print(f"steady: {dt:.3f}s for {SPP} spp -> {paths/dt/1e6:.1f} Mpaths/s", flush=True)
print("mean:", np.asarray(out).mean(axis=0) / SPP, flush=True)
