"""Attribute the wavefront per-iteration cost on hardware by ablating
stages (shape-preserving stubs — images are wrong, timings are the
point): baseline, -scatter, -sky, -assign, -all three. The residual of
-all is _bounce_step (closest hit + shade) + loop overhead.

    python scripts/ablate_wavefront.py [scheme] [spp]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.render import wavefront as wf

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16

scheme = load_scheme(scheme_path)
r = Renderer(scheme, use_wavefront=True, use_fused=False, use_mesh_fused=False)
assert r.use_wavefront
scene_dev = jax.device_put(r.scene)
n_work = r.width * r.height * spp

for ablate in ("", "scatter", "sky", "assign", "scatter,sky,assign"):
    step = jax.jit(partial(
        wf.wavefront_batch, width=r.width, height=r.height, pool=r.wf_pool,
        return_stats=True, ablate=ablate,
    ))
    t0 = time.time()
    img, stats = step(scene_dev, r.cam_arrays, r.params, r._wxs, r._wys,
                      jnp.int32(0), jnp.int32(spp))
    np.asarray(img)  # real fence: device->host readback
    tc = time.time() - t0
    t0 = time.time()
    img, stats = step(scene_dev, r.cam_arrays, r.params, r._wxs, r._wys,
                      jnp.int32(0), jnp.int32(spp))
    np.asarray(img)
    dt = time.time() - t0
    iters = int(stats["iterations"])
    print(
        f"ablate={ablate or 'none':20s} {dt:6.2f}s  {iters:4d} iters  "
        f"{dt/iters*1e3:6.1f} ms/iter  {n_work/dt/1e6:6.3f} Mpaths/s  "
        f"(compile {tc:.0f}s)",
        flush=True,
    )
