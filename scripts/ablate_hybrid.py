"""Attribute the hybrid (wavefront_mesh_fused) per-iteration cost on
hardware by stage ablation (shape-preserving stubs; timings only).

    python scripts/ablate_hybrid.py [scheme] [spp]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.render import fused_mesh as fm

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16

scheme = load_scheme(scheme_path)
r = Renderer(scheme, use_mesh_fused=True, use_fused=False)
assert r.use_mesh_fused
scene_dev = jax.device_put(r.scene)
n_work = r.width * r.height * spp

for ablate in ("", "sky", "dense_sky", "shade", "scatter", "assign", "sky,shade,scatter,assign"):
    step = jax.jit(
        partial(
            fm.wavefront_mesh_fused, width=r.width, height=r.height,
            pool=r.mf_pool, has_lens=False, hints=r._mhints,
        shade_width=r.mf_shade_width,
            return_stats=True, ablate=ablate,
        )
    )
    t0 = time.time()
    img, stats = step(r._mtables, r._mcam_vec, scene_dev, r.cam_arrays,
                      r.params, xs_tab=r._mxs, ys_tab=r._mys,
                      sample_base=jnp.int32(0), n_samples=jnp.int32(spp))
    np.asarray(img)
    tc = time.time() - t0
    t0 = time.time()
    img, stats = step(r._mtables, r._mcam_vec, scene_dev, r.cam_arrays,
                      r.params, xs_tab=r._mxs, ys_tab=r._mys,
                      sample_base=jnp.int32(0), n_samples=jnp.int32(spp))
    np.asarray(img)
    dt = time.time() - t0
    iters = int(stats["iterations"])
    pend = (
        f"  pend avg {int(stats['pend_sum'])/max(iters,1)/r.mf_pool:.3f}"
        f" max {int(stats['pend_max'])/r.mf_pool:.3f}"
        if "pend_sum" in stats else ""
    )
    print(
        f"ablate={ablate or 'none':26s} {dt:6.2f}s  {iters:4d} iters  "
        f"{dt/max(iters,1)*1e3:6.1f} ms/iter  {n_work/dt/1e6:6.3f} Mpaths/s  "
        f"(compile {tc:.0f}s){pend}",
        flush=True,
    )
