"""Sweep the hybrid driver's shade_width / retire mode on hardware.

    python scripts/sweep_hybrid.py [scheme] [spp]
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
from raytrace_tpu.render import fused_mesh as fm

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16

scheme = load_scheme(scheme_path)
r = Renderer(scheme, use_mesh_fused=True, use_fused=False)
assert r.use_mesh_fused
scene_dev = jax.device_put(r.scene)
n_work = r.width * r.height * spp
pool = r.mf_pool
args = (r._mtables, r._mcam_vec, scene_dev, r.cam_arrays, r.params)
kw = dict(xs_tab=r._mxs, ys_tab=r._mys, sample_base=jnp.int32(0),
          n_samples=jnp.int32(spp))

import json
configs = json.loads(os.environ.get(
    "SWEEP_CONFIGS", '[[4, ""], [2, ""], [4, "dense_shade"]]'))
# entries: [cw_divisor, ablate] or [cw_divisor, ablate, compact_lanes]
configs = [
    (pool // int(c[0]) if int(c[0]) else pool, c[1],
     bool(c[2]) if len(c) > 2 else True)
    for c in configs
]
# chunk-length sweep (round 3): SWEEP_SPLS="1,4,8" crosses each config
spls = [int(s) for s in os.environ.get("SWEEP_SPLS", "1").split(",")]
configs = [(cw, ab, cp, s) for s in spls for (cw, ab, cp) in configs]

ref_mean = None
for cw, ablate, compact, spl in configs:
    step = jax.jit(partial(
        fm.wavefront_mesh_fused, width=r.width, height=r.height,
        pool=pool, has_lens=False, hints=r._mhints, return_stats=True,
        shade_width=cw, ablate=ablate, spl=spl, compact_lanes=compact,
    ))
    t0 = time.time()
    img, stats = step(*args, **kw)
    np.asarray(img); jax.block_until_ready(stats)
    tc = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        img, stats = step(*args, **kw)
        np.asarray(img); jax.block_until_ready(stats)
        best = min(best, time.time() - t0)
    iters = int(stats["iterations"])
    mean = np.asarray(img).sum(0) / (r.width * r.height * spp)
    if ref_mean is None:
        ref_mean = mean
    drift = np.abs(mean - ref_mean).max()
    print(
        f"cw={cw} ({pool//cw}x) spl={spl} compact={int(compact)} "
        f"ablate='{ablate}': compile {tc:.0f}s, "
        f"{best:.2f}s = {best/iters*1e3:.1f} ms/iter x {iters}, "
        f"pend avg {int(stats['pend_sum'])/max(iters,1)/pool:.3f}, "
        f"{n_work/best/1e6:.2f} Mpaths/s, mean drift {drift:.2e}",
        flush=True,
    )
