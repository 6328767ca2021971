"""Dump the optimized HLO of the hybrid step and summarize the named
ops the device trace blames (cond.*/fusion.*): what each computes and
its operand shapes.

    python scripts/dump_hybrid_hlo.py [op_name ...]
"""
import os
import re
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.render import fused_mesh as fm

scheme = load_scheme("/root/reference/schemes/biplane.yml")
r = Renderer(scheme, use_mesh_fused=True, use_fused=False)
scene_dev = jax.device_put(r.scene)
step = jax.jit(
    partial(
        fm.wavefront_mesh_fused, width=r.width, height=r.height,
        pool=r.mf_pool, has_lens=False, hints=r._mhints, return_stats=True,
        shade_width=r.mf_shade_width, retire_width=r.mf_retire_width,
        spl=r.mf_spl, inkernel_shade=r.mf_inkernel,
    )
)
lowered = step.lower(
    r._mtables, r._mcam_vec, scene_dev, r.cam_arrays, r.params,
    xs_tab=r._mxs, ys_tab=r._mys, sample_base=jnp.int32(0),
    n_samples=jnp.int32(16),
)
txt = lowered.compile().as_text()
with open("/tmp/hybrid_hlo.txt", "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> /tmp/hybrid_hlo.txt")

names = sys.argv[1:] or ["cond.111", "cond.76", "cond.33", "cond.143", "fusion.147"]
lines = txt.splitlines()
for want in names:
    pat = re.compile(r"%?" + re.escape(want) + r"\b")
    for i, ln in enumerate(lines):
        if pat.search(ln) and "=" in ln and (" = " in ln):
            print(f"\n=== {want} ===")
            print(ln.strip()[:600])
            break
