"""Profile the queue-refilled hybrid (fused_mesh.wavefront_mesh_fused)
on a mesh scheme: iteration count + occupancy, then a jax.profiler
device trace aggregated by op name — names the XLA residue ops
(gathers / scatters / cumsums / fusions) that dominate ms/iter.

    python scripts/profile_hybrid.py [scheme] [spp]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
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

step = jax.jit(
    partial(
        fm.wavefront_mesh_fused, width=r.width, height=r.height,
        pool=r.mf_pool, has_lens=False, hints=r._mhints,
        shade_width=r.mf_shade_width, retire_width=r.mf_retire_width,
        spl=r.mf_spl, inkernel_shade=r.mf_inkernel,
        mxu_prec=r.mf_mxu_prec, return_stats=True,
    )
)
print(f"shade_width {r.mf_shade_width} retire_width {r.mf_retire_width} "
      f"spl {r.mf_spl} pool {r.mf_pool} iks {r.mf_inkernel} "
      f"prec {r.mf_mxu_prec}", flush=True)
args = (r._mtables, r._mcam_vec, scene_dev, r.cam_arrays, r.params)
kw = dict(xs_tab=r._mxs, ys_tab=r._mys, sample_base=jnp.int32(0),
          n_samples=jnp.int32(spp))

t0 = time.time()
img, stats = step(*args, **kw)
np.asarray(img)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
img, stats = step(*args, **kw)
np.asarray(img)
dt = time.time() - t0
iters = int(stats["iterations"])
print(
    f"dispatch {dt:.2f}s for {spp} spp: {iters} iterations, "
    f"occupancy {int(stats['lane_bounces']) / (iters * r.mf_pool):.2%}, "
    f"pend avg {int(stats['pend_sum'])/max(iters,1)/r.mf_pool:.3f} "
    f"max {int(stats['pend_max'])/r.mf_pool:.3f}, "
    f"sel avg {int(stats.get('sel_sum', 0))/max(iters,1)/r.mf_pool:.3f} "
    f"max {int(stats.get('sel_max', 0))/r.mf_pool:.3f} "
    f"over {int(stats.get('retire_overflow', 0))}, "
    f"{dt / iters * 1e3:.1f} ms/iter, {n_work / dt / 1e6:.3f} Mpaths/s",
    flush=True,
)

trace_dir = "/tmp/hybrid_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    img, stats = step(*args, **kw)
    np.asarray(img)

paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
if not paths:
    print("no trace found", glob.glob(f"{trace_dir}/**", recursive=True))
    sys.exit(0)
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)
by_name = defaultdict(float)
pid_names = {}
for ev in tr.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
for ev in tr.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
            by_name[ev["name"]] += ev["dur"] / 1e6
tot = sum(by_name.values())
print(f"\ndevice op time total {tot:.2f}s across {len(by_name)} op names; top 30:")
for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {t:7.3f}s {100*t/max(tot,1e-9):5.1f}%  {name[:110]}")
