"""Profile the wavefront dispatch on a mesh scheme: iteration count +
occupancy, then a jax.profiler device trace aggregated by op name.

    python scripts/profile_wavefront.py [scheme] [spp]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.render import wavefront as wf
from functools import partial

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 2

scheme = load_scheme(scheme_path)
r = Renderer(scheme, use_wavefront=True, use_fused=False, use_mesh_fused=False)
assert r.use_wavefront
scene_dev = jax.device_put(r.scene)

sort_lanes = os.environ.get("WF_SORT", "1") == "1"
print(f"sort_lanes={sort_lanes}")
step = jax.jit(
    partial(
        wf.wavefront_batch,
        width=r.width, height=r.height, pool=r.wf_pool, return_stats=True,
        sort_lanes=sort_lanes,
    )
)

t0 = time.time()
img, stats = step(scene_dev, r.cam_arrays, r.params, r._wxs, r._wys,
                  jnp.int32(0), jnp.int32(spp))
np.asarray(img)  # axon: block_until_ready does not fence
print(f"compile+first: {time.time()-t0:.1f}s")

t0 = time.time()
img, stats = step(scene_dev, r.cam_arrays, r.params, r._wxs, r._wys,
                  jnp.int32(0), jnp.int32(spp))
np.asarray(img)  # axon: block_until_ready does not fence
dt = time.time() - t0
iters = int(stats["iterations"])
lb = int(stats["lane_bounces"])
n_work = r.width * r.height * spp
print(
    f"dispatch {dt:.2f}s for {spp} spp: {iters} iterations, "
    f"occupancy {lb / (iters * r.wf_pool):.2%}, "
    f"avg path len {lb / n_work:.2f} bounces, "
    f"{dt / iters * 1e3:.1f} ms/iter, {n_work / dt / 1e6:.3f} Mpaths/s"
)

trace_dir = "/tmp/wf_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    img, stats = step(scene_dev, r.cam_arrays, r.params, r._wxs, r._wys,
                      jnp.int32(0), jnp.int32(spp))
    np.asarray(img)  # axon: block_until_ready does not fence

# aggregate the perfetto trace by op name
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
print(f"\ndevice op time total {tot:.2f}s across {len(by_name)} op names; top 25:")
for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {t:7.3f}s {100*t/max(tot,1e-9):5.1f}%  {name[:110]}")
