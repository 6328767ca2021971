"""Render a scheme on the TPU (fused path when supported)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.utils.image import save_png

scheme_path = sys.argv[1]
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/render_tpu.png"
spd = int(sys.argv[4]) if len(sys.argv) > 4 else 8

scheme = load_scheme(scheme_path)
r = Renderer(scheme, samples_per_dispatch=spd)
print(f"fused={r.use_fused} scene: {r.scene.n_spheres}s/{r.scene.n_free_tris}f/"
      f"{r.scene.n_mesh_tris}m cubemap={r.scene.has_cubemap}", flush=True)
t0 = time.time()
r.render(samples=spp, batch=spp, progress=False)
dt = time.time() - t0
n = scheme.render_info.width * scheme.render_info.height * r.target.count
print(f"{r.target.count} spp in {dt:.1f}s -> {n/dt/1e6:.1f} Mpaths/s", flush=True)
img = r.target.mean_image()
print("mean:", img.mean(axis=(0, 1)), flush=True)
save_png(out, r.target.to_u8_rgba())
print("saved", out, flush=True)
