"""Quick end-to-end smoke: render a scheme at reduced size on CPU."""
import os
import sys
import time

platform = os.environ.get("SMOKE_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the image's sitecustomize pins jax_platforms='axon,cpu'; override it
jax.config.update("jax_platforms", platform)

import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer
from raytrace_tpu.utils.image import save_png

scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/triangles.yml"
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8

scheme = load_scheme(scheme_path)
scheme.render_info.width //= scale
scheme.render_info.height //= scale

t0 = time.time()
r = Renderer(scheme)
print(f"scene: {r.scene.n_spheres} spheres, {r.scene.n_free_tris} free tris, "
      f"{r.scene.n_mesh_tris} mesh tris, cubemap={r.scene.has_cubemap}, "
      f"tex_pool={r.scene.tex_pool.shape}", flush=True)
print(f"build: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
img = r.render(samples=spp, batch=spp, progress=False)
dt = time.time() - t0
n_paths = scheme.render_info.width * scheme.render_info.height * spp
print(f"rendered {scheme.render_info.width}x{scheme.render_info.height} @ {spp}spp "
      f"in {dt:.1f}s ({n_paths/dt/1e6:.2f} Mpaths/s)", flush=True)
print("image stats: min", img.min(axis=(0, 1)), "max", img.max(axis=(0, 1)),
      "mean", img.mean(axis=(0, 1)), flush=True)
assert np.isfinite(img).all(), "NaN/inf in image!"

out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/smoke.png"
save_png(out, r.target.to_u8_rgba())
print("saved", out, flush=True)
