"""Profile the fused Pallas renderer on the walled scene (TPU)."""
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
from raytrace_tpu.render.renderer import Renderer

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
H = int(sys.argv[2]) if len(sys.argv) > 2 else 600
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SPD = int(sys.argv[4]) if len(sys.argv) > 4 else 8

print("devices:", jax.devices(), flush=True)
scheme = _inline_walled_scheme(W, H, assured=5)
scheme.render_info.width, scheme.render_info.height = W, H
r = Renderer(scheme, samples_per_dispatch=SPD, use_fused=True)
assert r.use_fused, "fused path not selected!"

t0 = time.time()
r.render(samples=SPD, batch=SPD, progress=False)
print(f"compile+first: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
r.render(samples=SPP, batch=SPP, progress=False)
dt = time.time() - t0
paths = W * H * SPP
print(f"steady: {dt:.3f}s for {SPP} spp -> {paths/dt/1e6:.1f} Mpaths/s", flush=True)
img = r.target.mean_image()
print("mean:", img.mean(axis=(0, 1)), flush=True)
