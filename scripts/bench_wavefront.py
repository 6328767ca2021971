"""A/B the wavefront regeneration driver vs the classic masked bounce
loop on a reference mesh scheme (default biplane, the reference's
13x-GPU-speedup scene). Usage:

    python scripts/bench_wavefront.py [scheme] [spp] [classic|wavefront|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.render.renderer import Renderer


def run(scheme_path, spp, wavefront: bool):
    scheme = load_scheme(scheme_path)
    r = Renderer(scheme, use_wavefront=wavefront, use_fused=False)
    label = "wavefront" if r.use_wavefront else "classic"
    n_pix = r.width * r.height
    t0 = time.time()
    r.render(samples=1, batch=1, progress=False)  # compile + warmup
    t_compile = time.time() - t0
    t0 = time.time()
    # batch up to the renderer's per-dispatch cap (watchdog-aware);
    # the wavefront drain tail is paid once per dispatch, so bigger
    # batches measure (and deliver) better occupancy
    img = r.render(samples=spp, batch=spp, progress=False)
    dt = time.time() - t0
    print(
        f"{label}: {dt:.2f} s for {spp} spp = {dt / spp:.3f} s/spp, "
        f"{n_pix * spp / dt / 1e6:.3f} Mpaths/s (compile+warm {t_compile:.1f} s) "
        f"mean={np.asarray(img).mean():.4f}"
    )
    return img


def main():
    scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    imgs = {}
    if which in ("classic", "both"):
        imgs["classic"] = run(scheme_path, spp, wavefront=False)
    if which in ("wavefront", "both"):
        imgs["wavefront"] = run(scheme_path, spp, wavefront=True)
    if len(imgs) == 2:
        a, b = imgs["classic"], imgs["wavefront"]
        bad = ~np.isclose(a, b, rtol=1e-3, atol=1e-3)
        print(f"image agreement: mismatch frac {bad.mean():.5f} max|d| {np.abs(a - b).max():.5f}")


if __name__ == "__main__":
    main()
