"""A/B/C the mesh-scene drivers on a reference mesh scheme (default
biplane, the reference's 13x-GPU-speedup scene): the fused Pallas
bounce pipeline (render/fused_mesh, default on TPU), the wavefront
lane-regeneration driver, and the classic masked bounce loop.

    python scripts/bench_wavefront.py [scheme] [spp] [fused|wavefront|classic|all]
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


def run(scheme_path, spp, mode: str):
    scheme = load_scheme(scheme_path)
    kw = dict(use_fused=False, use_mesh_fused=False, use_wavefront=False)
    if mode == "fused":
        kw["use_mesh_fused"] = True
    elif mode == "wavefront":
        kw["use_wavefront"] = True
    r = Renderer(scheme, **kw)
    engaged = (
        "fused" if r.use_mesh_fused else
        "wavefront" if r.use_wavefront else "classic"
    )
    assert engaged == mode, f"wanted {mode}, renderer engaged {engaged}"
    n_pix = r.width * r.height
    t0 = time.time()
    r.render(samples=1, batch=None, progress=False)
    t_compile = time.time() - t0
    t0 = time.time()
    # batch up to the renderer's per-dispatch cap (watchdog-aware)
    img = r.render(samples=spp, batch=spp, progress=False)
    dt = time.time() - t0
    print(
        f"{mode}: {dt:.2f} s for {r.target.count - 1} spp, "
        f"{n_pix * spp / dt / 1e6:.3f} Mpaths/s (compile+warm {t_compile:.1f} s) "
        f"mean={np.asarray(img).mean():.4f}",
        flush=True,
    )
    return img


def main():
    scheme_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/biplane.yml"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    imgs = {}
    for mode in ("fused", "wavefront", "classic"):
        if which in (mode, "all"):
            imgs[mode] = run(scheme_path, spp, mode)
    keys = list(imgs)
    for a_k, b_k in zip(keys, keys[1:]):
        a, b = imgs[a_k], imgs[b_k]
        bad = ~np.isclose(a, b, rtol=1e-3, atol=1e-3)
        print(f"{a_k} vs {b_k}: mismatch frac {bad.mean():.5f} max|d| {np.abs(a - b).max():.5f}")


if __name__ == "__main__":
    main()
