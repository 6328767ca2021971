"""Shade-mode threshold sweep (VERDICT round-3 ask 6): measure the
hybrid driver's defer (pool//4), half (pool//2) and dense (pool) pend
-shade modes across mesh scenes spanning root-AABB coverage, so the
renderer's `pick_shade_width` threshold is chosen from data instead of
two points.

Scene axis (coverage varies by camera FOV — camera is traced data, so
zoom variants reuse the scene's compiled program):
  biplane        cov ~0.21 (sky-dominated; round-3 defer winner)
  biplane_zoom   narrow FOV -> plane fills the frame
  spaceship_r1   cov ~0.58 (round-3 dense winner; MXU intersection)
  spaceship_wide wide FOV -> lower coverage
  a380_composite 17 real biplanes, cov ~1.0, 124k tris

Writes SWEEP_SHADE_r04.json and prints a table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

SPP = int(os.environ.get("SWEEP_SHADE_SPP", "8"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SWEEP_SHADE_r04.json")


def configs():
    from raytrace_tpu.models.config import load_scheme

    out = []

    s = load_scheme("/root/reference/schemes/biplane.yml")
    out.append(("biplane", s))

    s = load_scheme("/root/reference/schemes/biplane.yml")
    s.cam.screen_width, s.cam.screen_height = 3.4, 1.7  # zoom in
    out.append(("biplane_zoom", s))

    s = load_scheme("/root/reference/schemes/spaceship_r1.yml")
    out.append(("spaceship_r1", s))

    s = load_scheme("/root/reference/schemes/spaceship_r1.yml")
    s.cam.screen_width, s.cam.screen_height = 24.0, 12.0  # zoom out
    out.append(("spaceship_wide", s))

    import bench_mesh as bm

    s = bm.a380_cam_scheme()
    bm.add_composite_members(s)
    out.append(("a380_composite", s))
    return out


def main():
    from raytrace_tpu.render.renderer import Renderer

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    scenes = {}
    for name, scheme in configs():
        only = os.environ.get("SWEEP_SHADE_ONLY")
        if only and name not in only.split(","):
            continue
        row = results.setdefault(name, {})
        for mode, div in (("defer4", 4), ("half", 2), ("dense", 1)):
            os.environ["RTPU_MAX_DISPATCH_SPP"] = str(SPP)
            r = Renderer(scheme, use_mesh_fused=True, use_fused=False)
            assert r.use_mesh_fused, name
            cw = max(r.mf_pool // div, 1024)
            r.mf_shade_width = cw
            # rebuild the step partial with the chosen width
            from functools import partial
            from raytrace_tpu.render.renderer import _jit_wf_mesh_fused_step

            r._mstep = partial(
                _jit_wf_mesh_fused_step, width=r.width, height=r.height,
                pool=r.mf_pool, has_lens=r.camera.lens_r is not None,
                hints=r._mhints, spl=r.mf_spl, shade_width=cw,
            )
            cov = r._mesh_coverage()
            t0 = time.time()
            r.render(samples=1, batch=1, progress=False)
            compile_s = time.time() - t0
            t0 = time.time()
            r.render(samples=SPP, batch=SPP, progress=False)
            dt = time.time() - t0
            mp = r.width * r.height * SPP / dt / 1e6
            row[mode] = {"mpaths_per_s": round(mp, 3), "cw": cw,
                         "coverage": round(cov, 3), "spp": SPP,
                         "seconds": round(dt, 2),
                         "image_mean": round(float(r.target.mean_image().mean()), 5)}
            print(f"[{name}] cov={cov:.2f} {mode:6s} cw={cw:6d}: "
                  f"{mp:6.3f} Mpaths/s ({dt:.1f}s, compile {compile_s:.0f}s)",
                  flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
        scenes[name] = row
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
