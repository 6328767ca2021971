"""Automated ON-HARDWARE parity gate (VERDICT round-4 weak item 2).

Renders reduced-size production configurations on the REAL TPU through
the production Renderer and asserts image agreement against the plain
XLA integrator running on the CPU backend of the same process — the
only gate that catches hardware-only numeric corruption (the round-4
denormal-bitcast gather bug rendered wrong images on TPU while every
CPU-interpret test stayed green; BENCH_NOTES session 4b).

Both sides use the counter RNG keyed by (pixel, sample), so the
per-path streams are identical and Monte-Carlo noise cancels in the
comparison: any disagreement is a genuine numeric/codegen divergence
(f32 reassociation ulps, the fast2 refine's documented residual
displacement class, or a real bug). Thresholds are set ~10x above the
measured healthy baseline and ~100x below what the round-4 bug
produced.

Configs cover every production branch family:
  spaceship/fast2   mesh-fused dense + in-kernel shade + strict
                    retirement + MXU fast2 candidate-refine
  spaceship/exact   same with the 6-pass HIGHEST MXU pass
  spaceship/cluster RTPU_MXU=0: supercluster-DMA cluster walk
  spaceship/defer   XLA defer shade, dense retirement, no iks
  biplane/defer     cluster walk + u8/u16 texel pools + defer shade
  walled/fused      fused meshless kernel (ctr RNG)

Writes HW_PARITY_r05.json; bench.py folds a pass/fail summary into
its JSON line. Exit code 1 on any failure.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "HW_PARITY_r05.json")

# (config name, scheme, (W, H), spp, env overrides)
CONFIGS = [
    ("spaceship/fast2", "spaceship_r1", (304, 152), 8, {}),
    ("spaceship/exact", "spaceship_r1", (304, 152), 8,
     {"RTPU_MXU_PREC": "exact"}),
    ("spaceship/cluster", "spaceship_r1", (304, 152), 8, {"RTPU_MXU": "0"}),
    ("spaceship/defer", "spaceship_r1", (304, 152), 8,
     {"RTPU_MXU": "0", "RTPU_SHADE_WIDTH": "0", "RTPU_RETIRE_WIDTH": "0",
      "RTPU_INKERNEL_SHADE": "0"}),
    ("biplane/defer", "biplane", (304, 152), 8, {}),
    ("walled/fused", "walled", (304, 152), 32, {}),
]
# mean-image threshold (per channel, absolute): healthy runs measure
# ~1e-5 to 1e-3; the round-4 denormal bug class moves channel means by
# ~0.1. The tile criterion is a bad-tile FRACTION: a single legitimate
# knife-edge path flip with RR-boosted radiance moves one 8x8 tile's
# mean by ~0.1 at 8 spp (biplane measured 1 tile at 0.094 on a healthy
# run), so the gate fails only when >2% of tiles diverge — hardware
# corruption is image-wide, per-path knife edges are isolated.
MEAN_TOL = 2e-3
TILE_TOL = 6e-2
TILE_BAD_FRAC = 0.02


def _render(name, scheme_name, wh, spp, env, oracle):
    from raytrace_tpu.models.config import load_scheme
    from raytrace_tpu.render.renderer import Renderer

    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        scheme = load_scheme(f"/root/reference/schemes/{scheme_name}.yml")
        scheme.render_info.width, scheme.render_info.height = wh
        if oracle:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                r = Renderer(scheme, use_fused=False, use_mesh_fused=False,
                             use_wavefront=False, devices=[cpu])
                r.params = r.params.replace(mesh_kernel=False)
                r.render(samples=spp, progress=False)
        else:
            r = Renderer(scheme, hw_rng=False)
            r.render(samples=spp, progress=False)
        return r.target.mean_image()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def tile_means(img, t=8):
    h, w, _ = img.shape
    return img[: h - h % t, : w - w % t].reshape(
        h // t, t, w // t, t, 3).mean(axis=(1, 3))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    if jax.default_backend() == "cpu":
        print("hw_parity requires the TPU backend; refusing to gate on CPU")
        sys.exit(2)

    results = {}
    oracles = {}
    ok_all = True
    for name, scheme_name, wh, spp, env in CONFIGS:
        key = (scheme_name, wh, spp)
        if key not in oracles:
            t0 = time.time()
            oracles[key] = _render(name, scheme_name, wh, spp, {}, oracle=True)
            print(f"  oracle {scheme_name}{wh}@{spp}spp: "
                  f"{time.time()-t0:.0f}s (cpu integrator)", flush=True)
        t0 = time.time()
        img = _render(name, scheme_name, wh, spp, env, oracle=False)
        ref = oracles[key]
        mean_d = float(np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))).max())
        td = np.abs(tile_means(img) - tile_means(ref)).max(axis=-1)
        tile_d = float(td.max())
        bad_frac = float((td > TILE_TOL).mean())
        ok = mean_d < MEAN_TOL and bad_frac < TILE_BAD_FRAC
        ok_all &= ok
        results[name] = {
            "mean_diff": round(mean_d, 8), "tile_max_diff": round(tile_d, 6),
            "bad_tile_frac": round(bad_frac, 5),
            "pass": bool(ok), "seconds": round(time.time() - t0, 1),
        }
        print(f"[{name}] mean|d| {mean_d:.2e} tile max|d| {tile_d:.2e} "
              f"bad-tiles {bad_frac:.2%} "
              f"{'PASS' if ok else 'FAIL'} ({results[name]['seconds']}s)",
              flush=True)

    summary = {
        "pass": bool(ok_all),
        "n_pass": sum(r["pass"] for r in results.values()),
        "n_total": len(results),
        "mean_tol": MEAN_TOL, "tile_tol": TILE_TOL,
        "configs": results,
    }
    with open(ART, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{'PASS' if ok_all else 'FAIL'} "
          f"({summary['n_pass']}/{summary['n_total']}) -> {ART}", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
