"""Benchmark: walled-scheme path throughput on the attached accelerator.

Prints ONE JSON line: primary-path throughput on the reference's
headline benchmark (walled.yml, 1200x600, the scene behind its
"1650x speedup, 8 s / 20000 spp" number -> 1.8e9 paths/s on an
RX 6800 XT, BASELINE.md). vs_baseline is ours / reference-GPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATHS_PER_S = 1.8e9  # walled GPU: 1200*600*20000 / 8 s (BASELINE.md)

W, H = 1200, 600
WARMUP_SPP = 1
BENCH_SPP = int(os.environ.get("BENCH_SPP", "200"))


def main():
    from __graft_entry__ import _inline_walled_scheme
    from raytrace_tpu.models.camera import build_camera
    from raytrace_tpu.models.scene import build_scene
    from raytrace_tpu.render.integrator import IntegratorParams
    from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

    scheme = _inline_walled_scheme(W, H, assured=5)
    scene = jax.device_put(build_scene(scheme))
    cam = camera_to_arrays(build_camera(scheme.cam, W, H))
    params = IntegratorParams(assured_depth=5, max_bounces=40)
    flat = np.arange(W * H, dtype=np.int32)
    x_idx = jnp.asarray(flat % W)
    y_idx = jnp.asarray(flat // W)

    step = jax.jit(
        lambda sc, c, xs, ys, base, n: sample_batch(sc, c, params, W, H, xs, ys, base, n)
    )

    step(scene, cam, x_idx, y_idx, jnp.int32(0), jnp.int32(WARMUP_SPP)).block_until_ready()

    t0 = time.time()
    out = step(scene, cam, x_idx, y_idx, jnp.int32(WARMUP_SPP), jnp.int32(BENCH_SPP))
    out.block_until_ready()
    dt = time.time() - t0

    paths_per_s = W * H * BENCH_SPP / dt
    print(
        json.dumps(
            {
                "metric": "walled_primary_paths_per_sec",
                "value": round(paths_per_s, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_s / BASELINE_PATHS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
