"""Differentiable-tier cost measurement (VERDICT round-4 weak item 5):
quantify the production-vs-gradient throughput gap so the scoping
decision ("gradients run through the XLA integrator by design") is a
number, not a shrug.

Measures on the attached accelerator, walled scheme at 304x152:
  fwd_kernel   — the production fused Pallas driver (forward only)
  fwd_integ    — the XLA integrator, differentiable=True structure
                 (fixed-length scan) but value-only call
  grad         — jax.vjp through the integrator (the train-step path:
                 radiance loss, gradients w.r.t. sphere emissive+rgb)
Prints one JSON line with paths/s for each and the ratios.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.models.scene import build_scene
from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.render.renderer import (
    Renderer, camera_to_arrays, sample_batch, _params_from_scheme,
)

W, H, SPP = 304, 152, 8


def timed(fn, reps=3):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scheme = load_scheme("/root/reference/schemes/walled.yml")
    scheme.render_info.width, scheme.render_info.height = W, H
    n_paths = W * H * SPP

    # production kernel forward
    r = Renderer(scheme, hw_rng=False)
    t_kernel = timed(lambda: r.render(samples=SPP, progress=False))

    # integrator, differentiable structure
    scene = build_scene(scheme)
    scene = jax.device_put(scene)
    cam = camera_to_arrays(build_camera(scheme.cam, W, H))
    params = _params_from_scheme(scheme, "gpu", True, 2048).replace(
        max_bounces=24)
    flat = np.arange(W * H, dtype=np.int32)
    xs = jnp.asarray(flat % W)
    ys = jnp.asarray(flat // W)

    @jax.jit
    def fwd(scene):
        return sample_batch(scene, cam, params, W, H, xs, ys,
                            jnp.int32(0), SPP)

    t_integ = timed(lambda: np.asarray(fwd(scene)))

    @jax.jit
    def loss(em, rgb):
        sc = scene.replace(sph_emissive=em, sph_rgb=rgb)
        img = sample_batch(sc, cam, params, W, H, xs, ys, jnp.int32(0), SPP)
        return jnp.mean(img)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_grad = timed(
        lambda: jax.tree_util.tree_map(
            np.asarray, g(scene.sph_emissive, scene.sph_rgb))
    )

    print(json.dumps({
        "scene": "walled", "wh": [W, H], "spp": SPP,
        "fwd_kernel_mpaths": round(n_paths / t_kernel / 1e6, 3),
        "fwd_integrator_mpaths": round(n_paths / t_integ / 1e6, 3),
        "grad_mpaths": round(n_paths / t_grad / 1e6, 3),
        "integ_over_kernel": round(t_integ / t_kernel, 2),
        "grad_over_fwd_integ": round(t_grad / t_integ, 2),
        "grad_over_kernel": round(t_grad / t_kernel, 2),
    }))


if __name__ == "__main__":
    main()
