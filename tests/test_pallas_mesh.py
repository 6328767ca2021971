"""Pallas mesh closest-hit kernel vs the XLA cluster path (interpret
mode): identical nearest hits -> identical radiance."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.models.scene import build_scene
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

SCHEME = "/root/reference/schemes/spaceship_r1.yml"
W, H = 128, 32  # 4096 lanes = 4 kernel blocks


def test_mesh_kernel_matches_xla():
    if not os.path.exists(SCHEME):
        pytest.skip("reference schemes unavailable")
    scheme = load_scheme(SCHEME)
    scheme.render_info.width, scheme.render_info.height = W, H
    scene = build_scene(scheme)
    cam = camera_to_arrays(build_camera(scheme.cam, W, H))
    flat = np.arange(W * H, dtype=np.int32)
    xs = jnp.asarray(flat % W)
    ys = jnp.asarray(flat // W)

    base = IntegratorParams(assured_depth=3, max_bounces=6)
    ref = np.asarray(
        sample_batch(scene, cam, base.replace(use_clusters=False), W, H, xs, ys, jnp.int32(0), jnp.int32(1))
    )
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            sample_batch(scene, cam, base.replace(mesh_kernel=True), W, H, xs, ys, jnp.int32(0), jnp.int32(1))
        )
    mismatch = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert (mismatch > 1e-3).mean() < 0.005, f"max rel {mismatch.max()}"
    assert np.isfinite(out).all()
