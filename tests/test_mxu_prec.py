"""MXU precision-mode coverage (VERDICT round-4 weak item 4: the
round-4 RTPU_MXU_PREC=3x knob had zero test coverage and could rot).
Round 5 made precision a kernel static: "exact" (6-pass HIGHEST,
default) and "fast2" (3-pass bf16 candidates + exact-MT driver
re-test, opt-in). Both modes run here in interpret mode against the
XLA integrator on the spaceship_r1 test scene."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test_mesh_fused as T
from raytrace_tpu.render import fused_mesh as fm
from raytrace_tpu.render.renderer import sample_batch


@pytest.fixture(scope="module")
def setup():
    # the table LAYOUT follows the precision mode at scene-build time:
    # build with the fast2 env so the 7-row table exists (drivers
    # silently fall back to exact against a 6-row table)
    os.environ["RTPU_MXU_PREC"] = "fast2"
    try:
        return T._setup()
    finally:
        os.environ.pop("RTPU_MXU_PREC")


def _run(setup, prec):
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = setup
    assert scene.mxu_chunks > 0 and scene.mxu_fast2_ok
    assert scene.mk_woop.shape[0] == scene.mxu_chunks * 7 * 64, \
        "fast2 tests need the 7-row table"
    out = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, T.W, T.H, xs, ys,
        jnp.int32(0), jnp.int32(2), pool=1024, has_lens=False,
        hints=hints, interpret=True, python_loop=True, mxu_prec=prec,
    )
    ref = np.asarray(sample_batch(
        scene, cam, params, T.W, T.H, xs, ys, jnp.int32(0), jnp.int32(2)))
    return np.asarray(out), ref


def test_mxu_fast2_tolerance_parity(setup):
    """fast2 candidate-refine vs the integrator. Accepted hits are
    exact f32 Moller-Trumbore (bit-matching _triangle_t); the residual
    is the measured candidate-coverage class (grazing/near-EPS knife
    edges, scripts/debug_fast2.py: 41/4096 lanes vs the exact mode's
    own 26 — with oracle candidates fast2 measures 8)."""
    out, ref = _run(setup, "fast2")
    mismatch = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    frac = (mismatch > 1e-3).mean()
    assert frac < 0.015, f"lanes-diff fraction {frac}"
    md = np.abs(out.mean(0) - ref.mean(0)) / (np.abs(ref.mean(0)) + 1e-6)
    assert md.max() < 8e-3, f"channel means off {md}"
    assert np.isfinite(out).all()


def test_mxu_exact_parity(setup):
    """exact mode keeps the round-4 parity class (the scaled 7-row
    table is bit-identical to the unscaled formulation: power-of-two
    row scales commute with every rounding step)."""
    out, ref = _run(setup, "exact")
    mismatch = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    frac = (mismatch > 1e-3).mean()
    assert frac < 0.008, f"lanes-diff fraction {frac}"
    md = np.abs(out.mean(0) - ref.mean(0)) / (np.abs(ref.mean(0)) + 1e-6)
    assert md.max() < 8e-3, f"channel means off {md}"


def test_mxu_fast2_defer_shade_path(setup):
    """fast2 through the FIXED-WIDTH defer shade (_pend_shade_defer's
    compacted refine branch, cw < pool): same class of agreement with
    the dense-shade fast2 result — only the iteration at which a
    bounce completes moves, not its draws."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = setup
    kw = dict(pool=1024, has_lens=False, hints=hints, interpret=True,
              python_loop=True, mxu_prec="fast2")
    dense = np.asarray(fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, T.W, T.H, xs, ys,
        jnp.int32(0), jnp.int32(1), **kw))
    defer = np.asarray(fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, T.W, T.H, xs, ys,
        jnp.int32(0), jnp.int32(1), shade_width=512, **kw))
    assert np.allclose(dense, defer, rtol=1e-5, atol=1e-6), (
        np.abs(dense - defer).max())


def test_fast2_gate_rejects_wide_dynamic_range():
    """The pack-time precision gate: a mesh whose scene-scale /
    triangle-scale ratio exceeds the bf16x2 budget (the biplane class:
    R_s 831, p99 band 0.13) must report fast2 unsafe; the drivers then
    force exact even on a fast2 opt-in."""
    from raytrace_tpu.ops.pallas.woop import pack_woop_table_np

    rng = np.random.default_rng(0)
    # tiny triangles (1e-2) scattered across a 1e3-radius scene
    c = rng.normal(size=(256, 3)) * 1000.0
    v0 = c
    e1 = rng.normal(size=(256, 3)) * 1e-2
    e2 = rng.normal(size=(256, 3)) * 1e-2
    _, _, rs, ok = pack_woop_table_np(v0, e1, e2)
    assert rs > 100.0
    assert not ok, "wide-dynamic-range mesh must be fast2-unsafe"

    # and a compact mesh is safe
    _, _, rs2, ok2 = pack_woop_table_np(v0 / 1000.0, e1 * 10, e2 * 10)
    assert ok2
