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


def test_streamed_exact_table_matches_numpy():
    """The HBM-streamed exact path (> 36 chunks: 6-row table, 128-wide
    DMA chunks, K=128 matmul, ODD chunk count exercising the trailing
    chunk after the pair loop) against brute-force numpy
    Moller-Trumbore. No renderer covers this layout on CPU (small
    meshes stay VMEM-resident), so it gets a direct kernel test."""
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import raytrace_tpu.ops.pallas.woop as woop

    rng = np.random.default_rng(3)
    M = 40 * 64 + 17  # 41 chunks (odd, > resident gate)
    v0 = rng.normal(size=(M, 3)) * 2
    e1 = rng.normal(size=(M, 3)) * 0.3
    e2 = rng.normal(size=(M, 3)) * 0.3
    tab, n_chunks, rs, _ = woop.pack_woop_table_np(v0, e1, e2, fast2=False)
    rpt = tab.shape[0] // (64 * n_chunks)
    assert (n_chunks, rpt, tab.shape[1]) == (41, 6, 128)

    N = 1024
    o = rng.normal(size=(N, 3)) * 4
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def kern(ox, oy, oz, dx, dy, dz, whbm, tt, gid, bu, bv, g4, g5, g6,
             b0, b1, sem, *, n_chunks, rs, rpt):
        tt[...] = jnp.full_like(tt[...], woop.INF)
        woop.mxu_mesh_hit(
            ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
            whbm, b0, b1, sem, tt, gid, bu, bv, g4, g5, g6,
            n_chunks=n_chunks, prec="exact", rs=rs, rpt=rpt)

    f = pl.pallas_call(
        functools.partial(kern, n_chunks=n_chunks, rs=rs, rpt=rpt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_shape=[jax.ShapeDtypeStruct((8, N), jnp.float32),
                   jax.ShapeDtypeStruct((8, N), jnp.int32)]
        + [jax.ShapeDtypeStruct((8, N), jnp.float32)] * 5,
        scratch_shapes=[pltpu.VMEM((rpt * 64, 128), jnp.asarray(tab).dtype)] * 2
        + [pltpu.SemaphoreType.DMA((2,))],
        interpret=True,
    )
    mk = lambda col: jnp.broadcast_to(jnp.asarray(col, jnp.float32), (8, N))
    tt, gid, _, _, _, _, _ = f(
        mk(o[:, 0]), mk(o[:, 1]), mk(o[:, 2]),
        mk(d[:, 0]), mk(d[:, 1]), mk(d[:, 2]), jnp.asarray(tab))

    pv = np.cross(d[:, None, :], e2[None])
    det = np.einsum("mk,rmk->rm", e1, pv)
    okm = np.abs(det) >= 1e-4
    inv = np.where(okm, 1.0 / np.where(okm, det, 1), 0)
    h = o[:, None, :] - v0[None]
    u = inv * np.einsum("rmk,rmk->rm", h, pv)
    q = np.cross(h, e1[None])
    v = inv * np.einsum("rmk,rmk->rm", np.broadcast_to(d[:, None, :], q.shape), q)
    t = inv * np.einsum("mk,rmk->rm", e2, q)
    okm = okm & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 1e-4)
    t = np.where(okm, t, np.inf)
    i = np.argmin(t, 1)
    rt = t[np.arange(N), i]
    ri = np.where(np.isfinite(rt), i, -1)

    gi = np.asarray(gid[0])
    tv = np.asarray(tt[0])
    both = (ri >= 0) & (gi >= 0)
    assert ((ri >= 0) != (gi >= 0)).sum() == 0
    assert (ri[both] != gi[both]).sum() == 0
    assert np.abs(tv[both] - rt[both]).max() < 1e-4
