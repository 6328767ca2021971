"""Fused mesh bounce pipeline (render/fused_mesh +
ops/pallas/mesh_bounce_kernel) vs the XLA integrator, interpret mode:
identical draws in identical stream order -> identical radiance up to
f32 reassociation (closest-hit select order)."""
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
from raytrace_tpu.ops.pallas import trace_kernel as tk
from raytrace_tpu.render import fused_mesh as fm
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

SCHEME = "/root/reference/schemes/spaceship_r1.yml"
W, H = 128, 32  # 4096 lanes = 4 kernel blocks


def _setup():
    if not os.path.exists(SCHEME):
        pytest.skip("reference schemes unavailable")
    scheme = load_scheme(SCHEME)
    scheme.render_info.width, scheme.render_info.height = W, H
    scene = build_scene(scheme)
    camera = build_camera(scheme.cam, W, H)
    cam = camera_to_arrays(camera)
    flat = np.arange(W * H, dtype=np.int32)
    xs = jnp.asarray(flat % W)
    ys = jnp.asarray(flat // W)
    params = IntegratorParams(assured_depth=3, max_bounces=6)
    sph_t, ft_t = tk.pack_scene_tables(scene)
    hints = tk.scene_static_hints(sph_t, ft_t, scene.n_spheres, scene.n_free_tris)
    cam_vec = jnp.asarray(tk.make_cam_vec(camera, float(params.max_thres)))
    tables = (jnp.asarray(sph_t), jnp.asarray(ft_t))
    return scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec


def _fused(scene, cam, params, tables, hints, cam_vec, xs, ys, base, n, spl):
    xs2d = xs.reshape(-1, 128)
    ys2d = ys.reshape(-1, 128)
    out = fm.sample_batch_mesh_fused(
        tables, cam_vec, scene, cam, params, W, H, xs2d, ys2d,
        jnp.int32(base), n, spl=spl,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
    )
    return np.asarray(out)


def _assert_close(out, ref, n_samples):
    # the draws/streams are bit-identical; the residual disagreement is
    # f32-reassociation t-tie flips between the kernel's scalar-SoA
    # intersection and XLA's (mesh-edge lanes where two triangles
    # near-tie) — measured ~0.1% of lanes PER SAMPLE, unioning across
    # samples (verified: spl=1 and spl=2 mismatch on identical lanes)
    mismatch = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    limit = 0.005 + 0.003 * (n_samples - 1)  # ~0.4%/sample measured
    assert (mismatch > 1e-3).mean() < limit, f"max rel {mismatch.max()}"
    # a single flipped lane moves a 4096-lane channel mean by ~0.2%,
    # so the mean gate is a drift detector, not a bit check
    md = np.abs(out.mean(0) - ref.mean(0)) / (np.abs(ref.mean(0)) + 1e-6)
    assert md.max() < 8e-3, f"channel means off {md}"
    assert np.isfinite(out).all()


def test_mesh_fused_matches_integrator_1spp():
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    assert fm.supports(scene, params)
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(1))
    )
    out = _fused(scene, cam, params, tables, hints, cam_vec, xs, ys, 0, 1, spl=1)
    _assert_close(out, ref, 1)


def test_mesh_fused_regen_and_groups():
    """spl > 1 (in-kernel sample regeneration) and multiple sample
    groups accumulate exactly the per-sample sums."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(4))
    )
    out = _fused(scene, cam, params, tables, hints, cam_vec, xs, ys, 0, 4, spl=2)
    _assert_close(out, ref, 4)


def test_mesh_fused_sample_base_offset():
    """sample_base continuation (exact resume) reaches the same streams."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(7), jnp.int32(2))
    )
    out = _fused(scene, cam, params, tables, hints, cam_vec, xs, ys, 7, 2, spl=2)
    _assert_close(out, ref, 2)


def test_wavefront_mesh_fused_matches_integrator():
    """The queue-refilled hybrid driver (wavefront_mesh_fused): same
    per-(pixel,sample) streams as the XLA integrator, pool smaller than
    the work set so the refill/retire/scatter machinery is exercised
    (4096 pixels x 2 spp through a 1024-lane pool)."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(2))
    )
    out = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, W, H, xs, ys,
        jnp.int32(0), jnp.int32(2), pool=1024, has_lens=False, hints=hints,
        interpret=True, python_loop=True,
    )
    _assert_close(np.asarray(out), ref, 2)


def test_wavefront_mesh_fused_sample_base():
    """Exact resume through the queue driver: sample ids continue."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(5), jnp.int32(1))
    )
    out = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, W, H, xs, ys,
        jnp.int32(5), jnp.int32(1), pool=1024, has_lens=False, hints=hints,
        interpret=True, python_loop=True,
    )
    _assert_close(np.asarray(out), ref, 1)


def test_wavefront_mesh_fused_deferral():
    """Fixed-width pend-shade deferral: with shade_width far below the
    per-iteration pend production, lanes carry flag==2 + hit info
    across kernel launches (mesh_bounce_kernel `deferred` branch) and
    are shaded in later iterations. Radiance per (pixel, sample) must
    be unchanged vs the undeferred driver — deferral only moves WHEN a
    bounce completes, never its draws or arithmetic."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    kw = dict(
        width=W, height=H, xs_tab=xs, ys_tab=ys,
        sample_base=jnp.int32(0), n_samples=jnp.int32(1), pool=1024,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
        return_stats=True,
    )
    # attr_div=-1 forces the dense attribute evaluation on BOTH
    # drivers: the compact/dense cond branches agree only to
    # fusion-dependent ulps (see mesh_attrs_compacted), and this test's
    # claim is about WHEN a bounce completes, not branch-choice ulps
    ref, rstats = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, attr_div=-1, **kw
    )
    out, dstats = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, shade_width=128, attr_div=-1,
        **kw
    )
    assert int(dstats["iterations"]) > int(rstats["iterations"]), (
        "shade_width=128 should force deferral iterations"
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wavefront_mesh_fused_chunked():
    """Chunked work units (spl > 1 in queue mode): a lane owns up to
    spl consecutive samples of one pixel and regenerates in-kernel;
    radiance per (pixel, sample) must match the XLA integrator, and a
    non-dividing spl (chunk 3 over 4 samples -> lim rows of 3 and 1)
    must cover exactly n_samples."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(4))
    )
    for spl in (2, 3, 4):
        out = fm.wavefront_mesh_fused(
            tables, cam_vec, scene, cam, params, W, H, xs, ys,
            jnp.int32(0), jnp.int32(4), pool=1024, has_lens=False,
            hints=hints, interpret=True, python_loop=True, spl=spl,
        )
        _assert_close(np.asarray(out), ref, 4)


def test_wavefront_mesh_fused_chunked_equals_unchunked():
    """Chunking only moves WHEN samples run: per-(pixel,sample) draw
    streams are identical, and since the _generate_rsqrt mirror every
    regen path (kernel fresh, kernel regen, shade regen) produces the
    same ray bitwise WITHIN one compiled config. Across the spl=1 and
    spl=2 configs the kernel is a DIFFERENT compiled program, so XLA
    FMA contraction may reassociate raygen/intersection arithmetic at
    the ulp level — which chaotic mesh-edge t-ties can amplify on a
    handful of pixels (measured: 1 of 4096 on this scene; was 6 with
    up-to-0.23 error before the mirror fix). Gate: <0.1% of pixels
    beyond reassociation noise, and none catastrophically off."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    kw = dict(
        width=W, height=H, xs_tab=xs, ys_tab=ys,
        sample_base=jnp.int32(3), n_samples=jnp.int32(2), pool=1024,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
    )
    ref = np.asarray(
        fm.wavefront_mesh_fused(tables, cam_vec, scene, cam, params, **kw)
    )
    out = np.asarray(
        fm.wavefront_mesh_fused(tables, cam_vec, scene, cam, params, spl=2, **kw)
    )
    d = np.abs(out - ref).max(axis=1)
    assert (d > 1e-4).mean() < 1e-3, f"{(d > 1e-4).sum()} pixels diverge"
    assert d.max() < 5e-3, f"max divergence {d.max()}"
    np.testing.assert_allclose(out.mean(0), ref.mean(0), rtol=1e-4)


def test_wavefront_mesh_fused_retire_compaction():
    """Compacted retirement/sky (retire_width > 0): the sky resolve +
    image scatter run at fixed compacted width over sel = missed |
    retiring lanes, falling back dense via lax.cond when sel overflows
    the width. Identical per-lane arithmetic to the dense formulation
    -> same image to fusion-dependent ulps (XLA contracts the cubemap
    uv mul+adds differently in the gathered vs dense context — same
    1-ulp class as the attr cond branches, measured max rel 1.6e-7); a
    small width must actually exercise BOTH the compacted branch and
    the overflow fallback. Also covers the chunked (spl > 1) carry
    write-back of sky-resolved radiance for in-kernel-regenerated
    lanes."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    kw = dict(
        width=W, height=H, xs_tab=xs, ys_tab=ys,
        sample_base=jnp.int32(0), n_samples=jnp.int32(2), pool=1024,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
        return_stats=True,
    )
    ref, rstats = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, **kw
    )
    assert int(rstats["sel_sum"]) == 0  # dense mode: sel never counted
    for rw in (256, 640):
        out, stats = fm.wavefront_mesh_fused(
            tables, cam_vec, scene, cam, params, retire_width=rw, **kw
        )
        assert int(stats["sel_sum"]) > 0
        assert int(stats["sel_max"]) <= 1024
        if rw == 256:
            assert int(stats["retire_overflow"]) > 0, (
                "rw=256 should overflow on primary-heavy iterations"
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    # chunked mode: missed lanes regenerate in-kernel and the sky term
    # must ride the carry write-back until the chunk retires
    kw2 = dict(kw, n_samples=jnp.int32(4))
    ref2, _ = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, spl=2, **kw2
    )
    out2, _ = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, spl=2, retire_width=640, **kw2
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref2), rtol=1e-6, atol=1e-6
    )


def test_wavefront_mesh_fused_inkernel_shade():
    """In-kernel mesh-pend shade (flag 4): the kernel completes pend
    bounces from driver-gathered attrs with the same 8-draw stream and
    _mesh_shade-mirrored arithmetic, so radiance per (pixel, sample)
    matches the XLA integrator within the same reassociation class as
    the XLA-shade driver. Covers dense (cw = pool) and deferral
    (cw = 128) widths, plus strict retirement on top."""
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = _setup()
    ref = np.asarray(
        sample_batch(scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(2))
    )
    kw = dict(
        width=W, height=H, xs_tab=xs, ys_tab=ys,
        sample_base=jnp.int32(0), n_samples=jnp.int32(2), pool=1024,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
        inkernel_shade=True,
    )
    out = fm.wavefront_mesh_fused(tables, cam_vec, scene, cam, params, **kw)
    _assert_close(np.asarray(out), ref, 2)
    out2, dstats = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, shade_width=128,
        return_stats=True, **kw
    )
    _assert_close(np.asarray(out2), ref, 2)
    assert int(dstats["pend_max"]) > 128, "cw=128 should defer pend lanes"
    out3 = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, retire_width=256, **kw
    )
    _assert_close(np.asarray(out3), ref, 2)
