"""Driver for the fused mesh bounce kernel (ops/pallas/
mesh_bounce_kernel.py): the per-iteration XLA residue is exactly the
gathers Mosaic cannot issue.

Every loop iteration is: ONE pallas_call doing intersection + full
shading for sphere / free-tri / miss lanes + in-place sample
regeneration, then (XLA) the sky texel gather for lanes that missed
this iteration and the compacted attribute/texel gathers + PBR shade
for lanes whose hit was a mesh triangle. Lanes are pixel-bound — the
lane grid covers every pixel once and `spl` consecutive sample ids run
per lane via in-kernel regeneration — so radiance accumulates per lane
with no queue / scatter / cumsum (the measured overhead of the round-1
wavefront formulation, BENCH_NOTES.md).

Radiance per (pixel, sample) is bit-identical to the XLA integrator
(render/integrator.trace_paths, gpu mode): same draws in the same
stream order (8 per bounce — the kernel skips mesh-pending lanes'
draws, this driver replays them), same formulas. Cross-checked in
tests/test_mesh_fused.py.

Reference parity: the gpu radiance loop trace.wgsl:282-323 with the
mesh nearest-hit replacing the stubbed KD traversal (trace.wgsl:664).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import raygen, rng
from ..ops import vec as v3
from ..ops.vec import Vec3
from ..ops.intersect import EPS
from .integrator import (
    IntegratorParams,
    _diff_dir,
    mesh_attrs_compacted,
    sample_cubemap,
)


def supports(scene, params: IntegratorParams) -> bool:
    """Coverage: gpu semantics, forward only, mesh present with cluster
    tables, sphere/free-tri counts small enough to unroll."""
    return (
        params.mode == "gpu"
        and not params.debug_single_ray
        and not params.differentiable
        and not params.dir_light_samp
        and scene.n_mesh_tris > 0
        and scene.n_clusters > 0
        and scene.n_spheres <= 64
        and scene.n_free_tris <= 64
    )


def _mesh_shade(scene, cam, width, height, xs, ys, samp0, spl,
                assured, max_bounces, max_thres, carry, gid, tt, bu, bv):
    """Complete the bounce for mesh-pending lanes (flag == 2): draw the
    8 uniforms the kernel skipped, gather surface attributes
    (compacted), PBR divert (mesh/triangle.rs:190-226), gpu radiance
    update, and in-place sample regeneration. All arrays flat (N,)."""
    (flag, sk, state, ox, oy, oz, dx, dy, dz,
     cir, cig, cib, inten, lr, lg, lb, depth) = carry
    pend = flag > 1.5

    st8, (u0, u1, u2, u3, u4, u5, u6, u7) = rng.next_f32_n(state, 8)
    del u3  # uniform-material fresnel draw; drawn for stream parity

    mi = jnp.where(pend, jnp.clip(gid, 0, scene.mt_attr.shape[0] - 1), 0)
    nx, ny, nz, rr_, rg_, rb_, met, rgh = mesh_attrs_compacted(
        scene, pend, mi, bu, bv
    )
    norm = Vec3(nx, ny, nz)
    ro = Vec3(ox, oy, oz)
    rd = Vec3(dx, dy, dz)
    t_safe = jnp.where(pend, tt, 0.0)
    pos = ro + rd * t_safe + norm * EPS

    # PBR divert: r0 = 0.04+0.96*metal, refl = r0+(1-r0)*(1-|d.n|^5),
    # CUSTOM_ATTEN = 1 (mesh/triangle.rs:190-226 == trace.wgsl:1128-1151)
    spec_d = v3.normalize(v3.reflect(rd, norm))
    diff_d = _diff_dir(rd, norm, u1, u2)
    r0 = 0.04 + (1.0 - 0.04) * met
    refl = r0 + (1.0 - r0) * (1.0 - jnp.abs(v3.dot(rd, norm)) ** 5)
    pbr_diff = u0 < (1.0 - refl)
    pbr_base = v3.where(pbr_diff, diff_d, spec_d)
    scatter = v3.normalize(Vec3(u4, u5, u6), eps=1e-20) * rgh
    new_d = v3.normalize(pbr_base + scatter)

    # gpu radiance (trace.wgsl:290-315): mesh emissive is always zero
    # (trace.wgsl:509); divert weight 1 -> inten unchanged
    ci = Vec3(cir, cig, cib)
    ci = v3.where(pend, ci * Vec3(rr_, rg_, rb_), ci)
    rr_due = depth >= float(assured)
    rr_kill = rr_due & (u7 > max_thres)
    term = pend & rr_kill
    inv_thres = 1.0 / max_thres
    ci_rr = ci * inv_thres
    L = Vec3(lr, lg, lb)
    L = L + v3.where(term, ci_rr * inten, Vec3.zeros_like(lr))
    ci = v3.where(term, ci_rr, ci)

    survive = pend & ~rr_kill
    depth2 = jnp.where(survive, depth + 1.0, depth)
    alive = survive & (depth2 < float(max_bounces))
    done = pend & ~alive
    regen = done & (sk + 1.0 < float(spl))
    sk = sk + jnp.where(regen, 1.0, 0.0)
    samp_new = samp0 + sk.astype(jnp.int32)
    st_new = rng.init_state(xs, ys, width, height, samp_new)
    st_new, ro_n, rd_n = raygen.generate(st_new, xs, ys, cam)

    state = jnp.where(pend, jnp.where(regen, st_new, st8), state)
    ro = v3.where(pend, v3.where(regen, ro_n, pos), ro)
    rd = v3.where(pend, v3.where(regen, rd_n, new_d), rd)
    ci = v3.where(regen, Vec3.full_like(cir, 1.0, 1.0, 1.0), ci)
    inten = jnp.where(regen, 1.0, inten)
    depth = jnp.where(pend, jnp.where(regen, 0.0, depth2), depth)
    flag = jnp.where(pend, jnp.where(alive | regen, 1.0, 0.0), flag)

    return (flag, sk, state, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
            ci.x, ci.y, ci.z, inten, L.x, L.y, L.z, depth)


def sample_batch_mesh_fused(
    tables, cam_vec, scene, cam, params, width, height, xs2d, ys2d,
    sample_base, n_samples, spl: int, has_lens: bool = False,
    hints=None, interpret: bool = False, python_loop: bool = False,
    return_stats: bool = False,
):
    """Radiance SUM over n_samples for every lane's pixel. xs2d/ys2d:
    (R, 128) i32 pixel grids covering all pixels once (padded rows
    repeat the last pixel; caller slices). n_samples (traced) must be
    a multiple of the static spl; each group of spl samples runs one
    bounce-pipeline while_loop. Returns (R*128, 3) f32 sums.

    python_loop (tests only, requires static ints + eager execution):
    run the iteration loop in Python instead of lax.while_loop — the
    interpret-mode kernel emulation inside a while_loop is too large
    for the CPU XLA compiler, while one standalone bounce_tiles
    compiles in seconds and is then cached across iterations."""
    from ..ops.pallas import trace_kernel as tk
    from ..ops.pallas.mesh_bounce_kernel import bounce_tiles

    sph_table, ft_table = tables
    rows = xs2d.shape[0]
    n = rows * 128
    xs = xs2d.reshape(n)
    ys = ys2d.reshape(n)
    hints = hints if hints is not None else tk._PERMISSIVE
    assured = params.assured_depth
    max_b = params.max_bounces
    max_thres = params.max_thres
    max_iters = spl * max_b + 2  # safety bound; flag logic exits sooner

    r2 = lambda a: a.reshape(rows, 128)
    fl = lambda a: a.reshape(n)

    def one_group(g, acc3_stats):
        acc, stats_in = acc3_stats
        base_g = sample_base + g * spl
        state0 = rng.init_state(xs, ys, width, height, base_g)
        state0, ro0, rd0 = raygen.generate(state0, xs, ys, cam)
        zero = jnp.zeros((n,), jnp.float32)
        one = jnp.ones((n,), jnp.float32)
        carry = (one, zero, state0, ro0.x, ro0.y, ro0.z, rd0.x, rd0.y, rd0.z,
                 one, one, one, one, zero, zero, zero, zero)
        samp2d = jnp.full((rows, 128), 0, jnp.int32) + base_g

        def cond(c):
            it, _, carry = c
            return (it < max_iters) & jnp.any(carry[0] > 0.5)

        def body(c):
            it, act, carry = c
            act = act + jnp.sum((carry[0] > 0.5).astype(jnp.int32))
            carry2d, outs = bounce_tiles(
                xs2d, ys2d, samp2d, tuple(r2(a) for a in carry),
                sph_table, ft_table, cam_vec,
                scene.mk_bounds, scene.mk_sbounds, scene.mk_tri,
                n_sph=scene.n_spheres, n_ft=scene.n_free_tris,
                n_clusters=scene.mk_bounds.shape[0],
                width=scene.cl_idx.shape[1],
                has_lens=has_lens, assured=assured, max_bounces=max_b,
                spl=spl, hints=hints, interpret=interpret,
            )
            carry = [fl(a) for a in carry2d]
            gid, tt, bu, bv, mdx, mdy, mdz, mwr, mwg, mwb = (fl(a) for a in outs)

            if scene.has_cubemap:
                # deferred sky resolve for lanes that missed THIS
                # iteration (the kernel already regenerated them)
                md = Vec3(mdx, mdy, mdz)
                missed = (md.x != 0.0) | (md.y != 0.0) | (md.z != 0.0)
                sky = sample_cubemap(
                    scene, v3.where(missed, md, Vec3.full_like(md.x, 1.0, 0.0, 0.0))
                )
                carry[13] = carry[13] + jnp.where(missed, mwr * sky.x, 0.0)
                carry[14] = carry[14] + jnp.where(missed, mwg * sky.y, 0.0)
                carry[15] = carry[15] + jnp.where(missed, mwb * sky.z, 0.0)

            carry = _mesh_shade(
                scene, cam, width, height, xs, ys, base_g, spl,
                assured, max_b, max_thres, tuple(carry), gid, tt, bu, bv,
            )
            return it + 1, act, carry

        init = (jnp.int32(0), jnp.int32(0), carry)
        if python_loop:
            import numpy as _np

            c = init
            while bool(_np.asarray(cond(c))):
                c = body(c)
            it, act, carry = c
        else:
            it, act, carry = jax.lax.while_loop(cond, body, init)
        lr, lg, lb = carry[13], carry[14], carry[15]
        stats = (stats_in[0] + it, stats_in[1] + act)
        return (acc[0] + lr, acc[1] + lg, acc[2] + lb), stats

    zero = jnp.zeros((n,), jnp.float32)
    stats0 = (jnp.int32(0), jnp.int32(0))
    if python_loop:
        acc = ((zero, zero, zero), stats0)
        for g in range(int(n_samples) // spl):
            acc = one_group(g, acc)
        (acc, stats) = acc
    else:
        acc, stats = jax.lax.fori_loop(
            0, n_samples // spl, one_group, ((zero, zero, zero), stats0)
        )
    img = jnp.stack(acc, axis=-1)
    if return_stats:
        return img, {"iterations": stats[0], "lane_bounces": stats[1]}
    return img
