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
    INF,
    IntegratorParams,
    _diff_dir,
    _triangle_t,
    mesh_attrs_compacted,
    mesh_attrs_dense,
    sample_cubemap,
)


def _refine_pend(scene, carry, hitc, sel=None):
    """Exact-MT re-test of the fast2 MXU candidates (ops/pallas/woop.py
    mode "fast2": hitc = (g1, t_sph, g2, g3, g4, g5, g6), candidate
    gids as ints/floats, -1 = none — slots above K_CAND stay -1) for
    the (selected) mesh-pending lanes.

    Winners — lanes where some candidate's exact f32 Moller-Trumbore
    hit beats the carried sphere/free-tri best — get their exact
    (gid, t, u, v) back for the shade stage; `_triangle_t` IS the XLA
    integrator's triangle test, so winner hits match the integrator
    bit-for-bit. Lanes whose candidates all fail FLIP: flag = 1 and
    sk = 1 (the one-launch "no mesh" marker) — the next kernel launch
    re-traces them with mesh classification suppressed and shades
    their sphere/free-tri/miss outcome in-kernel, RNG state untouched.

    Returns (carry', win, gid, tt, bu, bv); win is the winner mask
    (subset of the selected pend lanes)."""
    flag = carry[0]
    pend = (flag > 1.5) & (flag < 2.5)
    if sel is not None:
        pend = pend & sel
    g1, t_sph, g2f, g3f, g4f, g5f, g6f = hitc
    n = flag.shape[0]
    ro = Vec3(carry[3], carry[4], carry[5])
    rd = Vec3(carry[6], carry[7], carry[8])
    tri = scene.mt_tri12
    Mp = tri.shape[0]
    import os as _os

    if _os.environ.get("RTPU_REFINE_BRUTE") == "1":
        # debug oracle: perfect candidate coverage via the integrator's
        # own cluster intersect — isolates candidate-coverage errors
        # from flip-protocol errors
        from .integrator import IntegratorParams, _mesh_hit_clusters

        p = IntegratorParams()
        tb, gb, ub, vb = _mesh_hit_clusters(
            scene, p, ro, rd, jnp.where(pend, t_sph, -INF)
        )
        win = pend & (gb >= 0)
        flip = pend & ~win
        carry = list(carry)
        carry[0] = jnp.where(flip, 1.0, carry[0])
        carry[1] = jnp.where(flip, 1.0, carry[1])
        return (tuple(carry), win, jnp.where(win, gb, -1),
                jnp.where(win, tb, t_sph), ub, vb)
    gw = jnp.full((n,), -1, jnp.int32)
    tw = jnp.full((n,), INF, jnp.float32)
    uw = jnp.zeros((n,), jnp.float32)
    vw = jnp.zeros((n,), jnp.float32)
    pw = jnp.full((n,), INF, jnp.float32)
    for gf in (g1, g2f, g3f, g4f, g5f, g6f):
        g = gf.astype(jnp.int32) if gf.dtype != jnp.int32 else gf
        ok_g = pend & (g >= 0)
        row = jnp.take(
            tri, jnp.where(ok_g, jnp.clip(g, 0, Mp - 1), 0), axis=0
        )
        p0 = Vec3(row[:, 0], row[:, 1], row[:, 2])
        e1 = Vec3(row[:, 3], row[:, 4], row[:, 5])
        e2 = Vec3(row[:, 6], row[:, 7], row[:, 8])
        t, u, v = _triangle_t(ro, rd, p0, e1, e2, ok_g)
        # EXACT-t ties (coplanar edge neighbors agree bitwise) must
        # resolve by cluster scan order (tri12 col 9) — the order the
        # integrator's fori over clusters and the kernel's walk keep
        pos = row[:, 9]
        better = (t < tw) | ((t == tw) & (t < INF) & (pos < pw))
        gw = jnp.where(better, g, gw)
        uw = jnp.where(better, u, uw)
        vw = jnp.where(better, v, vw)
        pw = jnp.where(better, pos, pw)
        tw = jnp.where(better, t, tw)
    win = pend & (tw < t_sph)
    flip = pend & ~win
    carry = list(carry)
    carry[0] = jnp.where(flip, 1.0, carry[0])
    carry[1] = jnp.where(flip, 1.0, carry[1])  # sk: no-mesh marker
    gid = jnp.where(win, gw, -1)
    tt = jnp.where(win, tw, t_sph)
    return tuple(carry), win, gid, tt, uw, vw


def _generate_rsqrt(state, xs, ys, cam):
    """ops.raygen.generate, but the final normalize is x * rsqrt(n2) —
    bit-identical to mesh_bounce_kernel.start_sample. The fused kernels
    finish raygen with x * rsqrt(n2) (trace_kernel._norm3) while
    ops.vec.normalize divides by sqrt(n2) — a last-ulp direction
    difference that flips t-ties on mesh edges (~0.2% of lanes on
    spaceship_r1). Drivers that mix kernel-seeded and driver-seeded
    samples of the SAME render (chunked regen in _mesh_shade, the
    pixel-bound group start) must use this mirror so every (pixel,
    sample) gets one bit-exact ray regardless of which side seeded it.
    All other arithmetic already associates identically (verified by
    the bit-equality chunk tests in tests/test_mesh_fused.py)."""
    import jax

    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    s_x = cam.x_cf * (x - cam.x_off)
    s_y = cam.y_cf * (y - cam.y_off)
    cam_d = Vec3(cam.d[0], cam.d[1], cam.d[2])
    up = Vec3(cam.up[0], cam.up[1], cam.up[2])
    right = Vec3(cam.right[0], cam.right[1], cam.right[2])
    cam_o = Vec3(cam.o[0], cam.o[1], cam.o[2])
    d = cam_d + right * s_x + up * s_y
    if cam.lens_r is not None:
        state, u = rng.next_f32(state)
        state, v = rng.next_f32(state)
        r = jnp.sqrt(u)
        thet = (2.0 * jnp.pi) * v
        ox = (r - 0.5) * 2.0 * cam.lens_r * jnp.cos(thet)
        oy = (r - 0.5) * 2.0 * cam.lens_r * jnp.sin(thet)
        off = right * ox + up * oy
        o = off + cam_o
        d = d - off
    else:
        one = jnp.ones_like(x)
        o = Vec3(one * cam_o.x, one * cam_o.y, one * cam_o.z)
    state, ju = rng.next_f32(state)
    state, jv = rng.next_f32(state)
    d = d + right * ((ju - 0.5) * cam.x_cf) + up * ((jv - 0.5) * cam.y_cf)
    n2 = d.x * d.x + d.y * d.y + d.z * d.z
    inv = jax.lax.rsqrt(jnp.where(n2 > 1e-30, n2, 1e-30))
    return state, o, Vec3(d.x * inv, d.y * inv, d.z * inv)


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
                assured, max_bounces, max_thres, carry, gid, tt, bu, bv,
                queue=False, precompacted=False, attr_div=4):
    """Complete the bounce for mesh-pending lanes (flag == 2): draw the
    8 uniforms the kernel skipped, gather surface attributes
    (compacted), PBR divert (mesh/triangle.rs:190-226), gpu radiance
    update, and in-place sample regeneration. All arrays flat (N,).
    With queue=True and spl > 1 (chunked work units), the regen bound
    is the per-lane lim carry instead of the static spl."""
    (flag, sk, state, ox, oy, oz, dx, dy, dz,
     cir, cig, cib, inten, lr, lg, lb, depth, lim) = carry
    # flag == 2 exactly: queue-refilled lanes (flag == 3) are NOT
    # pending — the shade can run after the refill stage
    pend = (flag > 1.5) & (flag < 2.5)

    st8, (u0, u1, u2, u3, u4, u5, u6, u7) = rng.next_f32_n(state, 8)
    del u3  # uniform-material fresnel draw; drawn for stream parity

    mi = jnp.where(pend, jnp.clip(gid, 0, scene.mt_attr.shape[0] - 1), 0)
    # NOTE: even when the caller already compacted (precompacted=True)
    # the inner mesh_attrs_compacted stays: measured 9ms/iter FASTER
    # than calling mesh_attrs_dense on the cw buffer (biplane sweep,
    # BENCH_NOTES round 2 session 3) — its quarter-width cond engages
    # on low-occupancy (drain) iterations where the texture-gather
    # stage shrinks 4x.
    del precompacted
    nx, ny, nz, rr_, rg_, rb_, met, rgh = mesh_attrs_compacted(
        scene, pend, mi, bu, bv, compact_div=attr_div
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
    if spl > 1:
        done = pend & ~alive
        regen = done & (sk + 1.0 < (lim if queue else float(spl)))
        sk = sk + jnp.where(regen, 1.0, 0.0)
        samp_new = samp0 + sk.astype(jnp.int32)
        st_new = rng.init_state(xs, ys, width, height, samp_new)
        st_new, ro_n, rd_n = _generate_rsqrt(st_new, xs, ys, cam)

        state = jnp.where(pend, jnp.where(regen, st_new, st8), state)
        ro = v3.where(pend, v3.where(regen, ro_n, pos), ro)
        rd = v3.where(pend, v3.where(regen, rd_n, new_d), rd)
        ci = v3.where(regen, Vec3.full_like(cir, 1.0, 1.0, 1.0), ci)
        inten = jnp.where(regen, 1.0, inten)
        depth = jnp.where(pend, jnp.where(regen, 0.0, depth2), depth)
        flag = jnp.where(pend, jnp.where(alive | regen, 1.0, 0.0), flag)
    else:
        # single-sample queue mode (wavefront_mesh_fused, spl == 1):
        # the driver's assign() regenerates; ended lanes just retire
        state = jnp.where(pend, st8, state)
        ro = v3.where(pend, pos, ro)
        rd = v3.where(pend, new_d, rd)
        depth = jnp.where(pend, depth2, depth)
        flag = jnp.where(pend, jnp.where(alive, 1.0, 0.0), flag)

    return (flag, sk, state, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
            ci.x, ci.y, ci.z, inten, L.x, L.y, L.z, depth, lim)


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
        state0, ro0, rd0 = _generate_rsqrt(state0, xs, ys, cam)
        zero = jnp.zeros((n,), jnp.float32)
        one = jnp.ones((n,), jnp.float32)
        carry = (one, zero, state0, ro0.x, ro0.y, ro0.z, rd0.x, rd0.y, rd0.z,
                 one, one, one, one, zero, zero, zero, zero, zero)
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
                scene.mk_bounds, scene.mk_sbounds, scene.mk_sgbounds, scene.mk_tri,
                scene.mk_woop, scene.mk_inst,
                n_sph=scene.n_spheres, n_ft=scene.n_free_tris,
                n_clusters=scene.mk_bounds.shape[0],
                width=scene.mk_width,
                has_lens=has_lens, assured=assured, max_bounces=max_b,
                spl=spl, hints=hints, mxu_chunks=scene.mxu_chunks,
                mxu_rs=scene.mxu_rs, n_inst=scene.n_inst,
                inst_tris=scene.inst_tris, interpret=interpret,
            )
            carry = [fl(a) for a in carry2d]
            (gid, tt, bu, bv, _g4, _g5, _g6, mdx, mdy, mdz, mwr, mwg,
             mwb) = (fl(a) for a in outs)

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


def _pend_shade_defer(scene, cam, width, height, assured, max_bounces,
                      max_thres, carry, gid, tt, bu, bv, xs, ys, samp,
                      cw, spl=1, attr_div=4, g4=None, fast2=False):
    """_mesh_shade on a FIXED-width compacted buffer of the first `cw`
    mesh-pending lanes; the rest DEFER to the next iteration.

    The dense stage pays 8 RNG draws + the full PBR/RR update for
    every pool lane when typically only ~10-20% are pending, and the
    earlier tiered-`lax.cond` variant still mostly ran at pool//2
    width (measured ~23 ms/iter of the 48.3 ms hybrid iteration —
    BENCH_NOTES round 2). Here the shade width is a compile-time
    constant: prefix-sum ranks scatter the first `cw` pending lane
    ids into a (cw,) slot buffer, the whole shade (draws + compacted
    attr/texel gathers + PBR + RR) runs at cw width, and the results
    scatter back. Pending lanes with rank >= cw are simply NOT
    gathered or written: they keep flag == 2 and their carried hit
    info, the kernel skips them next launch (their RNG state is
    untouched — mesh_bounce_kernel's `deferred` branch), and they are
    shaded in a later iteration. Each iteration shades up to cw
    pending lanes, so the drain always progresses; the backlog
    self-regulates (a large backlog lowers live-lane occupancy, which
    lowers the pend production rate below cw). Per-(pixel, sample)
    draw streams and radiance are bit-identical to the dense stage —
    only the iteration at which a bounce completes moves."""
    pool = carry[0].shape[0]
    flag = carry[0]
    pend = (flag > 1.5) & (flag < 2.5)
    ranks = jnp.cumsum(pend.astype(jnp.int32)) - 1
    cnt = ranks[-1] + 1

    slot = jnp.where(pend & (ranks < cw), ranks, cw)
    lane = (
        jnp.zeros((cw + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(pool, dtype=jnp.int32), mode="drop")[:cw]
    )
    in_slot = jnp.arange(cw, dtype=jnp.int32) < cnt
    # single-matrix compaction gather (round 3): stack the lane state
    # into ONE (pool, C) f32 matrix (int columns bitcast) and gather
    # rows once — a row gather moves at ~1.9 ns/row while the previous
    # ~22 separate element gathers cost ~8 ns/element each (they do
    # not fuse; scripts/microbench_gather.py on-chip). The scatters
    # back stay element-wise: XLA fuses those into one pass.
    f32 = jnp.float32
    bc = lambda a: jax.lax.bitcast_convert_type(a, f32)
    cols = [carry[0], carry[1], bc(carry[2])] + list(carry[3:])  # 18
    cols += [bc(gid), tt, bu, bv]  # 22
    if fast2:
        cols += [g4[0], g4[1], g4[2]]  # 25: candidates 4-6
    else:
        cols += [jnp.zeros_like(tt)] * 3
    if spl > 1:
        cols += [bc(xs), bc(ys), bc(samp)]  # 28
    mat = jnp.stack(cols, axis=-1)
    sub = jnp.take(mat, lane, axis=0)  # (cw, C) — the one gather
    col = lambda k: sub[:, k]
    ibc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    ubc = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
    carry_c = (col(0), col(1), ubc(col(2))) + tuple(
        col(k) for k in range(3, 18)
    )
    gid_c, tt_c, bu_c, bv_c = ibc(col(18)), col(19), col(20), col(21)
    if spl > 1:
        xs_c, ys_c, samp_c = ibc(col(25)), ibc(col(26)), ibc(col(27))
    else:
        iz = jnp.zeros((cw,), jnp.int32)
        xs_c = ys_c = samp_c = iz
    # unused slots gathered lane 0's state — mask their flag so
    # the shade treats them as non-pending
    carry_c = (jnp.where(in_slot, carry_c[0], 0.0),) + carry_c[1:]
    if fast2:
        # exact-MT re-test of the candidate set on the COMPACTED
        # buffer; flips (flag -> 1, sk -> 1) scatter back below
        carry_c, _, gid_c, tt_c, bu_c, bv_c = _refine_pend(
            scene, carry_c, (gid_c, tt_c, bu_c, bv_c, col(22), col(23),
                             col(24))
        )
    out_c = _mesh_shade(scene, cam, width, height, xs_c, ys_c, samp_c,
                        spl, assured, max_bounces, max_thres, carry_c,
                        gid_c, tt_c, bu_c, bv_c, queue=True,
                        precompacted=True, attr_div=attr_div)
    dest = jnp.where(in_slot, lane, pool)  # pool = discard (drop)
    out = list(carry)
    # indices _mesh_shade can change: flag, state, ray, throughput,
    # radiance, depth; with chunked regen (spl > 1) also sk=1 and
    # inten=12 (lim=17 is never written); fast2 flips write sk too
    idxs = (0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16)
    if spl > 1 or fast2:
        idxs = idxs + ((1, 12) if spl > 1 else (1,))
    for k in idxs:
        out[k] = out[k].at[dest].set(out_c[k], mode="drop")
    return tuple(out)


def wavefront_mesh_fused(
    tables, cam_vec, scene, cam, params, width, height, xs_tab, ys_tab,
    sample_base, n_samples, pool: int, has_lens: bool = False, hints=None,
    interpret: bool = False, python_loop: bool = False,
    return_stats: bool = False, ablate: str = "", shade_width: int = 0,
    spl: int = 1, compact_lanes: bool = False, attr_div: int = 0,
    retire_width: int = 0, inkernel_shade: bool = False,
    mxu_prec: str = None,
):
    """Queue-refilled (wavefront) driver over the fused mesh bounce
    kernel — the round-2 production path for mesh scenes.

    Why this shape: the pixel-bound driver above pays its XLA stage
    (sky gather + pend shade + regen) DENSE over every pixel-lane each
    iteration, and with per-pixel sample counts the drain is gated by
    the slowest pixel (measured 0.36 Mpaths/s on biplane). The classic
    wavefront driver (render/wavefront.py) keeps a small ~full-occupancy
    pool but runs closest-hit + ALL shading + 8 RNG draws as dense XLA
    every bounce (43 ms per 128k-lane iteration, mesh kernel 1-4%).
    This driver composes the two: a fixed POOL of lanes refilled from a
    work queue (occupancy), with the ENTIRE bounce for sphere/free-tri/
    miss lanes inside one pallas_call (mesh_bounce_kernel, spl=1). The
    per-iteration XLA residue is exactly what Mosaic cannot do:
      - the deferred sky texel gather for lanes that missed (they
        retire in-kernel the same iteration),
      - the compacted attribute/texel gathers + PBR shade for lanes
        whose nearest hit is a mesh triangle (_mesh_shade, spl=1),
      - ONE (n_pix+1, 3) scatter-add of retiring lanes' radiance,
      - the queue refill (one cumsum + two table gathers + raygen).

    Work units are handed out sample-major over the tile-ordered pixel
    permutation (spatial coherence for the kernel's per-block cluster
    culling). With spl > 1 (round 3) a work unit is a CHUNK of up to
    spl consecutive sample ids of one pixel: the kernel regenerates
    chunk samples in place (sample id = samp + sk, bounded by the
    per-lane lim carry so the last chunk row covers exactly
    n_samples), radiance accumulates in the lane across the chunk, and
    the refill cumsum + retirement scatter are paid once per chunk
    instead of once per path. Radiance per (pixel, sample) is
    bit-identical to the XLA integrator in gpu mode (same draws, same
    stream order — the cross-check in tests/test_mesh_fused.py); only
    accumulation order differs (scatter-add), so images agree to f32
    reassociation.

    Reference parity: the gpu radiance loop trace.wgsl:282-323; the
    queue is the TPU-native stand-in for the reference GPU's
    per-thread persistent loop over its sample grid.
    """
    from ..ops.pallas import trace_kernel as tk
    from ..ops.pallas.mesh_bounce_kernel import bounce_tiles

    ab = set(filter(None, ablate.split(",")))  # profiling stubs, see
    # wavefront.wavefront_batch: "sky" / "scatter" / "assign" / "shade"
    sph_table, ft_table = tables
    hints = hints if hints is not None else tk._PERMISSIVE
    n_pix = xs_tab.shape[0]
    # work units are chunks of up to spl consecutive samples of one
    # pixel; the last chunk row is short when spl does not divide
    # n_samples (the per-lane lim carry bounds in-kernel regen)
    n_rows = (n_samples + spl - 1) // spl
    n_units = n_pix * n_rows
    assert pool % 1024 == 0, pool
    rows = pool // 128
    assured = params.assured_depth
    max_b = params.max_bounces
    max_thres = params.max_thres

    r2 = lambda a: a.reshape(rows, 128)
    fl = lambda a: a.reshape(pool)
    zero = jnp.zeros((pool,), jnp.float32)
    izero = jnp.zeros((pool,), jnp.int32)
    cw = shade_width or max(pool // 4, 1024)
    # loop-invariant: the two pixel-coordinate tables as ONE (n_pix, 2)
    # matrix so the refill pays one row gather instead of two unfused
    # element gathers (scripts/microbench_gather.py)
    xy_tab = jnp.stack([xs_tab, ys_tab], axis=-1)

    # strict deferred retirement (retire_width > 0, spl == 1): the
    # sky resolve + image scatter always run at retire_width rows —
    # retirements that exceed the width bank their sky dir/weight in
    # six carried arrays (skc), take flag = -1 ("retired, unscattered"
    # — the kernel passes inactive flags through untouched and assign
    # skips them, so their L/pix freeze in place), and are selected
    # again next iteration. spl > 1 instead uses a lax.cond dense
    # fallback on overflow (chunked lanes regenerate in-kernel on a
    # miss, so a miss is not a retirement and the banking invariant
    # "banked lane is idle" would not hold).
    strict = (0 < retire_width < pool) and spl == 1 and not ab
    # in-kernel mesh-pend shade (round 4): the XLA stage reduces to
    # the attr/texel gathers; draws + PBR + RR + radiance move into
    # the kernel's flag == 4 branch and the shaded lane traces its
    # next bounce in the SAME launch. Supported for spl == 1 queue
    # mode only (the chunked kernel's regen block does not handle
    # mid-chunk shade completion).
    iks = inkernel_shade and spl == 1 and "shade" not in ab
    # fast2 candidate-refine MXU mode (round 5): 3-pass bf16 top-4
    # candidates in-kernel + exact-MT driver re-test (_refine_pend).
    # Default on MXU scenes; RTPU_MXU_PREC=exact restores the round-4
    # 6-pass HIGHEST path. Requires spl == 1 (the no-mesh flip marker
    # rides the sk carry) and no ablation stubs (the flip protocol
    # needs the real shade/assign stages).
    # callers going through the module-level jit MUST pass mxu_prec
    # explicitly (the Renderer does) — the env fallback here is only
    # safe for direct/test calls, where each call retraces
    import os as _os

    if mxu_prec is None:
        mxu_prec = _os.environ.get("RTPU_MXU_PREC", "exact")
    # the pack-time precision gate overrides an unsafe fast2 opt-in
    # (wide-dynamic-range meshes flood the candidate set — woop.py);
    # fast2 also needs the 7-row table layout (built when the env was
    # set at scene-build time)
    fast2 = (scene.mxu_chunks > 0 and spl == 1 and not ab
             and scene.mxu_fast2_ok and mxu_prec == "fast2"
             and scene.mk_woop.shape[0] == scene.mxu_chunks * 7 * 64)
    mxu_prec = "fast2" if fast2 else "exact"

    def resolve(m_t, md_t, mw_t):
        sky = sample_cubemap(
            scene, v3.where(m_t, md_t, Vec3.full_like(md_t.x, 1.0, 0.0, 0.0))
        )
        add = v3.where(m_t, mw_t * sky, Vec3.zeros_like(mw_t.x))
        return add.x, add.y, add.z

    def assign(carry, xs, ys, samp, pix, q):
        """Hand the next work units (chunks) to every retired lane
        (rank = prefix sum, chunk-row-major ids). Refilled lanes are
        marked flag = 3: the KERNEL raygens them from (x, y, sample)
        AND resets their path state (throughput/intensity/radiance/
        depth/sk) next call (bit-identical ops —
        mesh_bounce_kernel.start_sample IS ops.rng.init_state +
        ops.raygen.generate), so this stage is just the cumsum, two
        pixel-table gathers and six selects — the 12 pool-width state
        resets ride the kernel's fresh branch where those arrays are
        already in VMEM registers."""
        flag = carry[0]
        # flag == -1 (strict mode: retired, unscattered) is NOT
        # refillable — its L/pix must freeze until the compacted
        # retirement reaches it
        need = (flag > -0.5) & (flag < 0.5)
        ranks = jnp.cumsum(need.astype(jnp.int32))
        ids = q + ranks - 1
        valid = need & (ids < n_units)
        new_q = jnp.minimum(q + ranks[-1], n_units)
        ids_c = jnp.clip(ids, 0, jnp.maximum(n_units - 1, 0))
        pix_pos = ids_c % n_pix
        row = ids_c // n_pix
        samp_new = sample_base + row * spl
        xy = jnp.take(xy_tab, pix_pos, axis=0)
        x, y = xy[:, 0], xy[:, 1]
        carry = list(carry)
        carry[0] = jnp.where(valid, 3.0, carry[0])
        if spl > 1:
            lim_new = jnp.minimum(spl, n_samples - row * spl).astype(jnp.float32)
            carry[17] = jnp.where(valid, lim_new, carry[17])
        carry = tuple(carry)
        xs = jnp.where(valid, x, xs)
        ys = jnp.where(valid, y, ys)
        samp = jnp.where(valid, samp_new, samp)
        pix = jnp.where(valid, y * width + x, pix)
        return carry, xs, ys, samp, pix, new_q

    carry0 = (zero,) * 2 + (jnp.zeros((pool,), jnp.uint32),) + (zero,) * 15
    carry0, xs0, ys0, samp0, pix0, q0 = assign(
        carry0, izero, izero, izero, izero, jnp.int32(0)
    )
    acc0 = jnp.zeros((n_pix + 1, 3), jnp.float32)

    def cond(c):
        return jnp.any(c[3][0] > 0.5)

    def body(c):
        q, stats, acc, carry, xs, ys, samp, pix, hitc, skc = c
        if compact_lanes:
            # three-way stable partition active | pend | dead before
            # the kernel launch (round 3): deferred-pend and dead
            # lanes prune every slab test individually (tt = -INF),
            # but a BLOCK pays kernel work if ANY of its 1024 lanes is
            # active — scattered occupancy makes every block pay. The
            # permutation moves the whole lane state with ONE
            # (pool, C) row gather (~0.3 ms at 128k lanes, the same
            # matrix trick as the shade compaction; the round-2
            # element-wise formulation cost ~24 ms and was abandoned),
            # concentrating active lanes into few blocks and placing
            # refilled (tile-coherent) work contiguously at the tail.
            # Stream-neutral: every lane keeps its full state; only
            # which VPU block hosts it changes.
            flag = carry[0]
            is_pend = (flag > 1.5) & (flag < 2.5)
            is_act = (flag > 0.5) & ~is_pend
            is_dead = flag < 0.5
            na = jnp.cumsum(is_act.astype(jnp.int32))
            npd = jnp.cumsum(is_pend.astype(jnp.int32))
            ndd = jnp.cumsum(is_dead.astype(jnp.int32))
            A, P = na[-1], npd[-1]
            dest = jnp.where(
                is_act, na - 1,
                jnp.where(is_pend, A + npd - 1, A + P + ndd - 1),
            )
            inv = (
                jnp.zeros((pool,), jnp.int32)
                .at[dest]
                .set(jnp.arange(pool, dtype=jnp.int32))
            )
            f32 = jnp.float32
            bc = lambda a: jax.lax.bitcast_convert_type(a, f32)
            cols = [carry[0], carry[1], bc(carry[2])] + list(carry[3:])
            cols += [bc(hitc[0])] + list(hitc[1:7])
            cols += [bc(xs), bc(ys), bc(samp), bc(pix)]
            cols += list(skc)  # strict-retire sky banks (empty if off)
            mat = jnp.take(jnp.stack(cols, axis=-1), inv, axis=0)
            col = lambda k: mat[:, k]
            ibc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            ubc = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
            carry = (col(0), col(1), ubc(col(2))) + tuple(
                col(k) for k in range(3, 18)
            )
            hitc = (ibc(col(18)),) + tuple(col(19 + k) for k in range(6))
            xs, ys = ibc(col(25)), ibc(col(26))
            samp, pix = ibc(col(27)), ibc(col(28))
            skc = tuple(col(29 + k) for k in range(len(skc)))
        attrs = None
        if iks:
            # ---- shade-prep (in-kernel shade mode): gather surface
            # attributes for last launch's pend lanes from the carried
            # hit records, mark them flag = 4; the kernel completes
            # their bounce (draws + PBR + RR, _mesh_shade mirror) and
            # traces the new ray in the same launch. In defer mode
            # (cw < pool) only the first cw pend lanes by rank are
            # prepped; the rest stay flag = 2 and the kernel skips
            # them (same fixed-width backpressure as the XLA defer
            # shade, minus its gather-back machinery).
            flag_p = carry[0]
            pend_p = (flag_p > 1.5) & (flag_p < 2.5)
            if cw < pool:
                ranks_p = jnp.cumsum(pend_p.astype(jnp.int32)) - 1
                ready_p = pend_p & (ranks_p < cw)
            else:
                ready_p = pend_p
            if fast2:
                # exact-MT re-test of the candidates BEFORE the attr
                # gather; flips leave ready_p (flag -> 1, sk -> 1) and
                # re-trace mesh-free next launch; deferred pend lanes
                # keep their raw candidate record for a later pass
                carry, win_p, gid_c, tt_c, bu_c, bv_c = _refine_pend(
                    scene, tuple(carry), hitc, sel=ready_p
                )
                carry = list(carry)
                ready_p = ready_p & win_p
            else:
                gid_c, tt_c, bu_c, bv_c = hitc[:4]
            mi_p = jnp.where(
                ready_p, jnp.clip(gid_c, 0, scene.mt_attr.shape[0] - 1), 0
            )
            anx, any_, anz, arr, arg, arb, amet, argh = mesh_attrs_compacted(
                scene, ready_p, mi_p, bu_c, bv_c,
                compact_div=(attr_div or 2),
            )
            attrs = (anx, any_, anz, arr, arg, arb, amet, argh,
                     jnp.where(ready_p, tt_c, 0.0))
            carry = list(carry)
            # NOT flag_p: the fast2 refine may have flipped lanes to
            # flag 1 (no-mesh re-trace) — those must keep their flip
            carry[0] = jnp.where(ready_p, 4.0, carry[0])
        was_active = carry[0] > 0.5
        # deferred lanes (flag == 2 at launch) are skipped by the
        # kernel — don't count them as bounce work in lane_bounces
        did_work = was_active & ~((carry[0] > 1.5) & (carry[0] < 2.5))
        stats = (stats[0] + 1, stats[1] + jnp.sum(did_work.astype(jnp.int32))
                 ) + stats[2:]
        carry2d, outs = bounce_tiles(
            r2(xs), r2(ys), r2(samp), tuple(r2(a) for a in carry),
            sph_table, ft_table, cam_vec,
            scene.mk_bounds, scene.mk_sbounds, scene.mk_sgbounds, scene.mk_tri,
            scene.mk_woop, scene.mk_inst,
            n_sph=scene.n_spheres, n_ft=scene.n_free_tris,
            n_clusters=scene.mk_bounds.shape[0],
            width=scene.mk_width,
            has_lens=has_lens,
            assured=assured, max_bounces=max_b, spl=spl, queue=True,
            hints=hints, mxu_chunks=scene.mxu_chunks, mxu_prec=mxu_prec,
            mxu_rs=scene.mxu_rs, n_inst=scene.n_inst,
            inst_tris=scene.inst_tris, interpret=interpret,
            attrs=None if attrs is None else tuple(r2(a) for a in attrs),
            inkernel_shade=iks,
        )
        carry = [fl(a) for a in carry2d]
        (gid, tt, bu, bv, g4, g5, g6, mdx, mdy, mdz, mwr, mwg,
         mwb) = (fl(a) for a in outs)
        # merge this launch's hit records over the carried ones: lanes
        # the kernel deferred (flag still 2, output gid == -1) keep the
        # hit they recorded when they first went pending. (fast2: the
        # record is the candidate set (g1, t_sph, g2, g3, g4) instead
        # of a resolved hit — same merge.)
        new_hit = gid >= 0
        gid = jnp.where(new_hit, gid, hitc[0])
        tt = jnp.where(new_hit, tt, hitc[1])
        bu = jnp.where(new_hit, bu, hitc[2])
        bv = jnp.where(new_hit, bv, hitc[3])
        g4 = jnp.where(new_hit, g4, hitc[4])
        g5 = jnp.where(new_hit, g5, hitc[5])
        g6 = jnp.where(new_hit, g6, hitc[6])
        hitc = (gid, tt, bu, bv, g4, g5, g6)

        n_pend = jnp.sum((carry[0] > 1.5).astype(jnp.int32))
        stats = stats[:2] + (stats[2] + n_pend,
                             jnp.maximum(stats[3], n_pend)) + stats[4:]

        # ---- queue refill FIRST (before the pend shade): both rank
        # prefix-sums (refill `need`, shade `pend`) then depend only on
        # the post-kernel flags — no serialized cumsum->stage->cumsum
        # chain. Lanes the SHADE retires (mesh RR kill) idle one
        # iteration and refill on the next pass; their banked radiance
        # rides the dense scatter below either way. Refill only writes
        # flag/x/y/samp/pix — Lr and pix of kernel-retired lanes are
        # still intact for the scatter (the kernel resets lr on the
        # fresh branch NEXT launch).
        term1 = was_active & (carry[0] < 0.5)
        pix_prev = pix

        def do_assign(carry, xs, ys, samp, pix, q):
            if "assign" in ab:
                # timing stub: skip the queue work (cumsum + table
                # gathers); lanes restart in place — image meaningless,
                # shape preserved
                flag = carry[0]
                need = (flag > -0.5) & (flag < 0.5)
                n_need = jnp.sum(need.astype(jnp.int32))
                valid = need & (q < n_units)
                q = jnp.minimum(q + n_need, n_units)
                carry = list(carry)
                carry[0] = jnp.where(valid, 3.0, flag)
            else:
                carry, xs, ys, samp, pix, q = assign(
                    tuple(carry), xs, ys, samp, pix, q
                )
                carry = list(carry)
            return carry, xs, ys, samp, pix, q

        if not strict:
            carry, xs, ys, samp, pix, q = do_assign(carry, xs, ys, samp, pix, q)
        else:
            carry = list(carry)

        flag_pre_shade = carry[0]
        dense_shade = cw >= pool or "dense_shade" in ab
        if iks:
            # shade already ran in-kernel; RR kills there surfaced as
            # term1 (flag 4 -> 0 across the launch)
            carry = list(carry)
        elif "shade" in ab:
            # stub the mesh-pend XLA stage: pend lanes just retire.
            # Only flag == 2 (pend) — freshly refilled lanes are flag 3
            # and must survive to trace, or occupancy collapses and the
            # ablation's timing signal is meaningless.
            carry[0] = jnp.where(
                (carry[0] > 1.5) & (carry[0] < 2.5), 0.0, carry[0]
            )
            carry = tuple(carry)
        elif dense_shade:
            # dense pend shade: no deferral machinery. Wins on
            # mesh-heavy scenes (spaceship_r1: ~40%+ of lanes pend every
            # iteration — deferral at cw=pool/4 saturates, occupancy
            # collapses to ~45%, and full-width defer pays the rank
            # machinery for nothing; measured 0.87 vs 0.62-0.81
            # Mpaths/s; re-swept round 4: dense 1.31 vs defer 0.93).
            # The deferral path wins sky-heavy scenes where pend is
            # sparse (biplane ~15%). attr_div=2: the inner
            # attribute/texture compaction engages below HALF pend —
            # spaceship averages 0.43, so the gather-heavy stage runs
            # at half width most iterations.
            gid_s, tt_s, bu_s, bv_s = gid, tt, bu, bv
            if fast2:
                carry, _, gid_s, tt_s, bu_s, bv_s = _refine_pend(
                    scene, tuple(carry), hitc
                )
                carry = list(carry)
            carry = _mesh_shade(
                scene, cam, width, height, xs, ys, samp, spl,
                assured, max_b, max_thres, tuple(carry),
                gid_s, tt_s, bu_s, bv_s,
                queue=True, attr_div=(attr_div or 2),
            )
        else:
            carry = _pend_shade_defer(
                scene, cam, width, height, assured, max_b, max_thres,
                tuple(carry), gid, tt, bu, bv, xs, ys, samp, cw=cw,
                spl=spl, attr_div=(attr_div or 4), g4=(g4, g5, g6),
                fast2=fast2,
            )

        # ---- retirement: deferred sky resolve + radiance scatter.
        # The sky term is added into the lane's CARRIED radiance (a
        # chunked lane that missed regenerates in place and retires
        # iterations later). Two formulations:
        #   dense (retire_width == 0): tile-cond'd sky resolve + a
        #     pool-width masked scatter-add (row n_pix discards).
        #   compacted (retire_width == rw > 0): ONE rank cumsum over
        #     sel = missed | retiring, one (pool, 12) row gather of the
        #     selected lanes, sky texel gathers + the image scatter at
        #     rw width, results scattered back. Falls back to the dense
        #     branch via lax.cond on the rare iteration where sel
        #     overflows rw (counted in stats). Wins mesh-heavy scenes
        #     (spaceship_r1: sel ~43% of pool, the dense ops pay 100%);
        #     loses sky-dominated ones (biplane: ~79% of lanes retire
        #     every iteration — nothing to compact).
        term2 = (flag_pre_shade > 1.5) & (carry[0] < 0.5)  # shade RR kill
        term = term1 | term2
        do_sky = scene.has_cubemap and "sky" not in ab
        carry = list(carry)
        Lr0, Lg0, Lb0 = carry[13], carry[14], carry[15]

        if do_sky:
            md = Vec3(mdx, mdy, mdz)
            missed = (md.x != 0.0) | (md.y != 0.0) | (md.z != 0.0)
        else:
            md = Vec3(mdx, mdy, mdz)
            missed = jnp.zeros((pool,), jnp.bool_)

        def dense_sky():
            """Sky-resolved carried radiance, full pool width (the
            tile-cond'd scan skips 8k-lane tiles with no missed
            lane)."""
            if not do_sky:
                return Lr0, Lg0, Lb0
            TS = 8192
            if pool > TS and pool % TS == 0 and "dense_sky" not in ab:
                n_t = pool // TS
                resh = lambda a: a.reshape(n_t, TS)

                def tile_body(_, args):
                    m_t, ax, ay, az, bx, by, bz, any_t = args
                    out = jax.lax.cond(
                        any_t,
                        lambda: resolve(m_t, Vec3(ax, ay, az), Vec3(bx, by, bz)),
                        lambda: tuple(jnp.zeros((TS,), jnp.float32) for _ in range(3)),
                    )
                    return None, out

                _, (sx, sy, sz) = jax.lax.scan(
                    tile_body, None,
                    (resh(missed), resh(mdx), resh(mdy), resh(mdz),
                     resh(mwr), resh(mwg), resh(mwb),
                     jnp.any(resh(missed), axis=1)),
                )
                sx, sy, sz = (
                    sx.reshape(pool), sy.reshape(pool), sz.reshape(pool)
                )
            else:
                sx, sy, sz = resolve(missed, md, Vec3(mwr, mwg, mwb))
            return Lr0 + sx, Lg0 + sy, Lb0 + sz

        def dense_scatter(acc, Lr, Lg, Lb):
            if "scatter" in ab:
                return acc.at[0].add(
                    jnp.stack([jnp.sum(jnp.where(term, Lr, 0.0)),
                               jnp.sum(jnp.where(term, Lg, 0.0)),
                               jnp.sum(jnp.where(term, Lb, 0.0))])
                )
            idx = jnp.where(term, pix_prev, n_pix)  # row n_pix = discard
            vals = jnp.stack(
                [jnp.where(term, Lr, 0.0),
                 jnp.where(term, Lg, 0.0),
                 jnp.where(term, Lb, 0.0)], axis=-1,
            )
            return acc.at[idx].add(vals)

        rw = 0 if ab else retire_width
        if strict:
            # ---- strict deferred retirement (spl == 1): sky resolve +
            # image scatter at a FIXED rw width every iteration. sel =
            # this iteration's retirees + previously deferred (-1)
            # lanes; the first rw (by lane index) are processed, the
            # rest bank their transient sky dir/weight in skc, take
            # flag = -1 and are re-selected next iteration (their
            # L/pix freeze: the kernel passes inactive flags through
            # and the refill below skips them). The refill runs AFTER
            # this block so a deferred lane is never handed new work —
            # the bank holds at most one pending retirement per lane.
            # Any backlog left when the queue drains is flushed by the
            # dense post-loop drain.
            prev_def = carry[0] < -0.5
            sel = term | prev_def
            md_m = v3.where(prev_def, Vec3(skc[0], skc[1], skc[2]), md)
            mw_m = v3.where(
                prev_def, Vec3(skc[3], skc[4], skc[5]), Vec3(mwr, mwg, mwb)
            )
            ranks = jnp.cumsum(sel.astype(jnp.int32)) - 1
            cnt = ranks[-1] + 1
            fit = sel & (ranks < rw)
            defer = sel & (ranks >= rw)
            stats = stats[:4] + (
                stats[4] + cnt, jnp.maximum(stats[5], cnt),
                stats[6] + jnp.any(defer).astype(jnp.int32),
            )
            skc = tuple(
                jnp.where(defer, a, 0.0)
                for a in (md_m.x, md_m.y, md_m.z, mw_m.x, mw_m.y, mw_m.z)
            )
            carry[0] = jnp.where(
                defer, -1.0, jnp.where(prev_def, 0.0, carry[0])
            )
            slot = jnp.where(fit, ranks, rw)
            lane = (
                jnp.zeros((rw + 1,), jnp.int32)
                .at[slot]
                .set(jnp.arange(pool, dtype=jnp.int32), mode="drop")[:rw]
            )
            in_slot = jnp.arange(rw, dtype=jnp.int32) < jnp.minimum(cnt, rw)
            bcf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
            cols = [md_m.x, md_m.y, md_m.z, mw_m.x, mw_m.y, mw_m.z,
                    Lr0, Lg0, Lb0, bcf(pix_prev)]
            sub = jnp.take(jnp.stack(cols, axis=-1), lane, axis=0)
            ibc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            md_c = Vec3(sub[:, 0], sub[:, 1], sub[:, 2])
            mw_c = Vec3(sub[:, 3], sub[:, 4], sub[:, 5])
            L_c = Vec3(sub[:, 6], sub[:, 7], sub[:, 8])
            pix_c = ibc(sub[:, 9])
            miss_c = (
                (md_c.x != 0.0) | (md_c.y != 0.0) | (md_c.z != 0.0)
            ) & in_slot
            if do_sky:
                sx, sy, sz = resolve(miss_c, md_c, mw_c)
                L_c = L_c + Vec3(sx, sy, sz)
            idx = jnp.where(in_slot, pix_c, n_pix)
            vals = jnp.stack(
                [jnp.where(in_slot, L_c.x, 0.0),
                 jnp.where(in_slot, L_c.y, 0.0),
                 jnp.where(in_slot, L_c.z, 0.0)], axis=-1,
            )
            acc = acc.at[idx].add(vals)
            carry, xs, ys, samp, pix, q = do_assign(carry, xs, ys, samp, pix, q)
            return q, stats, acc, tuple(carry), xs, ys, samp, pix, hitc, tuple(skc)
        if 0 < rw < pool:
            # non-strict compaction (spl > 1, chunked): the sky MUST
            # resolve densely — a chunked lane that missed regenerated
            # in-kernel and carries its sky radiance until the chunk
            # retires — but the image scatter compacts over term only
            # (chunking makes term rare: ~1/spl of the spl == 1 rate),
            # falling back dense via lax.cond on overflow.
            Lr, Lg, Lb = dense_sky()
            sel = term
            ranks = jnp.cumsum(sel.astype(jnp.int32)) - 1
            cnt = ranks[-1] + 1
            stats = stats[:4] + (
                stats[4] + cnt, jnp.maximum(stats[5], cnt),
                stats[6] + (cnt > rw).astype(jnp.int32),
            )

            def compact_scatter(acc):
                slot = jnp.where(sel & (ranks < rw), ranks, rw)
                lane = (
                    jnp.zeros((rw + 1,), jnp.int32)
                    .at[slot]
                    .set(jnp.arange(pool, dtype=jnp.int32), mode="drop")[:rw]
                )
                in_slot = jnp.arange(rw, dtype=jnp.int32) < cnt
                bcf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
                cols = [Lr, Lg, Lb, bcf(pix_prev)]
                sub = jnp.take(jnp.stack(cols, axis=-1), lane, axis=0)
                ibc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
                pix_c = ibc(sub[:, 3])
                idx = jnp.where(in_slot, pix_c, n_pix)
                vals = jnp.stack(
                    [jnp.where(in_slot, sub[:, 0], 0.0),
                     jnp.where(in_slot, sub[:, 1], 0.0),
                     jnp.where(in_slot, sub[:, 2], 0.0)], axis=-1,
                )
                return acc.at[idx].add(vals)

            acc = jax.lax.cond(
                cnt > rw,
                lambda a: dense_scatter(a, Lr, Lg, Lb),
                compact_scatter, acc,
            )
        else:
            Lr, Lg, Lb = dense_sky()
            acc = dense_scatter(acc, Lr, Lg, Lb)
        carry[13], carry[14], carry[15] = Lr, Lg, Lb
        if strict:
            carry, xs, ys, samp, pix, q = do_assign(carry, xs, ys, samp, pix, q)
        return q, stats, acc, tuple(carry), xs, ys, samp, pix, hitc, tuple(skc)

    stats0 = tuple(jnp.int32(0) for _ in range(7))
    hitc0 = (izero - 1, zero, zero, zero, zero, zero, zero)
    skc0 = (zero,) * 6 if strict else ()
    init = (q0, stats0, acc0, carry0, xs0, ys0, samp0, pix0, hitc0, skc0)
    if python_loop:
        # tests only (see sample_batch_mesh_fused): the interpret-mode
        # kernel emulation inside a while_loop is too large for the CPU
        # XLA compiler; run the loop eagerly instead
        import numpy as _np

        c = init
        dbg = int(__import__("os").environ.get("RTPU_DEBUG_PIX", "-1"))
        while bool(_np.asarray(cond(c))):
            c = body(c)
            if dbg >= 0:
                _q, _st, _acc, _carry, _xs, _ys, _samp, _pix, _hitc, _skc = c
                m = _np.asarray(_pix) == dbg
                if m.any():
                    ln = int(_np.where(m)[0][0])
                    g = lambda a: float(_np.asarray(a)[ln])
                    print(f"it={int(_st[0])} lane={ln} flag={g(_carry[0])}"
                          f" sk={g(_carry[1])} lim={g(_carry[17])}"
                          f" samp={int(_np.asarray(_samp)[ln])}"
                          f" depth={g(_carry[16])}"
                          f" st={int(_np.asarray(_carry[2])[ln])}"
                          f" d=({g(_carry[6]):.8f},{g(_carry[7]):.8f},{g(_carry[8]):.8f})"
                          f" o=({g(_carry[3]):.6f},{g(_carry[4]):.6f},{g(_carry[5]):.6f})"
                          f" L=({g(_carry[13]):.6f},{g(_carry[14]):.6f},{g(_carry[15]):.6f})",
                          flush=True)
        q, stats, acc, carry_f, xs_f, ys_f, samp_f, pix_f, hitc_f, skc_f = c
    else:
        (q, stats, acc, carry_f, xs_f, ys_f, samp_f, pix_f, hitc_f,
         skc_f) = jax.lax.while_loop(cond, body, init)
    if strict:
        # drain: lanes still flag == -1 when the queue emptied (their
        # retirement never fit the width) scatter densely once
        m = carry_f[0] < -0.5
        Lr, Lg, Lb = carry_f[13], carry_f[14], carry_f[15]
        md_f = Vec3(skc_f[0], skc_f[1], skc_f[2])
        mw_f = Vec3(skc_f[3], skc_f[4], skc_f[5])
        miss_f = m & ((md_f.x != 0.0) | (md_f.y != 0.0) | (md_f.z != 0.0))
        if scene.has_cubemap:
            sx, sy, sz = resolve(miss_f, md_f, mw_f)
            Lr, Lg, Lb = Lr + sx, Lg + sy, Lb + sz
        idx = jnp.where(m, pix_f, n_pix)
        vals = jnp.stack(
            [jnp.where(m, Lr, 0.0), jnp.where(m, Lg, 0.0),
             jnp.where(m, Lb, 0.0)], axis=-1,
        )
        acc = acc.at[idx].add(vals)
    img = acc[:n_pix]
    if return_stats:
        return img, {"iterations": stats[0], "lane_bounces": stats[1],
                     "pend_sum": stats[2], "pend_max": stats[3],
                     "sel_sum": stats[4], "sel_max": stats[5],
                     "retire_overflow": stats[6]}
    return img
