"""Monte-Carlo path integrator: vectorized iterative bounce loop.

This is the TPU-native formulation of the reference's radiance
computation. The loop shape follows the reference GPU kernel
(trace.wgsl:282-315): every ray lane carries throughput
(`colour_intensity`), a dielectric weight (`intensity`), an RNG stream
and an active mask; each iteration does closest-hit over ALL primitives
(brute force, exactly like the reference GPU backend), shades by
material kind with masked selects, and applies Russian roulette.

Two semantics modes, because the reference's CPU and GPU backends
genuinely diverge (documented in SURVEY.md §7.3):

* mode='gpu' (default; what the reference's published renders used):
  - emissive hits add E*T*I and multiply throughput by colour twice
    (trace.wgsl:294-303);
  - RR: after assured_depth, terminate when u > max_thres; on
    termination throughput/max_thres is ADDED to the radiance
    (trace.wgsl:306-310);
  - sphere intersection only accepts the near root (inside rays miss);
  - dielectric weight: 1 on reflect, (1-re) on transmit, folded into
    `intensity`;
  - free-triangle emissive honored; no direct-light sampling.

* mode='cpu' (reference CPU backend, radiance.rs:20-120):
  - L += T*emissive at every hit; skybox terminates; triangle emissive
    zeroed (generic.rs:85-86);
  - RR: after assured_depth, survive w.p. 0.4 (hardcoded,
    radiance.rs:77) and divide the bounce rgb by 0.4;
  - sphere takes min positive root; closest-hit guard t >= 20*EPS
    (closest_hit.rs:16);
  - dielectric reflect weight re folded into rgb;
  - optional direct light sampling (dir_light_samp).

Per-bounce the integrator draws a fixed budget of 8 uniforms per lane
(u0 lobe-choice, u1/u2 diffuse, u3 fresnel, u4-u6 PBR scatter, u7 RR) —
stream parity with the reference is impossible anyway (draw consumption
is data-dependent per thread there), so draws are lane-uniform for
vectorization and reproducibility.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import bsdf, cubemap, rng
from ..ops.geom import dot, normalize
from ..ops.intersect import EPS, INF, intersect_spheres, intersect_triangles
from ..ops.texture import interp_uv, sample_nearest

KIND_NONE, KIND_SPHERE, KIND_FREETRI, KIND_MESHTRI = 0, 1, 2, 3

CPU_RR_THRES = 0.4  # radiance.rs:77 hardcoded
DLS_NORMZE = 1.0 / (30.0 * jnp.pi)  # radiance.rs:90


@flax.struct.dataclass
class IntegratorParams:
    max_thres: Any = 0.5  # traced (differentiable not useful, but dynamic)
    assured_depth: int = flax.struct.field(pytree_node=False, default=5)
    max_bounces: int = flax.struct.field(pytree_node=False, default=40)
    mode: str = flax.struct.field(pytree_node=False, default="gpu")
    debug_single_ray: bool = flax.struct.field(pytree_node=False, default=False)
    dir_light_samp: bool = flax.struct.field(pytree_node=False, default=False)
    mesh_chunk: int = flax.struct.field(pytree_node=False, default=2048)
    differentiable: bool = flax.struct.field(pytree_node=False, default=False)


# ---------------------------------------------------------------------------
# closest hit


def closest_hit(scene, params, ro, rd):
    """Brute-force nearest hit over spheres, free triangles, mesh
    triangles, in the reference GPU's evaluation order
    (trace.wgsl:389-444). Returns (t, kind, idx, bu, bv)."""
    n = ro.shape[0]
    t_best = jnp.full((n,), INF)
    kind = jnp.zeros((n,), jnp.int32)
    idx = jnp.zeros((n,), jnp.int32)
    bu = jnp.zeros((n,))
    bv = jnp.zeros((n,))

    guard = 20.0 * EPS if params.mode == "cpu" else None

    def apply_guard(t):
        if guard is None:
            return t
        return jnp.where(t >= guard, t, INF)

    if scene.n_spheres:
        ts = intersect_spheres(
            ro, rd, scene.sph_c, scene.sph_r, scene.sph_valid, mode=params.mode
        )
        ts = apply_guard(ts)
        tmin = jnp.min(ts, axis=-1)
        amin = jnp.argmin(ts, axis=-1).astype(jnp.int32)
        better = tmin < t_best
        t_best = jnp.where(better, tmin, t_best)
        kind = jnp.where(better, KIND_SPHERE, kind)
        idx = jnp.where(better, amin, idx)

    if scene.n_free_tris:
        ts, us, vs = intersect_triangles(
            ro, rd, scene.ft_v0, scene.ft_e1, scene.ft_e2, scene.ft_valid
        )
        ts = apply_guard(ts)
        tmin = jnp.min(ts, axis=-1)
        amin = jnp.argmin(ts, axis=-1).astype(jnp.int32)
        better = tmin < t_best
        t_best = jnp.where(better, tmin, t_best)
        kind = jnp.where(better, KIND_FREETRI, kind)
        idx = jnp.where(better, amin, idx)
        g = lambda a: jnp.take_along_axis(a, amin[:, None], axis=-1)[:, 0]
        bu = jnp.where(better, g(us), bu)
        bv = jnp.where(better, g(vs), bv)

    m = scene.mt_v0.shape[0]
    if m:
        chunk = min(params.mesh_chunk, m)
        if m % chunk:
            raise ValueError(f"mesh tris {m} not a multiple of chunk {chunk}")
        n_chunks = m // chunk
        if n_chunks == 1:
            ts, us, vs = intersect_triangles(
                ro, rd, scene.mt_v0, scene.mt_e1, scene.mt_e2, scene.mt_valid
            )
            ts = apply_guard(ts)
            tmin = jnp.min(ts, axis=-1)
            amin = jnp.argmin(ts, axis=-1).astype(jnp.int32)
            better = tmin < t_best
            g = lambda a: jnp.take_along_axis(a, amin[:, None], axis=-1)[:, 0]
            t_best = jnp.where(better, tmin, t_best)
            kind = jnp.where(better, KIND_MESHTRI, kind)
            idx = jnp.where(better, amin, idx)
            bu = jnp.where(better, g(us), bu)
            bv = jnp.where(better, g(vs), bv)
        else:
            cv0 = scene.mt_v0.reshape(n_chunks, chunk, 3)
            ce1 = scene.mt_e1.reshape(n_chunks, chunk, 3)
            ce2 = scene.mt_e2.reshape(n_chunks, chunk, 3)
            cval = scene.mt_valid.reshape(n_chunks, chunk)

            def body(carry, chunk_data):
                tb, mi, mu, mv = carry
                v0, e1, e2, val, base = chunk_data
                ts, us, vs = intersect_triangles(ro, rd, v0, e1, e2, val)
                ts = apply_guard(ts)
                tmin = jnp.min(ts, axis=-1)
                amin = jnp.argmin(ts, axis=-1).astype(jnp.int32)
                better = tmin < tb
                g = lambda a: jnp.take_along_axis(a, amin[:, None], axis=-1)[:, 0]
                return (
                    jnp.where(better, tmin, tb),
                    jnp.where(better, base + amin, mi),
                    jnp.where(better, g(us), mu),
                    jnp.where(better, g(vs), mv),
                ), None

            bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
            init = (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32), bu * 0, bv * 0)
            (mt_t, mt_i, mt_u, mt_v), _ = jax.lax.scan(
                body, init, (cv0, ce1, ce2, cval, bases)
            )
            better = mt_t < t_best
            t_best = jnp.where(better, mt_t, t_best)
            kind = jnp.where(better, KIND_MESHTRI, kind)
            idx = jnp.where(better, mt_i, idx)
            bu = jnp.where(better, mt_u, bu)
            bv = jnp.where(better, mt_v, bv)

    return t_best, kind, idx, bu, bv


# ---------------------------------------------------------------------------
# shading


def _gather(a, i):
    return jnp.take(a, i, axis=0)


def _shade_hit(scene, params, ro, rd, t, kind, idx, bu, bv, draws):
    """Compute, for every lane (masked combine over primitive kinds):
    shading normal, surface rgb, emissive + flag, new ray (o, d),
    dielectric/material weight. draws = tuple of 7 uniforms (u0..u6).
    Returns dict of per-lane arrays."""
    u0, u1, u2, u3, u4, u5, u6 = draws
    is_sph = kind == KIND_SPHERE
    is_ft = kind == KIND_FREETRI
    is_mt = kind == KIND_MESHTRI

    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    perfect = ro + rd * t_safe[..., None]

    n = t.shape[0]
    zeros3 = jnp.zeros((n, 3))
    zeros1 = jnp.zeros((n,))
    # combined per-lane fields, filled group by group
    norm = zeros3
    rgb = zeros3
    emissive = zeros3
    has_em = jnp.zeros((n,), bool)
    mkind = jnp.zeros((n,), jnp.int32)
    diffp = zeros1
    n_out = jnp.ones((n,))
    n_in = jnp.ones((n,))
    metal = zeros1
    rough = zeros1

    def mixv(mask, new, old):
        return jnp.where(mask[..., None], new, old)

    def mix(mask, new, old):
        return jnp.where(mask, new, old)

    # --- sphere fields (elements/sphere.rs:65-80) ---
    if scene.n_spheres:
        si = jnp.clip(idx, 0, scene.sph_c.shape[0] - 1)
        sph_norm = normalize(perfect - _gather(scene.sph_c, si), eps=1e-20)
        norm = mixv(is_sph, sph_norm, norm)
        rgb = mixv(is_sph, _gather(scene.sph_rgb, si), rgb)
        emissive = mixv(is_sph, _gather(scene.sph_emissive, si), emissive)
        has_em = mix(is_sph, _gather(scene.sph_has_em, si), has_em)
        mkind = mix(is_sph, _gather(scene.sph_kind, si), mkind)
        diffp = mix(is_sph, _gather(scene.sph_diffp, si), diffp)
        n_out = mix(is_sph, _gather(scene.sph_n_out, si), n_out)
        n_in = mix(is_sph, _gather(scene.sph_n_in, si), n_in)

    # --- free-triangle fields ---
    if scene.n_free_tris:
        fi = jnp.clip(idx, 0, scene.ft_v0.shape[0] - 1)
        norm = mixv(is_ft, _gather(scene.ft_norm, fi), norm)
        rgb = mixv(is_ft, _gather(scene.ft_rgb, fi), rgb)
        ft_em = _gather(scene.ft_emissive, fi)
        if params.mode == "cpu":
            # CPU zeroes ALL triangle emissive (generic.rs:85-86)
            pass
        else:
            emissive = mixv(is_ft, ft_em, emissive)
            has_em = mix(is_ft, _gather(scene.ft_has_em, fi), has_em)
        mkind = mix(is_ft, _gather(scene.ft_kind, fi), mkind)
        diffp = mix(is_ft, _gather(scene.ft_diffp, fi), diffp)
        n_out = mix(is_ft, _gather(scene.ft_n_out, fi), n_out)
        n_in = mix(is_ft, _gather(scene.ft_n_in, fi), n_in)

    # --- mesh-triangle fields ---
    if scene.n_mesh_tris:
        mi = jnp.clip(idx, 0, scene.mt_v0.shape[0] - 1)
        mt_const_norm = _gather(scene.mt_const_norm, mi)
        if scene.any_textured:
            has_nm = _gather(scene.mt_has_norm_map, mi)
            nrm_mat = _gather(scene.mt_nrm_mat, mi)
            nscale = _gather(scene.mt_norm_scale, mi)
            uvn = interp_uv(_gather(scene.mt_uv_norm, mi), bu, bv)
            ntex = _gather(scene.mt_norm_tex, mi)
            # raw [0,1] texel used as tangent-space vector — parity with
            # mesh/triangle.rs:149-151 (no 2x-1 remap in the reference)
            ntexel = sample_nearest(
                scene.tex_pool, ntex[:, 0], ntex[:, 1], ntex[:, 2], uvn[..., 0], uvn[..., 1]
            )
            mapped = normalize(
                nscale[..., None] * jnp.einsum("nab,nb->na", nrm_mat, ntexel), eps=1e-20
            )
            mt_norm = jnp.where(has_nm[..., None], mapped, mt_const_norm)

            uvr = interp_uv(_gather(scene.mt_uv_rgb, mi), bu, bv)
            rtex = _gather(scene.mt_rgb_tex, mi)
            rtexel = sample_nearest(
                scene.tex_pool, rtex[:, 0], rtex[:, 1], rtex[:, 2], uvr[..., 0], uvr[..., 1]
            )
            has_rt = rtex[:, 1] > 0
            mt_rgb = _gather(scene.mt_rgb_factor, mi) * jnp.where(
                has_rt[..., None], rtexel, 1.0
            )

            uvm = interp_uv(_gather(scene.mt_uv_mr, mi), bu, bv)
            mtex = _gather(scene.mt_mr_tex, mi)
            mtexel = sample_nearest(
                scene.tex_pool, mtex[:, 0], mtex[:, 1], mtex[:, 2], uvm[..., 0], uvm[..., 1]
            )
            has_mt_ = mtex[:, 1] > 0
            # metal scales the BLUE channel, rough the GREEN
            # (mesh/triangle.rs:195-197 == trace.wgsl:1120-1123)
            mt_metal = _gather(scene.mt_metal, mi) * jnp.where(has_mt_, mtexel[:, 2], 1.0)
            mt_rough = _gather(scene.mt_rough, mi) * jnp.where(has_mt_, mtexel[:, 1], 1.0)
        else:
            mt_norm = mt_const_norm
            mt_rgb = _gather(scene.mt_rgb_factor, mi)
            mt_metal = _gather(scene.mt_metal, mi)
            mt_rough = _gather(scene.mt_rough, mi)
        metal = mix(is_mt, mt_metal, metal)
        rough = mix(is_mt, mt_rough, rough)
        norm = mixv(is_mt, mt_norm, norm)
        rgb = mixv(is_mt, mt_rgb, rgb)

    pos = perfect + norm * EPS  # offset to avoid self-hit (sphere.rs:70 etc.)

    # --- material sampling (all lobes evaluated, masked select) ---
    spec_d = bsdf.sample_spec(rd, norm)
    diff_d = _diff_from_uniforms(rd, norm, u1, u2)
    refr_d, refr_w = _refract_from_uniform(rd, norm, n_out, n_in, u3, params.mode)
    ds_diff = u0 < diffp  # DiffSpec lobe choice (uniform_diff_spec.rs:27-37)

    uni_d = jnp.where(
        (mkind == 0)[..., None],
        spec_d,
        jnp.where(
            (mkind == 1)[..., None],
            diff_d,
            jnp.where(
                (mkind == 2)[..., None],
                jnp.where(ds_diff[..., None], diff_d, spec_d),
                refr_d,
            ),
        ),
    )
    uni_w = jnp.where(mkind == 3, refr_w, 1.0)

    # mesh PBR divert (mesh/triangle.rs:190-226)
    refl = bsdf.pbr_reflectance(metal, rd, norm)
    pbr_diff = u0 < (1.0 - refl)
    pbr_base = jnp.where(pbr_diff[..., None], diff_d, spec_d)
    scatter = normalize(jnp.stack([u4, u5, u6], axis=-1), eps=1e-20) * rough[..., None]
    pbr_d = normalize(pbr_base + scatter)

    new_d = jnp.where(is_mt[..., None], pbr_d, uni_d)
    weight = jnp.where(is_mt, 1.0, uni_w)

    return dict(
        norm=norm,
        pos=pos,
        rgb=rgb,
        emissive=emissive,
        has_em=has_em,
        new_d=new_d,
        weight=weight,
        should_dls=(mkind == 1) | ((mkind == 2) & ds_diff),
    )


def _diff_from_uniforms(d, n, u, v):
    """Cosine-weighted hemisphere from two supplied uniforms
    (interaction.rs:11-27)."""
    xd = normalize(d - n * dot(d, n)[..., None], eps=1e-20)
    yd = normalize(jnp.cross(n, xd), eps=1e-20)
    r = jnp.sqrt(u)
    thet = 2.0 * jnp.pi * v
    z = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    return normalize(
        xd * (r * jnp.cos(thet))[..., None]
        + yd * (r * jnp.sin(thet))[..., None]
        + n * z[..., None]
    )


def _refract_from_uniform(d, n, n_out, n_in, u, mode):
    """Dielectric from one supplied uniform; see bsdf.sample_refract."""
    c = dot(n, d)
    into = c < 0.0
    n1 = jnp.where(into, n_out, n_in)
    n2 = jnp.where(into, n_in, n_out)
    c1 = jnp.abs(c)
    nr = jnp.where(into[..., None], n, -n)
    n_over = n1 / n2
    c22 = 1.0 - n_over * n_over * (1.0 - c1 * c1)
    tir = c22 < 0.0
    refl_d = bsdf.sample_spec(d, nr)
    trns = d * n_over[..., None] + nr * (n_over * c1 - jnp.sqrt(jnp.maximum(c22, 0.0)))[..., None]
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    if mode == "gpu":
        cos_term = 1.0 - dot(trns, n)
    else:
        cos_term = 1.0 - jnp.where(into, c1, dot(trns, n))
    re = r0 + (1.0 + r0) * cos_term**5
    do_refl = tir | (u < re)
    new_d = jnp.where(do_refl[..., None], refl_d, normalize(trns, eps=1e-20))
    w_refl = jnp.float32(1.0) if mode == "gpu" else jnp.where(tir, 1.0, re)
    return new_d, jnp.where(do_refl, w_refl, 1.0 - re)


# ---------------------------------------------------------------------------
# bounce loop


def _bounce_step(scene, params, st):
    """One bounce for all lanes. st is the lane-state dict."""
    ro, rd = st["ro"], st["rd"]
    t, kind, idx, bu, bv = closest_hit(scene, params, ro, rd)
    state, draws = rng.next_f32_n(st["rng"], 8)
    u7 = draws[7]

    hit = kind != KIND_NONE
    miss = ~hit
    active = st["active"]

    shade = _shade_hit(scene, params, ro, rd, t, kind, idx, bu, bv, draws[:7])

    L, ci, inten = st["L"], st["ci"], st["inten"]
    if scene.has_cubemap:
        sky = cubemap.sample(
            scene.tex_pool, scene.cm_offsets, scene.cm_dims, scene.cm_uv_scales, rd
        )
    else:
        sky = jnp.zeros_like(L)

    if params.mode == "gpu":
        # -- miss: cubemap emissive, terminate (trace.wgsl:437-444) --
        add_sky = (active & miss)[..., None]
        L = L + jnp.where(add_sky, sky * ci * inten[..., None], 0.0)
        # -- emissive hit: add + extra colour multiply (wgsl:294-301) --
        add_em = (active & hit & shade["has_em"])[..., None]
        L = L + jnp.where(add_em, shade["emissive"] * ci * inten[..., None], 0.0)
        ci = jnp.where(add_em, ci * shade["rgb"], ci)
        # -- throughput *= colour (wgsl:303) --
        ci = jnp.where((active & hit)[..., None], ci * shade["rgb"], ci)
        # -- russian roulette (wgsl:306-310) --
        rr_due = st["bounce"] >= params.assured_depth
        rr_kill = rr_due & (u7 > params.max_thres)
        term = active & hit & rr_kill
        ci_rr = ci / params.max_thres
        L = L + jnp.where(term[..., None], ci_rr * inten[..., None], 0.0)
        ci = jnp.where(term[..., None], ci_rr, ci)
        survive = active & hit & ~rr_kill
        inten = jnp.where(survive, inten * shade["weight"], inten)
        new_active = survive
    else:
        # -- CPU semantics (radiance.rs:20-72) --
        add_sky = (active & miss & scene.has_cubemap)[..., None] if scene.has_cubemap else jnp.zeros((ro.shape[0], 1), bool)
        # skybox: CPU's closest-hit reaches it as l=inf "unconditional"
        # element when nothing else hits; emissive added, path ends.
        L = L + jnp.where(add_sky, sky * ci, 0.0)
        L = L + jnp.where((active & hit)[..., None], shade["emissive"] * ci, 0.0)
        rr_due = st["bounce"] > params.assured_depth
        rr_pass = jnp.where(rr_due, u7 < CPU_RR_THRES, True)
        atten = jnp.where(rr_due, CPU_RR_THRES, 1.0)
        survive = active & hit & rr_pass
        bounce_rgb = shade["rgb"] * shade["weight"][..., None] / atten[..., None]
        ci = jnp.where(survive[..., None], ci * bounce_rgb, ci)
        inten = inten
        new_active = survive

    if params.debug_single_ray:
        # first-hit emissive only (radiance.rs:31-33); skybox shows sky
        L = jnp.where((active & hit)[..., None], shade["emissive"], L)
        L = jnp.where((active & miss)[..., None], sky, L)
        new_active = jnp.zeros_like(new_active)

    st = dict(
        ro=jnp.where(new_active[..., None], shade["pos"], ro),
        rd=jnp.where(new_active[..., None], shade["new_d"], rd),
        L=L,
        ci=ci,
        inten=inten,
        rng=state,
        active=new_active,
        bounce=st["bounce"] + new_active.astype(jnp.int32),
    )
    return st


def trace_paths(scene, params: IntegratorParams, ro, rd, rng_state):
    """Trace a batch of rays to completion. Returns (L, final_rng).

    Forward rendering uses a while_loop that exits when every lane is
    dead; the differentiable path uses a fixed-length scan (reverse-mode
    through while_loop is not supported)."""
    n = ro.shape[0]
    st = dict(
        ro=ro,
        rd=rd,
        L=jnp.zeros((n, 3)),
        ci=jnp.ones((n, 3)),
        inten=jnp.ones((n,)),
        rng=rng_state,
        active=jnp.ones((n,), bool),
        bounce=jnp.zeros((n,), jnp.int32),
    )
    max_b = 1 if params.debug_single_ray else params.max_bounces

    if params.differentiable:
        def body(st, _):
            return _bounce_step(scene, params, st), None

        st, _ = jax.lax.scan(body, st, None, length=max_b)
    else:
        def cond(carry):
            i, st = carry
            return (i < max_b) & jnp.any(st["active"])

        def body(carry):
            i, st = carry
            return i + 1, _bounce_step(scene, params, st)

        _, st = jax.lax.while_loop(cond, body, (0, st))
    return st["L"], st["rng"]
