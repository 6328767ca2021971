"""Fused Pallas path-tracing kernel (sphere + free-triangle scenes).

One pallas_call per sample round runs the ENTIRE per-lane bounce loop
(raygen -> closest-hit -> shade -> russian roulette) in VMEM — the XLA
integrator issues ~40 small kernels per bounce, and per-kernel overhead
dominates its runtime; here a tile of 8192 lanes lives in registers/
VMEM across all bounces of a sample.

Scope (v1): 'gpu'-semantics scenes whose primitives are spheres and
free triangles (<= 64 each, unrolled against SMEM scalars) — exactly
the reference's headline benchmark class (walled.yml = 13 spheres,
README.md:170's 1650x case, plus triangles.yml). Cube-map misses are
NOT sampled in-kernel: a lane misses at most once and then terminates,
so the kernel emits (miss_weight = ci*intensity, miss_dir = ray dir)
per lane and the caller adds `miss_weight * cubemap(miss_dir)` with a
plain XLA gather — bitwise-equivalent radiance, no HBM gathers inside
the kernel.

The RNG (ops.rng PCG family) and the per-bounce draw budget (8
uniforms, same order) are IDENTICAL to the XLA integrator, so both
paths produce the same image up to float reassociation — which is the
cross-check in tests/test_pallas.py.

Formula parity citations: see render/integrator.py (the formulas are
the same trace.wgsl/interaction.rs ones).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import rng as _rng_mod

EPS = 1e-4
INF = 3.4e38  # MAXF-like sentinel (avoid inf arithmetic)

LANES = 128
SUBLANES = 8  # 8 x 128 = 1024 lanes per grid program (keeps the
# while-loop carry at one vreg per state array; larger blocks unroll
# the whole bounce body 8x in Mosaic and explode compile time)

_U32 = jnp.uint32

# sphere table columns (S, 15)
_SC = dict(cx=0, cy=1, cz=2, r=3, rr=4, gg=5, bb=6, em_r=7, em_g=8, em_b=9,
           has_em=10, kind=11, diffp=12, n_out=13, n_in=14)
# free-triangle table columns (F, 21)
_FC = dict(v0x=0, v0y=1, v0z=2, e1x=3, e1y=4, e1z=5, e2x=6, e2y=7, e2z=8,
           nx=9, ny=10, nz=11, rr=12, gg=13, bb=14, em_r=15, em_g=16, em_b=17,
           has_em=18, kind=19, diffp=20, n_out=21, n_in=22)
_FCOLS = 23


class SceneHints(NamedTuple):
    """Scene-constant facts that let the unrolled kernel skip select
    chains statically. The bounce loop is unrolled over primitives in
    Python, so any per-primitive fact known at pack time deletes VPU
    ops at trace time (the kernel is VPU-roofline-bound; every select
    saved is throughput). Material layout is stable across animation
    frames (only geometry animates, builder/inner.rs:128-211), so
    hints stay valid for a scheme's whole run.

    *_fd = "first dirty" index per attribute group: prims before it
    hold the group's default value (tables are sorted attribute-poor
    first by pack_scene_tables), so their selects are identity and are
    skipped. uni_diffp / uni_n: when every DiffSpec (resp. Dielectric)
    primitive in the scene shares one diffp (resp. (n_out, n_in)), the
    value is a compile-time constant and the whole select chain drops
    (the value is only ever consumed on lanes whose hit HAS that
    material kind). any_em / any_refr / any_ds gate whole shading
    blocks for scenes without that material."""

    sph_fd: Tuple[int, int, int, int]  # (rgb, em, kind, center)
    ft_fd: Tuple[int, int, int, int]  # (rgb, em, kind, norm)
    sph_fd_diffp: int
    sph_fd_n: int
    ft_fd_diffp: int
    ft_fd_n: int
    uni_diffp: Optional[float]
    uni_n: Optional[Tuple[float, float]]
    any_em: bool
    any_refr: bool
    any_ds: bool


# no specialization: every chain dirty from prim 0, nothing uniform
_PERMISSIVE = SceneHints(
    sph_fd=(0, 0, 0, 0), ft_fd=(0, 0, 0, 0),
    sph_fd_diffp=0, sph_fd_n=0, ft_fd_diffp=0, ft_fd_n=0,
    uni_diffp=None, uni_n=None, any_em=True, any_refr=True, any_ds=True,
)

_NEVER = 1 << 30  # first-dirty sentinel: chain never dirty


def _first_dirty(dirty: np.ndarray) -> int:
    nz = np.nonzero(dirty)[0]
    return int(nz[0]) if nz.size else _NEVER


def _sph_dirty(sph: np.ndarray, n: int):
    s = sph[:n]
    return dict(
        rgb=(s[:, 4:7] != 0.0).any(1),
        em=(s[:, 7:11] != 0.0).any(1),
        kind=s[:, 11] != 0.0,
        c=(s[:, 0:3] != 0.0).any(1),
        diffp=s[:, 12] != 0.0,
        n=(s[:, 13] != 1.0) | (s[:, 14] != 1.0),
    )


def _ft_dirty(ft: np.ndarray, n: int):
    f = ft[:n]
    return dict(
        rgb=(f[:, 12:15] != 0.0).any(1),
        em=(f[:, 15:19] != 0.0).any(1),
        kind=f[:, 19] != 0.0,
        norm=(f[:, 9:12] != 0.0).any(1),
        diffp=f[:, 20] != 0.0,
        n=(f[:, 21] != 1.0) | (f[:, 22] != 1.0),
    )


def scene_static_hints(sph: np.ndarray, ft: np.ndarray, n_sph: int, n_ft: int) -> SceneHints:
    """Derive SceneHints from packed (already sorted) tables."""
    sd = _sph_dirty(np.asarray(sph), n_sph)
    fd = _ft_dirty(np.asarray(ft), n_ft)

    def kinds_of(table, n, kcol):
        return np.asarray(table)[:n, kcol]

    sk = kinds_of(sph, n_sph, 11)
    fk = kinds_of(ft, n_ft, 19)
    any_ds = bool((sk == 2.0).any() or (fk == 2.0).any())
    any_refr = bool((sk == 3.0).any() or (fk == 3.0).any())
    any_em = bool(sd["em"].any() or fd["em"].any())

    # uniform diffp over every DiffSpec prim (consumed only when the
    # hit lane's mkind == 2)
    dvals = np.concatenate([
        np.asarray(sph)[:n_sph, 12][sk == 2.0],
        np.asarray(ft)[:n_ft, 20][fk == 2.0],
    ])
    uni_diffp: Optional[float] = 0.0 if dvals.size == 0 else (
        float(dvals[0]) if bool((dvals == dvals[0]).all()) else None
    )
    # uniform (n_out, n_in) over every Dielectric prim
    nvals = np.concatenate([
        np.asarray(sph)[:n_sph, 13:15][sk == 3.0],
        np.asarray(ft)[:n_ft, 21:23][fk == 3.0],
    ])
    uni_n: Optional[Tuple[float, float]] = (1.0, 1.0) if nvals.shape[0] == 0 else (
        (float(nvals[0, 0]), float(nvals[0, 1]))
        if bool((nvals == nvals[0]).all()) else None
    )
    def ft_first(group):
        # the ft loop runs AFTER the sphere loop on the SAME running
        # variables: once any sphere dirtied a group, every ft prim
        # must select (reset lanes whose best hit was that sphere)
        return 0 if bool(sd[group].any()) else _first_dirty(fd[group])

    return SceneHints(
        sph_fd=(
            _first_dirty(sd["rgb"]), _first_dirty(sd["em"]),
            _first_dirty(sd["kind"]), _first_dirty(sd["c"]),
        ),
        ft_fd=(
            ft_first("rgb"), ft_first("em"),
            ft_first("kind"), _first_dirty(fd["norm"]),
        ),
        sph_fd_diffp=_first_dirty(sd["diffp"]),
        sph_fd_n=_first_dirty(sd["n"]),
        ft_fd_diffp=ft_first("diffp"),
        ft_fd_n=ft_first("n"),
        uni_diffp=uni_diffp,
        uni_n=uni_n,
        any_em=any_em,
        any_refr=any_refr,
        any_ds=any_ds,
    )


def _richness_order(dirty: dict, n: int) -> np.ndarray:
    """Sort prims attribute-poor first so first-dirty indices sit as
    late as possible. Weight = selects the attribute group costs.
    Order among equal scores is preserved; prim order has no semantic
    meaning beyond exact-t tie-breaks (measure zero)."""
    score = (
        4 * dirty["em"].astype(int)
        + 1 * dirty["kind"].astype(int)
        + 1 * dirty["diffp"].astype(int)
        + 2 * dirty["n"].astype(int)
        + 3 * dirty["rgb"].astype(int)
        # spheres carry "c" (center), free tris "norm" — 3 selects each
        + 3 * dirty.get("c", dirty.get("norm")).astype(int)
    )
    return np.argsort(score[:n], kind="stable")


def _jenkins(x):
    x = x + (x << _U32(10))
    x = x ^ (x >> _U32(6))
    x = x + (x << _U32(3))
    x = x ^ (x >> _U32(11))
    x = x + (x << _U32(15))
    return x


# ONE generator for kernels and the XLA integrator: ops.rng is plain
# jnp (24-bit conversion — Mosaic has no uint32->f32 cast) and lowers
# under Mosaic unchanged, so stream parity between the two is by
# construction, for whichever family ops.rng.GENERATOR selects.
_next_f32 = _rng_mod.next_f32


def _norm3(x, y, z, tiny=1e-30):
    n2 = x * x + y * y + z * z
    inv = jax.lax.rsqrt(jnp.where(n2 > tiny, n2, tiny))
    return x * inv, y * inv, z * inv


def closest_sph_ft(sph_ref, ft_ref, ox, oy, oz, dx, dy, dz,
                   *, n_sph: int, n_ft: int, hints: "SceneHints"):
    """Unrolled closest-hit over the sphere/free-tri SMEM tables with
    in-pass attribute selection (shared by the meshless fused kernel
    and the mesh bounce kernel — see the _kernel docstring below for
    the op-level rationale). Returns a dict of running (block-shaped)
    values: t_best, kind (0 none / 1 sphere / 2 freetri; only tracked
    when both kinds exist), scx/scy/scz (best-sphere center),
    nxv/nyv/nzv (free-tri stored normal), rgb_*, em_*, has_em, mkind,
    diffp, n_out, n_in, plus the static flags track_kind / sel_diffp /
    sel_n."""
    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    track_kind = n_sph > 0 and n_ft > 0
    sel_diffp = hints.uni_diffp is None
    sel_n = hints.uni_n is None
    s_ = dict(
        t_best=jnp.full_like(dx, INF),
        kind=zero,
        scx=zero, scy=zero, scz=zero,
        nxv=zero, nyv=zero, nzv=zero,
        rgb_r=zero, rgb_g=zero, rgb_b=zero,
        em_r=zero, em_g=zero, em_b=zero,
        has_em=zero, mkind=zero,
        diffp=jnp.float32(hints.uni_diffp) if not sel_diffp else zero,
        n_out=one if sel_n else jnp.float32(hints.uni_n[0]),
        n_in=one if sel_n else jnp.float32(hints.uni_n[1]),
        track_kind=track_kind, sel_diffp=sel_diffp, sel_n=sel_n,
    )

    def sel_common(better, g, i, fd, fd_diffp, fd_n):
        if i >= fd[0]:
            s_["rgb_r"] = jnp.where(better, g("rr"), s_["rgb_r"])
            s_["rgb_g"] = jnp.where(better, g("gg"), s_["rgb_g"])
            s_["rgb_b"] = jnp.where(better, g("bb"), s_["rgb_b"])
        if i >= fd[1]:
            s_["em_r"] = jnp.where(better, g("em_r"), s_["em_r"])
            s_["em_g"] = jnp.where(better, g("em_g"), s_["em_g"])
            s_["em_b"] = jnp.where(better, g("em_b"), s_["em_b"])
            s_["has_em"] = jnp.where(better, g("has_em"), s_["has_em"])
        if i >= fd[2]:
            s_["mkind"] = jnp.where(better, g("kind"), s_["mkind"])
        if sel_diffp and i >= fd_diffp:
            s_["diffp"] = jnp.where(better, g("diffp"), s_["diffp"])
        if sel_n and i >= fd_n:
            s_["n_out"] = jnp.where(better, g("n_out"), s_["n_out"])
            s_["n_in"] = jnp.where(better, g("n_in"), s_["n_in"])

    for si in range(n_sph):
        s = lambda k: sph_ref[si, _SC[k]]
        ocx, ocy, ocz = ox - s("cx"), oy - s("cy"), oz - s("cz")
        dirv = dx * ocx + dy * ocy + dz * ocz
        consts = ocx * ocx + ocy * ocy + ocz * ocz - s("r") * s("r")
        disc = dirv * dirv - consts
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        near = -dirv - sq
        t_i = jnp.where(pos & (near > 0.0), near, INF)
        better = t_i < s_["t_best"]
        s_["t_best"] = jnp.where(better, t_i, s_["t_best"])
        if track_kind:
            s_["kind"] = jnp.where(better, 1.0, s_["kind"])
        if si >= hints.sph_fd[3]:
            s_["scx"] = jnp.where(better, s("cx"), s_["scx"])
            s_["scy"] = jnp.where(better, s("cy"), s_["scy"])
            s_["scz"] = jnp.where(better, s("cz"), s_["scz"])
        sel_common(better, s, si, hints.sph_fd, hints.sph_fd_diffp, hints.sph_fd_n)
    for fi in range(n_ft):
        f = lambda k: ft_ref[fi, _FC[k]]
        e1x, e1y, e1z = f("e1x"), f("e1y"), f("e1z")
        e2x, e2y, e2z = f("e2x"), f("e2y"), f("e2z")
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) >= EPS
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        hx, hy, hz = ox - f("v0x"), oy - f("v0y"), oz - f("v0z")
        u = inv_det * (hx * pvx + hy * pvy + hz * pvz)
        qx = hy * e1z - hz * e1y
        qy = hz * e1x - hx * e1z
        qz = hx * e1y - hy * e1x
        w = inv_det * (dx * qx + dy * qy + dz * qz)
        t_i = inv_det * (e2x * qx + e2y * qy + e2z * qz)
        ok = ok & (u >= 0.0) & (u <= 1.0) & (w >= 0.0) & (u + w <= 1.0) & (t_i >= EPS)
        t_i = jnp.where(ok, t_i, INF)
        better = t_i < s_["t_best"]
        s_["t_best"] = jnp.where(better, t_i, s_["t_best"])
        if track_kind:
            s_["kind"] = jnp.where(better, 2.0, s_["kind"])
        if fi >= hints.ft_fd[3]:
            s_["nxv"] = jnp.where(better, f("nx"), s_["nxv"])
            s_["nyv"] = jnp.where(better, f("ny"), s_["nyv"])
            s_["nzv"] = jnp.where(better, f("nz"), s_["nzv"])
        sel_common(better, f, fi, hints.ft_fd, hints.ft_fd_diffp, hints.ft_fd_n)
    return s_


def uniform_bsdf(dx, dy, dz, nxv, nyv, nzv, mkind, diffp, n_out, n_in,
                 u0, u1, u2, u3, *, hints: "SceneHints"):
    """Uniform-material BSDF sampling for a sphere/free-tri hit
    (integrator._shade_hit's masked-lobe combine): mirror spec, cosine
    diffuse, gpu-mode dielectric. Returns (ndx, ndy, ndz, weight) with
    weight None when the scene has no dielectric (intensity stays 1)."""
    dn = dx * nxv + dy * nyv + dz * nzv
    # spec: reflect(unit, unit) is unit — no renormalize (d and n are
    # unit by construction: raygen/BSDF outputs and build-normalized /
    # _norm3'd normals)
    sdx, sdy, sdz = dx - nxv * (2.0 * dn), dy - nyv * (2.0 * dn), dz - nzv * (2.0 * dn)
    # diff: frame (xd, yd, n). xd needs the normalize (|d - n(d.n)| =
    # sin theta); yd = n x xd of two orthonormal vectors is unit, and
    # the cosine-weighted combination has |.|^2 = r^2 cos^2 + r^2 sin^2
    # + (1-u1) = 1 exactly, so neither needs one. (Same reduction
    # mirrored in integrator._diff_dir — kernel/XLA bit-parity tests
    # cover both sides.)
    xdx, xdy, xdz = _norm3(dx - nxv * dn, dy - nyv * dn, dz - nzv * dn)
    ydx = nyv * xdz - nzv * xdy
    ydy = nzv * xdx - nxv * xdz
    ydz = nxv * xdy - nyv * xdx
    r_ = jnp.sqrt(u1)
    th = (2.0 * np.pi) * u2
    ca, sa = r_ * jnp.cos(th), r_ * jnp.sin(th)
    zz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    ddx = xdx * ca + ydx * sa + nxv * zz
    ddy = xdy * ca + ydy * sa + nyv * zz
    ddz = xdz * ca + ydz * sa + nzv * zz
    if hints.any_ds:
        ds_diff = u0 < diffp
        is_diff = (mkind == 1.0) | ((mkind == 2.0) & ds_diff)
    else:
        is_diff = mkind == 1.0

    if hints.any_refr:
        # dielectric (gpu mode)
        into = dn < 0.0
        n1 = jnp.where(into, n_out, n_in)
        n2 = jnp.where(into, n_in, n_out)
        c1 = jnp.abs(dn)
        nrx = jnp.where(into, nxv, -nxv)
        nry = jnp.where(into, nyv, -nyv)
        nrz = jnp.where(into, nzv, -nzv)
        n_over = n1 / n2
        c22 = 1.0 - n_over * n_over * (1.0 - c1 * c1)
        tir = c22 < 0.0
        dnr = dx * nrx + dy * nry + dz * nrz
        # reflect(unit, unit) and the Snell-constructed transmission
        # (|t|^2 = n_over^2 (1 - c1^2) + c22 = 1 exactly; the TIR arm
        # is d itself) are unit — no renormalizes (mirrored in
        # integrator._refract_dir)
        refx = dx - nrx * (2.0 * dnr)
        refy = dy - nry * (2.0 * dnr)
        refz = dz - nrz * (2.0 * dnr)
        sq22 = jnp.sqrt(jnp.where(c22 > 0.0, c22, 1.0))
        k_t = n_over * c1 - sq22
        tx = jnp.where(tir, dx, dx * n_over + nrx * k_t)
        ty = jnp.where(tir, dy, dy * n_over + nry * k_t)
        tz = jnp.where(tir, dz, dz * n_over + nrz * k_t)
        r0 = ((n1 - n2) / (n1 + n2)) ** 2
        cos_term = 1.0 - (tx * nxv + ty * nyv + tz * nzv)
        re = r0 + (1.0 + r0) * cos_term**5
        do_refl = tir | (u3 < re)
        rfx = jnp.where(do_refl, refx, tx)
        rfy = jnp.where(do_refl, refy, ty)
        rfz = jnp.where(do_refl, refz, tz)
        refr_w = jnp.where(do_refl, 1.0, 1.0 - re)

        is_refr = mkind == 3.0
        ndx = jnp.where(is_refr, rfx, jnp.where(is_diff, ddx, sdx))
        ndy = jnp.where(is_refr, rfy, jnp.where(is_diff, ddy, sdy))
        ndz = jnp.where(is_refr, rfz, jnp.where(is_diff, ddz, sdz))
        weight = jnp.where(is_refr, refr_w, 1.0)
    else:
        ndx = jnp.where(is_diff, ddx, sdx)
        ndy = jnp.where(is_diff, ddy, sdy)
        ndz = jnp.where(is_diff, ddz, sdz)
        weight = None  # no dielectric -> intensity stays 1
    return ndx, ndy, ndz, weight


def _kernel(
    # refs
    xs_ref, ys_ref, samp_ref, seed_ref, sph_ref, ft_ref, cam_ref,
    lx_ref, ly_ref, lz_ref, mdx_ref, mdy_ref, mdz_ref,
    mwr_ref, mwg_ref, mwb_ref,
    *, n_sph: int, n_ft: int, has_lens: bool, assured: int,
    max_bounces: int, samples_per_lane: int = 1,
    hints: SceneHints = _PERMISSIVE, hw_rng: bool = False,
):
    xs = xs_ref[...].astype(jnp.float32)
    ys = ys_ref[...].astype(jnp.float32)
    spl = samples_per_lane

    # camera scalars (SMEM)
    c = lambda i: cam_ref[0, i]
    ox_c, oy_c, oz_c = c(0), c(1), c(2)
    dx_c, dy_c, dz_c = c(3), c(4), c(5)
    ux, uy, uz = c(6), c(7), c(8)
    rx, ry, rz = c(9), c(10), c(11)
    x_cf, y_cf, x_off, y_off, lens_r = c(12), c(13), c(14), c(15), c(16)
    max_thres = c(17)
    pix = xs_ref[...].astype(_U32) ^ (ys_ref[...].astype(_U32) << _U32(16))
    # loop-invariant raygen terms, hoisted out of start_sample (which
    # runs EVERY bounce for in-kernel sample regeneration): the pixel
    # hash and the pre-jitter ray direction depend only on the lane
    s_x = x_cf * (xs - x_off)
    s_y = y_cf * (ys - y_off)
    bdx = dx_c + s_x * rx + s_y * ux
    bdy = dy_c + s_x * ry + s_y * uy
    bdz = dz_c + s_x * rz + s_y * uz

    if hw_rng:
        # hardware PRNG (opt-in): the counter RNG costs ~2 emulated
        # u32 multiplies per draw plus a 2x-jenkins reseed per sample
        # regeneration — measurably the kernel's priciest ops. The
        # per-core generator is seeded once per (launch, grid program);
        # draws are NOT keyed by (pixel, sample), so bit-exact resume /
        # integrator parity don't hold in this mode (statistical golden
        # means do — tests/test_pallas.py::test_hw_rng_statistics).
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531527))

        def nxt(state):
            bits = pltpu.bitcast(pltpu.prng_random_bits(xs.shape), _U32)
            b24 = (bits >> _U32(8)).astype(jnp.int32)
            return state, b24.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)
    else:
        hpix = _jenkins(pix)
        nxt = _next_f32

    def start_sample(samp_u32):
        """rng init (ops/rng.py init_state) + camera raygen
        (ray/generate.rs:13-66) for this lane's sample id."""
        if hw_rng:
            state = samp_u32  # carry placeholder; hw draws are stateless
        else:
            seed = hpix ^ _jenkins(samp_u32 ^ _U32(0x9E3779B9))
            state = _jenkins(seed)
        dx, dy, dz = bdx, bdy, bdz
        if has_lens:
            state, u = nxt(state)
            state, v = nxt(state)
            r_ = jnp.sqrt(u)
            th = (2.0 * np.pi) * v
            lx = (r_ - 0.5) * 2.0 * lens_r * jnp.cos(th)
            ly_ = (r_ - 0.5) * 2.0 * lens_r * jnp.sin(th)
            offx = rx * lx + ux * ly_
            offy = ry * lx + uy * ly_
            offz = rz * lx + uz * ly_
            ox, oy, oz = offx + ox_c, offy + oy_c, offz + oz_c
            dx, dy, dz = dx - offx, dy - offy, dz - offz
        else:
            one_ = jnp.ones_like(xs)
            ox, oy, oz = one_ * ox_c, one_ * oy_c, one_ * oz_c
        state, ju = nxt(state)
        state, jv = nxt(state)
        dx = dx + rx * ((ju - 0.5) * x_cf) + ux * ((jv - 0.5) * y_cf)
        dy = dy + ry * ((ju - 0.5) * x_cf) + uy * ((jv - 0.5) * y_cf)
        dz = dz + rz * ((ju - 0.5) * x_cf) + uz * ((jv - 0.5) * y_cf)
        dx, dy, dz = _norm3(dx, dy, dz)
        return state, ox, oy, oz, dx, dy, dz

    samp0 = samp_ref[...].astype(_U32)
    state, ox, oy, oz, dx, dy, dz = start_sample(samp0)

    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)

    def bounce(carry):
        (i, state, ox, oy, oz, dx, dy, dz, cir, cig, cib, inten,
         lr, lg, lb, mdx, mdy, mdz, mwr, mwg, mwb, active_f, depth, sk) = carry
        active = active_f > 0.5

        # ---- closest hit + attribute gather, ONE unrolled pass ----
        # The attributes of the current best primitive are selected with
        # the same `better` mask the t-min select uses (last strictly
        # closer hit wins), which removes the second 13-way select pass
        # and its per-primitive mask recompute, and the per-sphere
        # normalize: the sphere normal is computed once post-loop from
        # the selected center. `near < far` <=> sqrt(disc) > 0 <=>
        # disc > 0, so the redundant compare is dropped. SceneHints
        # statically delete selects whose value cannot differ from the
        # running default (see SceneHints docstring).
        s_ = closest_sph_ft(
            sph_ref, ft_ref, ox, oy, oz, dx, dy, dz,
            n_sph=n_sph, n_ft=n_ft, hints=hints,
        )
        track_kind = s_["track_kind"]
        t_best, kind = s_["t_best"], s_["kind"]
        scx, scy, scz = s_["scx"], s_["scy"], s_["scz"]
        nxv, nyv, nzv = s_["nxv"], s_["nyv"], s_["nzv"]
        rgb_r, rgb_g, rgb_b = s_["rgb_r"], s_["rgb_g"], s_["rgb_b"]
        em_r, em_g, em_b = s_["em_r"], s_["em_g"], s_["em_b"]
        has_em, mkind = s_["has_em"], s_["mkind"]
        diffp, n_out, n_in = s_["diffp"], s_["n_out"], s_["n_in"]

        hit = kind > 0.5 if track_kind else t_best < INF
        miss = ~hit

        # ---- per-bounce draws (same budget/order as the integrator's
        # meshless 5-draw path) --
        state, u0 = nxt(state)
        state, u1 = nxt(state)
        state, u2 = nxt(state)
        state, u3 = nxt(state)
        state, u7 = nxt(state)

        t_safe = jnp.where(hit, t_best, 0.0)
        px = ox + dx * t_safe
        py = oy + dy * t_safe
        pz = oz + dz * t_safe
        if n_sph:
            snx, sny, snz = _norm3(px - scx, py - scy, pz - scz)
            if track_kind:
                is_sph = kind == 1.0
                nxv = jnp.where(is_sph, snx, nxv)
                nyv = jnp.where(is_sph, sny, nyv)
                nzv = jnp.where(is_sph, snz, nzv)
            else:
                # sphere-only scene: the normal is only consumed on
                # surviving (hit) lanes, so assign unconditionally
                nxv, nyv, nzv = snx, sny, snz

        posx = px + nxv * EPS
        posy = py + nyv * EPS
        posz = pz + nzv * EPS

        # ---- BSDF sampling (see integrator._shade_hit) ----
        ndx, ndy, ndz, weight = uniform_bsdf(
            dx, dy, dz, nxv, nyv, nzv, mkind, diffp, n_out, n_in,
            u0, u1, u2, u3, hints=hints,
        )

        # ---- gpu-mode radiance update (trace.wgsl:290-315) ----
        # no dielectric in scene -> inten is identically 1; drop the
        # three per-channel products at each radiance add
        mul_i = (lambda a: a) if weight is None else (lambda a: a * inten)
        add_miss = active & miss
        mdx = jnp.where(add_miss, dx, mdx)
        mdy = jnp.where(add_miss, dy, mdy)
        mdz = jnp.where(add_miss, dz, mdz)
        # miss weight per channel = throughput * intensity at miss time
        mwr = jnp.where(add_miss, mul_i(cir), mwr)
        mwg = jnp.where(add_miss, mul_i(cig), mwg)
        mwb = jnp.where(add_miss, mul_i(cib), mwb)

        if hints.any_em:
            add_em = active & hit & (has_em > 0.5)
            lr = lr + jnp.where(add_em, em_r * mul_i(cir), 0.0)
            lg = lg + jnp.where(add_em, em_g * mul_i(cig), 0.0)
            lb = lb + jnp.where(add_em, em_b * mul_i(cib), 0.0)
            cir = jnp.where(add_em, cir * rgb_r, cir)
            cig = jnp.where(add_em, cig * rgb_g, cig)
            cib = jnp.where(add_em, cib * rgb_b, cib)

        hm = active & hit
        cir = jnp.where(hm, cir * rgb_r, cir)
        cig = jnp.where(hm, cig * rgb_g, cig)
        cib = jnp.where(hm, cib * rgb_b, cib)

        rr_due = depth >= float(assured)
        rr_kill = rr_due & (u7 > max_thres)
        term = hm & rr_kill
        inv_thres = 1.0 / max_thres
        lr = lr + jnp.where(term, mul_i(cir * inv_thres), 0.0)
        lg = lg + jnp.where(term, mul_i(cig * inv_thres), 0.0)
        lb = lb + jnp.where(term, mul_i(cib * inv_thres), 0.0)
        cir = jnp.where(term, cir * inv_thres, cir)
        cig = jnp.where(term, cig * inv_thres, cig)
        cib = jnp.where(term, cib * inv_thres, cib)

        survive = hm & ~rr_kill
        if weight is not None:
            inten = jnp.where(survive, inten * weight, inten)

        ox = jnp.where(survive, posx, ox)
        oy = jnp.where(survive, posy, oy)
        oz = jnp.where(survive, posz, oz)
        dx = jnp.where(survive, ndx, dx)
        dy = jnp.where(survive, ndy, dy)
        dz = jnp.where(survive, ndz, dz)
        depth = depth + jnp.where(survive, 1.0, 0.0)

        if spl > 1:
            # in-kernel sample regeneration: a dead lane with samples
            # left starts its NEXT (pixel, sample) path immediately, so
            # the block's while_loop pays the max-path-length tail once
            # per launch instead of once per sample round. (Launches
            # with spl > 1 must not need the miss outputs — the driver
            # gates this on scenes without a cubemap.)
            alive = survive & (depth < float(max_bounces))  # per-lane cap
            regen = (~alive) & (sk + 1.0 < float(spl))
            sk = sk + jnp.where(regen, 1.0, 0.0)
            samp_u = samp0 + sk.astype(jnp.int32).astype(_U32)
            st2, ox2, oy2, oz2, dx2, dy2, dz2 = start_sample(samp_u)
            state = jnp.where(regen, st2, state)
            ox = jnp.where(regen, ox2, ox)
            oy = jnp.where(regen, oy2, oy)
            oz = jnp.where(regen, oz2, oz)
            dx = jnp.where(regen, dx2, dx)
            dy = jnp.where(regen, dy2, dy)
            dz = jnp.where(regen, dz2, dz)
            cir = jnp.where(regen, 1.0, cir)
            cig = jnp.where(regen, 1.0, cig)
            cib = jnp.where(regen, 1.0, cib)
            inten = jnp.where(regen, 1.0, inten)
            depth = jnp.where(regen, 0.0, depth)
            active_new = jnp.where(alive | regen, 1.0, 0.0)
        else:
            active_new = jnp.where(survive, 1.0, 0.0)

        return (i + 1, state, ox, oy, oz, dx, dy, dz, cir, cig, cib, inten,
                lr, lg, lb, mdx, mdy, mdz, mwr, mwg, mwb,
                active_new, depth, sk)

    def cond(carry):
        i = carry[0]
        active_f = carry[-3]
        return (i < max_bounces * spl) & (jnp.max(active_f) > 0.5)

    init = (0, state, ox, oy, oz, dx, dy, dz, one, one, one, one,
            zero, zero, zero, zero, zero, zero, zero, zero, zero,
            one, zero, zero)
    out = jax.lax.while_loop(cond, bounce, init)
    (_, _, _, _, _, _, _, _, _, _, _, _, lr, lg, lb,
     mdx, mdy, mdz, mwr, mwg, mwb, _, _, _) = out

    lx_ref[...] = lr
    ly_ref[...] = lg
    lz_ref[...] = lb
    mdx_ref[...] = mdx
    mdy_ref[...] = mdy
    mdz_ref[...] = mdz
    mwr_ref[...] = mwr
    mwg_ref[...] = mwg
    mwb_ref[...] = mwb


def pack_scene_tables(scene):
    """SceneArrays -> (sph_table (S,15), ft_table (F,23)) numpy f32.

    Rows are sorted attribute-poor first (see _richness_order) so
    scene_static_hints' first-dirty indices land as late as possible —
    primitive order only affects exact-t tie-breaks."""
    S = int(scene.n_spheres)
    F = int(scene.n_free_tris)
    sph = np.zeros((max(S, 1), 15), np.float32)
    if S:
        sph[:S, 0:3] = np.asarray(scene.sph_c)[:S]
        sph[:S, 3] = np.asarray(scene.sph_r)[:S]
        sph[:S, 4:7] = np.asarray(scene.sph_rgb)[:S]
        sph[:S, 7:10] = np.asarray(scene.sph_emissive)[:S]
        sph[:S, 10] = np.asarray(scene.sph_has_em)[:S]
        sph[:S, 11] = np.asarray(scene.sph_kind)[:S]
        sph[:S, 12] = np.asarray(scene.sph_diffp)[:S]
        sph[:S, 13] = np.asarray(scene.sph_n_out)[:S]
        sph[:S, 14] = np.asarray(scene.sph_n_in)[:S]
    ft = np.zeros((max(F, 1), _FCOLS), np.float32)
    if F:
        ft[:F, 0:3] = np.asarray(scene.ft_v0)[:F]
        ft[:F, 3:6] = np.asarray(scene.ft_e1)[:F]
        ft[:F, 6:9] = np.asarray(scene.ft_e2)[:F]
        ft[:F, 9:12] = np.asarray(scene.ft_norm)[:F]
        ft[:F, 12:15] = np.asarray(scene.ft_rgb)[:F]
        ft[:F, 15:18] = np.asarray(scene.ft_emissive)[:F]
        ft[:F, 18] = np.asarray(scene.ft_has_em)[:F]
        ft[:F, 19] = np.asarray(scene.ft_kind)[:F]
        ft[:F, 20] = np.asarray(scene.ft_diffp)[:F]
        ft[:F, 21] = np.asarray(scene.ft_n_out)[:F]
        ft[:F, 22] = np.asarray(scene.ft_n_in)[:F]
    if S:
        sph[:S] = sph[_richness_order(_sph_dirty(sph, S), S)]
    if F:
        ft[:F] = ft[_richness_order(_ft_dirty(ft, F), F)]
    return sph, ft


def supports(scene, params) -> bool:
    """v1 coverage: gpu semantics, spheres + free tris only, each <= 64."""
    return (
        params.mode == "gpu"
        and not params.debug_single_ray
        and scene.n_mesh_tris == 0
        and scene.n_spheres <= 64
        and scene.n_free_tris <= 64
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_sph", "n_ft", "has_lens", "assured", "max_bounces",
        "samples_per_lane", "interpret", "hints", "hw_rng", "block_cols",
    ),
)
def trace_tiles(
    xs, ys, samp, sph_table, ft_table, cam_vec,
    n_sph: int, n_ft: int, has_lens: bool, assured: int,
    max_bounces: int, samples_per_lane: int = 1, interpret: bool = False,
    hints: SceneHints = _PERMISSIVE, hw_rng: bool = False, seed=None,
    block_cols: int = 1,
):
    """xs/ys/samp: (R, 128) i32 lane grids (R multiple of SUBLANES).
    Returns (L (R,128,3 packed as 3 arrays), miss_dir 3x, miss_w).
    samples_per_lane > 1 accumulates that many consecutive sample ids
    (samp..samp+spl-1) per lane via in-kernel regeneration — only
    valid for scenes without a cubemap (miss outputs are per-lane).
    hw_rng: draw uniforms from the TPU hardware PRNG (seeded from
    `seed`, a (1,1) i32, per grid program) instead of the
    counter-based PCG streams — faster, but not reproducible per
    (pixel, sample); see the kernel comment.
    block_cols: lane-tiles per kernel block (grid step) — the (8, 128)
    arrays reshape row-major to (R/block_cols, 128*block_cols), so
    values, streams and counter-RNG outputs are bitwise unchanged;
    only the grid-step granularity moves. Measured on walled
    (BENCH_NOTES round 4): per-block grid overhead was REAL — 445 /
    539 / 562 / 534 / 504 / 419 Mpaths/s at 1 / 2 / 4 / 8 / 16 / 32 —
    so the production default is 4 (renderer.py RTPU_BLOCK_COLS); the
    32 falloff is VMEM pressure (live state ~50 arrays x block
    bytes)."""
    rows = xs.shape[0]
    assert rows % SUBLANES == 0, rows
    if hw_rng and interpret:
        # interpret mode stubs pltpu.prng_random_bits to zeros — the
        # render would be deterministic and biased (corner-pinned
        # jitter, RR never killing). Fall back to the counter RNG.
        hw_rng = False
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    bc = block_cols if rows % (SUBLANES * block_cols) == 0 else 1
    wide = LANES * bc
    rows_w = rows // bc
    rsh = (lambda a: a.reshape(rows_w, wide)) if bc > 1 else (lambda a: a)
    grid = rows_w // SUBLANES
    lane_spec = pl.BlockSpec((SUBLANES, wide), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((rows_w, wide), jnp.float32)] * 9
    kernel = functools.partial(
        _kernel,
        n_sph=n_sph, n_ft=n_ft, has_lens=has_lens, assured=assured,
        max_bounces=max_bounces, samples_per_lane=samples_per_lane,
        hints=hints, hw_rng=hw_rng,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            lane_spec, lane_spec, lane_spec, smem((1, 1)),
            smem(sph_table.shape), smem(ft_table.shape), smem(cam_vec.shape),
        ],
        out_specs=[lane_spec] * 9,
        out_shape=out_shape,
        interpret=interpret,
    )(rsh(xs), rsh(ys), rsh(samp), seed, sph_table, ft_table, cam_vec)
    if bc > 1:
        outs = [o.reshape(rows, LANES) for o in outs]
    return outs


def make_cam_vec(cam, max_thres: float = 0.5) -> np.ndarray:
    """(1, 18) f32 camera + render scalars for SMEM."""
    v = np.zeros((1, 18), np.float32)
    v[0, 0:3] = np.asarray(cam.o)
    v[0, 3:6] = np.asarray(cam.d)
    v[0, 6:9] = np.asarray(cam.up)
    v[0, 9:12] = np.asarray(cam.right)
    v[0, 12] = float(cam.x_cf)
    v[0, 13] = float(cam.y_cf)
    v[0, 14] = float(cam.x_off)
    v[0, 15] = float(cam.y_off)
    v[0, 16] = float(cam.lens_r) if cam.lens_r is not None else 0.0
    v[0, 17] = float(max_thres)
    return v
