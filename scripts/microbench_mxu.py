"""MXU Woop-transform intersection microbench (VERDICT round-3 ask 1).

Question: can the mesh nearest-hit for SMALL meshes (spaceship_r1 =
2,097 tris) run as a brute-force MXU pass instead of the cluster-culled
VPU walk? The production kernel pays ~64 ms/iter on spaceship — ~10x
the VPU flop roofline for its ~4k padded tri tests — because the
per-triangle work is serialized scalar loads + a loop-carried
read-modify-write of the best-hit refs. The MXU formulation:

  Woop-transform every triangle at build into an affine map W, b with
  (u, v, w) local coords = W p + b where p = v0 + u e1 + v e2 + w n,
  n = e1 x e2 (w row left UNNORMALIZED = n, so |d'w| == |MT det| and
  the EPS det guard carries over exactly). Then per (ray, tri):
      o' = W o + b,  d' = W d            <- ONE matmul for all tris
      t = -o'w / d'w, u = o'u + t d'u, v = o'v + t d'v   <- VPU epilogue
  with the same accept tests as Moller-Trumbore. The matmul is
  A (6T, 8) @ X (8, N): X rows = [ox oy oz 1 dx dy dz 0] per ray
  column; A rows grouped per chunk as [U_o|V_o|W_o|U_d|V_d|W_d].

Variants measured (all f32, HIGHEST-precision dot = bf16 multi-pass):
  cluster : production mesh_hit_tiles (3-level cull + per-cluster DMA)
  mxuK8   : A (6Tp, 8) VMEM-resident, per-sublane-row (8, 1024) dot
  mxuK8lo : same with default (single-pass bf16) precision — accuracy
            reference only
Ray sets: primary (coherent camera rays — the cull's best case) and
bounce (random points/dirs off the mesh — diverged secondary rays,
where block-granular culling retires nothing).

Validation: interpret mode vs numpy Moller-Trumbore before any TPU
timing (hit-mask and t agreement), plus TPU-vs-numpy mismatch counts.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pins 'axon,cpu'
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4
INF = 3.4e38
N = 1024  # matmul ray-column width (lanes of the block)
SUB = 8


def pack_woop_np(v0, e1, e2, chunk: int):
    """(M, 3) triangle arrays -> (n_chunks*6*chunk, 8) f32 Woop table.

    Rows of chunk ci: [U_o | V_o | W_o | U_d | V_d | W_d] x chunk tris,
    coefficient columns [Wx Wy Wz b 0 0 0 0] for o-rows and
    [0 0 0 0 Wx Wy Wz 0] for d-rows, against ray columns
    X = [ox oy oz 1 dx dy dz 0]^T. w rows use the UNNORMALIZED n so
    |d'w| equals the Moller-Trumbore det and the reference's EPS
    det guard (trace.wgsl:628) transfers unchanged. Degenerate /
    padding triangles get all-zero rows -> d'w = 0 -> rejected."""
    M = v0.shape[0]
    Tp = -(-max(M, 1) // chunk) * chunk
    n = np.cross(e1, e2)
    # mat columns [e1 e2 n]; rows of inv give (u, v, w) coords
    mat = np.stack([e1, e2, n], axis=-1).astype(np.float64)
    det3 = np.linalg.det(mat)
    ok = np.abs(det3) > 1e-30
    mat_safe = np.where(ok[:, None, None], mat, np.eye(3)[None])
    inv = np.linalg.inv(mat_safe)
    # unnormalize the w row back to n: inv row 2 = n / |n|^2
    inv[:, 2, :] = n
    inv = np.where(ok[:, None, None], inv, 0.0)
    b = -np.einsum("mij,mj->mi", inv, v0.astype(np.float64))  # (M, 3)

    A = np.zeros((Tp, 6, 8), np.float64)
    A[:M, 0:3, 0:3] = inv  # o' rows: W
    A[:M, 0:3, 3] = b  # o' rows: bias (x 1-row of X)
    A[:M, 3:6, 4:7] = inv  # d' rows: W
    n_chunks = Tp // chunk
    # regroup: chunk-major, component-major within chunk
    A = A.reshape(n_chunks, chunk, 6, 8).transpose(0, 2, 1, 3)
    return A.reshape(n_chunks * 6 * chunk, 8).astype(np.float32), Tp


def _mxu_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, seed_ref,
                woop_ref, t_o, g_o, u_o, v_o, *, chunk: int, n_chunks: int,
                precision):
    one = jnp.ones((1, N), jnp.float32)
    zero = jnp.zeros((1, N), jnp.float32)
    # tpu.iota is int-only; cast after
    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, N), 0).astype(jnp.float32)
    for r in range(SUB):  # static unroll over sublane rows
        X = jnp.concatenate(
            [ox_ref[r:r + 1, :], oy_ref[r:r + 1, :], oz_ref[r:r + 1, :], one,
             dx_ref[r:r + 1, :], dy_ref[r:r + 1, :], dz_ref[r:r + 1, :], zero],
            axis=0,
        )  # (8, N)

        if precision == "3x":
            X_hi = X.astype(jnp.bfloat16)
            X_lo = (X - X_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def body(ci, carry, X=X):
            tb, gb, ub, vb = carry
            A = woop_ref[pl.ds(ci * 6 * chunk, 6 * chunk), :]
            if precision == "3x":
                # manual bf16_3x: f32 ~ hi + lo (8+8 mantissa bits);
                # R ~ Ah@Xh + Ah@Xl + Al@Xh (drop lo*lo) — 3 native
                # bf16 passes with f32 accumulation vs HIGHEST's 6
                dot = lambda a, b: jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                A_hi = A.astype(jnp.bfloat16)
                A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                R = dot(A_hi, X_hi) + dot(A_hi, X_lo) + dot(A_lo, X_hi)
            else:
                R = jax.lax.dot_general(
                    A, X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )  # (6*chunk, N)
            oU, oV, oW = R[0:chunk], R[chunk:2 * chunk], R[2 * chunk:3 * chunk]
            dU, dV, dW = (R[3 * chunk:4 * chunk], R[4 * chunk:5 * chunk],
                          R[5 * chunk:6 * chunk])
            ok = jnp.abs(dW) >= EPS  # == the MT det guard
            invw = 1.0 / jnp.where(ok, dW, 1.0)
            t = -oW * invw
            u = oU + t * dU
            v = oV + t * dV
            valid = (ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t >= EPS))
            tm = jnp.where(valid, t, INF)
            tmin = jnp.min(tm, axis=0, keepdims=True)  # (1, N)
            idx = jnp.where(tm == tmin, iota, float(chunk))
            idxmin = jnp.min(idx, axis=0, keepdims=True)
            sel = iota == idxmin
            usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = (tmin < tb) & (idxmin < float(chunk))
            gb = jnp.where(better, idxmin + (ci * chunk).astype(jnp.float32), gb)
            tb = jnp.where(better, tmin, tb)
            ub = jnp.where(better, usel, ub)
            vb = jnp.where(better, vsel, vb)
            return tb, gb, ub, vb

        init = (seed_ref[r:r + 1, :], jnp.full((1, N), -1.0),
                jnp.zeros((1, N)), jnp.zeros((1, N)))
        tb, gb, ub, vb = jax.lax.fori_loop(0, n_chunks, body, init)
        t_o[r:r + 1, :] = tb
        g_o[r:r + 1, :] = gb
        u_o[r:r + 1, :] = ub
        v_o[r:r + 1, :] = vb


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "n_chunks", "prec", "interpret"),
)
def mxu_hit(ox, oy, oz, dx, dy, dz, seed, woop, chunk: int, n_chunks: int,
            prec: str = "highest", interpret: bool = False):
    """Rays as (R8, 1024) grids; woop (n_chunks*6*chunk, 8). Returns
    (t, gid_f32, u, v) each (R8, 1024); gid == -1 where nothing beat
    the seed."""
    rows = ox.shape[0]
    assert rows % SUB == 0
    grid = rows // SUB
    lane = pl.BlockSpec((SUB, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _mxu_kernel, chunk=chunk, n_chunks=n_chunks,
        precision={"highest": jax.lax.Precision.HIGHEST,
                   "high": jax.lax.Precision.HIGH,
                   "3x": "3x",
                   "default": jax.lax.Precision.DEFAULT}[prec],
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[lane] * 7 + [
            pl.BlockSpec(woop.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[lane] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, N), jnp.float32)] * 4,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, seed, woop)


def pack_woop_gid_np(v0, e1, e2, gid, chunk: int):
    """pack_woop_np with a 7th row per triangle carrying its global id
    as a matmul constant (coefficient on X's 1-column): the culled
    variant reorders triangles spatially, so the selected row index is
    no longer the id. Returns (A (n_chunks*7*chunk, 8), bounds
    (n_chunks, 8), Tp) — bounds = per-chunk AABBs (slab-cull layout
    like mesh_hit_kernel: lo xyz, hi xyz, 2 pad)."""
    A6, Tp = pack_woop_np(v0, e1, e2, chunk)
    n_chunks = Tp // chunk
    A6 = A6.reshape(n_chunks, 6, chunk, 8)
    A = np.zeros((n_chunks, 7, chunk, 8), np.float32)
    A[:, :6] = A6
    g = np.full((Tp,), -1.0, np.float32)
    g[: gid.shape[0]] = gid.astype(np.float32)
    A[:, 6, :, 3] = g.reshape(n_chunks, chunk)
    M = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    _NOHIT_LO, _NOHIT_HI = 3.0e38, -3.0e38
    blo = np.full((Tp, 3), _NOHIT_LO, np.float64)
    bhi = np.full((Tp, 3), _NOHIT_HI, np.float64)
    blo[:M], bhi[:M] = lo, hi
    bounds = np.zeros((n_chunks, 8), np.float32)
    bounds[:, 0:3] = blo.reshape(n_chunks, chunk, 3).min(axis=1)
    bounds[:, 3:6] = bhi.reshape(n_chunks, chunk, 3).max(axis=1)
    return A.reshape(n_chunks * 7 * chunk, 8), bounds, Tp


def _mxu_cull_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     seed_ref, woop_ref, bounds_ref,
                     t_o, g_o, u_o, v_o, tb_s, gb_s, ub_s, vb_s,
                     *, chunk: int, n_chunks: int, precision):
    """Chunk-outer MXU intersection with a block-level geometric slab
    cull per chunk (triangles pre-sorted spatially): unreached chunks
    cost one 8x128 slab test; reached ones pay the 7-row matmul. The
    running best lives in (8, N) scratch so it survives the chunk loop
    at chunk granularity (not per-triangle — the RMW serialization that
    made the cluster kernel 10x off its flop roofline)."""
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]

    def clamp(d):
        return jnp.where(jnp.abs(d) < EPS, jnp.where(d < 0.0, -EPS, EPS), d)

    fx, fy, fz = 1.0 / clamp(dx), 1.0 / clamp(dy), 1.0 / clamp(dz)

    one = jnp.ones((1, N), jnp.float32)
    zero = jnp.zeros((1, N), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, N), 0).astype(jnp.float32)

    tb_s[...] = seed_ref[...]
    gb_s[...] = jnp.full_like(gb_s[...], -1.0)
    ub_s[...] = jnp.zeros_like(ub_s[...])
    vb_s[...] = jnp.zeros_like(vb_s[...])

    def chunk_body(ci, _):
        b = lambda j: bounds_ref[ci, j]
        t0x, t1x = (b(0) - ox) * fx, (b(3) - ox) * fx
        t0y, t1y = (b(1) - oy) * fy, (b(4) - oy) * fy
        t0z, t1z = (b(2) - oz) * fz, (b(5) - oz) * fz
        entry = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z))
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z))
        reach = (entry <= exit_) & (exit_ >= 0.0)

        @pl.when(jnp.any(reach))
        def _():
            A = woop_ref[pl.ds(ci * 7 * chunk, 7 * chunk), :]
            for r in range(SUB):
                X = jnp.concatenate(
                    [ox_ref[r:r + 1, :], oy_ref[r:r + 1, :],
                     oz_ref[r:r + 1, :], one,
                     dx_ref[r:r + 1, :], dy_ref[r:r + 1, :],
                     dz_ref[r:r + 1, :], zero], axis=0)
                R = jax.lax.dot_general(
                    A, X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                oU, oV, oW = R[0:chunk], R[chunk:2 * chunk], R[2 * chunk:3 * chunk]
                dU, dV, dW = (R[3 * chunk:4 * chunk], R[4 * chunk:5 * chunk],
                              R[5 * chunk:6 * chunk])
                G = R[6 * chunk:7 * chunk]
                ok = jnp.abs(dW) >= EPS
                invw = 1.0 / jnp.where(ok, dW, 1.0)
                t = -oW * invw
                u = oU + t * dU
                v = oV + t * dV
                valid = (ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                         & (u + v <= 1.0) & (t >= EPS) & (G >= 0.0))
                tm = jnp.where(valid, t, INF)
                tmin = jnp.min(tm, axis=0, keepdims=True)
                idx = jnp.where(tm == tmin, iota, float(chunk))
                idxmin = jnp.min(idx, axis=0, keepdims=True)
                sel = iota == idxmin
                usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
                gsel = jnp.sum(jnp.where(sel, G, 0.0), axis=0, keepdims=True)
                better = (tmin < tb_s[r:r + 1, :]) & (idxmin < float(chunk))
                tb_s[r:r + 1, :] = jnp.where(better, tmin, tb_s[r:r + 1, :])
                gb_s[r:r + 1, :] = jnp.where(better, gsel, gb_s[r:r + 1, :])
                ub_s[r:r + 1, :] = jnp.where(better, usel, ub_s[r:r + 1, :])
                vb_s[r:r + 1, :] = jnp.where(better, vsel, vb_s[r:r + 1, :])
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    t_o[...] = tb_s[...]
    g_o[...] = gb_s[...]
    u_o[...] = ub_s[...]
    v_o[...] = vb_s[...]


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "n_chunks", "highest", "interpret"),
)
def mxu_hit_cull(ox, oy, oz, dx, dy, dz, seed, woop, bounds, chunk: int,
                 n_chunks: int, highest: bool = True,
                 interpret: bool = False):
    rows = ox.shape[0]
    assert rows % SUB == 0
    grid = rows // SUB
    lane = pl.BlockSpec((SUB, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _mxu_cull_kernel, chunk=chunk, n_chunks=n_chunks,
        precision=(jax.lax.Precision.HIGHEST if highest
                   else jax.lax.Precision.DEFAULT))
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[lane] * 7 + [
            pl.BlockSpec(woop.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[lane] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, N), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((SUB, N), jnp.float32)] * 4,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, seed, woop, bounds)


def mt_numpy(v0, e1, e2, o, d):
    """Brute-force Moller-Trumbore reference, chunked over rays."""
    best_t = np.full(o.shape[0], np.inf, np.float64)
    best_i = np.full(o.shape[0], -1, np.int64)
    B = 4096
    for s in range(0, o.shape[0], B):
        oo, dd = o[s:s + B, None, :], d[s:s + B, None, :]
        pv = np.cross(dd, e2[None])
        det = np.einsum("mk,rmk->rm", e1, pv)
        ok = np.abs(det) >= EPS
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        h = oo - v0[None]
        u = inv * np.einsum("rmk,rmk->rm", h, pv)
        q = np.cross(h, e1[None])
        v = inv * np.einsum("rmk,rmk->rm", np.broadcast_to(dd, q.shape), q)
        t = inv * np.einsum("mk,rmk->rm", e2, q)
        ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= EPS)
        t = np.where(ok, t, np.inf)
        i = np.argmin(t, axis=1)
        tm = t[np.arange(t.shape[0]), i]
        best_t[s:s + B] = tm
        best_i[s:s + B] = np.where(np.isfinite(tm), i, -1)
    return best_t, best_i


def timeit(fn, *args, n=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def reps_runner(step, reps):
    """Chain `reps` kernel calls through the seed (stays INF: full work
    every rep, like a fresh bounce) and fence on a reduction."""
    def run(seed0, *args):
        def body(c, _):
            t = step(c, *args)
            return INF * jnp.ones_like(c) + 0.0 * t, t[:1, :1]

        _, outs = jax.lax.scan(body, seed0, None, length=reps)
        return jnp.sum(outs)

    return jax.jit(run)


def main():
    on_cpu = jax.default_backend() == "cpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- real spaceship geometry ---
    from raytrace_tpu.models.config import load_scheme
    from raytrace_tpu.models.scene import build_scene
    from raytrace_tpu.models.camera import build_camera

    scheme = load_scheme("/root/reference/schemes/spaceship_r1.yml")
    W, H = scheme.render_info.width, scheme.render_info.height
    sc = build_scene(scheme)
    M = sc.n_mesh_tris
    v0 = np.asarray(sc.mt_v0[:M], np.float64)
    e1 = np.asarray(sc.mt_e1[:M], np.float64)
    e2 = np.asarray(sc.mt_e2[:M], np.float64)
    chunk = int(os.environ.get("MXU_CHUNK", "64"))
    # MXU_CENTER=1: pack in a mesh-local frame (v0 - c) and shift ray
    # origins by -c — t/u/v/gid are translation-invariant, but the
    # o'-row cancellation that wrecks low-precision products shrinks
    # from |o| ~ 30 units to the mesh half-extent
    center = np.zeros(3)
    if os.environ.get("MXU_CENTER", "0") == "1":
        verts = np.concatenate([v0, v0 + e1, v0 + e2], 0)
        center = (verts.min(0) + verts.max(0)) / 2.0
        print(f"local frame: center {np.round(center, 3)}", flush=True)
    woop, Tp = pack_woop_np(v0 - center, e1, e2, chunk)
    n_chunks = Tp // chunk
    print(f"spaceship: {M} tris, Tp={Tp}, chunk={chunk} x {n_chunks}, "
          f"woop table {woop.nbytes/1e6:.1f} MB logical "
          f"({Tp*6*128*4/1e6:.1f} MB padded in VMEM)", flush=True)

    pool = 1 << 14 if on_cpu else 1 << 17
    rows8 = pool // N

    # primary rays: scheme camera over a tile-ordered pixel subset
    cam = build_camera(scheme.cam, W, H)
    rng = np.random.default_rng(0)
    pix = rng.integers(0, W * H, pool)
    xs, ys = (pix % W).astype(np.float64), (pix // W).astype(np.float64)
    sx = cam.x_cf * (xs - cam.x_off)
    sy = cam.y_cf * (ys - cam.y_off)
    d = cam.d[None] + cam.right[None] * sx[:, None] + cam.up[None] * sy[:, None]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam.o, d.shape).copy()

    # bounce rays: random origins on mesh tris, random unit dirs
    ti = rng.integers(0, M, pool)
    uu, vv = rng.uniform(0, 1, (2, pool))
    flip = uu + vv > 1
    uu, vv = np.where(flip, 1 - uu, uu), np.where(flip, 1 - vv, vv)
    ob = v0[ti] + uu[:, None] * e1[ti] + vv[:, None] * e2[ti]
    db = rng.normal(size=(pool, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    ob += db * 1e-3

    ray_sets = {"primary": (o - center, d), "bounce": (ob - center, db)}
    # numpy reference stays in the ORIGINAL frame (translation-invariant)
    ray_sets_ref = {"primary": (o, d), "bounce": (ob, db)}
    woop_j = jnp.asarray(woop)
    seed = jnp.full((rows8, N), INF, jnp.float32)

    # --- interpret-mode / numpy validation on a small slice ---
    vn = 8192
    for name, (ro, rd) in ray_sets.items():
        ro_ref = ray_sets_ref[name][0]
        ref_t, ref_i = mt_numpy(v0, e1, e2, ro_ref[:vn], rd[:vn])
        g = lambda a: jnp.asarray(
            a[:vn].astype(np.float32).reshape(vn // N, N))
        t, gf, u, v = mxu_hit(
            g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2]),
            g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2]),
            jnp.full((vn // N, N), INF, jnp.float32), woop_j,
            chunk=chunk, n_chunks=n_chunks, interpret=on_cpu,
            prec=__import__("os").environ.get("MXU_VAL_PREC", "highest"),
        )
        t = np.asarray(t).reshape(-1)
        gi = np.asarray(gf).reshape(-1).astype(np.int64)
        hit_ref = ref_i >= 0
        hit_us = gi >= 0
        mism = (hit_ref != hit_us).sum()
        both = hit_ref & hit_us
        gid_mism = (ref_i[both] != gi[both]).sum()
        terr = np.abs(t[both] - ref_t[both]) / np.maximum(ref_t[both], 1e-6)
        print(f"[{name}] hits ref {hit_ref.sum()} us {hit_us.sum()} "
              f"mask-mism {mism} gid-mism {gid_mism} "
              f"rel-t err max {terr.max() if both.any() else 0:.2e}",
              flush=True)

    # --- culled variant: triangles in BVH-cluster order (spatially
    # local chunks -> tight chunk AABBs), gid riding the 7th matmul row
    perm = np.asarray(sc.cl_idx).reshape(-1)
    perm = perm[perm >= 0]
    assert perm.shape[0] == M, (perm.shape, M)
    cch = int(os.environ.get("MXU_CULL_CHUNK", "128"))
    woopc, cbounds, Tpc = pack_woop_gid_np(
        v0[perm], e1[perm], e2[perm], perm, cch)
    n_chunksc = Tpc // cch
    woopc_j, cbounds_j = jnp.asarray(woopc), jnp.asarray(cbounds)
    for name, (ro, rd) in ray_sets.items():
        ro_ref = ray_sets_ref[name][0]
        ref_t, ref_i = mt_numpy(v0, e1, e2, ro_ref[:vn], rd[:vn])
        g = lambda a: jnp.asarray(a[:vn].astype(np.float32).reshape(vn // N, N))
        t, gf, u, v = mxu_hit_cull(
            g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2]),
            g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2]),
            jnp.full((vn // N, N), INF, jnp.float32), woopc_j, cbounds_j,
            chunk=cch, n_chunks=n_chunksc, interpret=on_cpu)
        gi = np.asarray(gf).reshape(-1).astype(np.int64)
        hit_ref, hit_us = ref_i >= 0, gi >= 0
        mism = (hit_ref != hit_us).sum()
        both = hit_ref & hit_us
        gid_mism = (ref_i[both] != gi[both]).sum()
        print(f"[{name}] CULL hits ref {hit_ref.sum()} us {hit_us.sum()} "
              f"mask-mism {mism} gid-mism {gid_mism}", flush=True)

    if on_cpu:
        print("cpu validation only; run on TPU for timing", flush=True)
        return

    reps = 8
    # --- culled MXU timing ---
    for name, (ro, rd) in ray_sets.items():
        g = lambda a: jnp.asarray(a.astype(np.float32).reshape(rows8, N))
        args = (g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2]),
                g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2]))
        step = lambda c, *a: mxu_hit_cull(
            *a, c, woopc_j, cbounds_j, chunk=cch, n_chunks=n_chunksc)[0]
        f = reps_runner(step, reps)
        t0 = time.time()
        np.asarray(f(seed, *args))
        print(f"  (compile {time.time()-t0:.0f}s)", flush=True)
        dt = timeit(f, seed, *args) / reps
        print(f"[{name}] mxuCULL chunk={cch}: {dt*1e3:7.2f} ms "
              f"/128k-lane pass ({pool/dt/1e6:6.1f} Mray/s)", flush=True)
    # --- MXU timing ---
    for name, (ro, rd) in ray_sets.items():
        g = lambda a: jnp.asarray(a.astype(np.float32).reshape(rows8, N))
        args = (g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2]),
                g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2]))
        for prec in filter(None, os.environ.get(
                "MXU_PREC_LIST", "highest,3x,default").split(",")):
            step = lambda c, *a: mxu_hit(
                *a, c, woop_j, chunk=chunk, n_chunks=n_chunks,
                prec=prec)[0]
            f = reps_runner(step, reps)
            t0 = time.time()
            np.asarray(f(seed, *args))
            print(f"  (compile {time.time()-t0:.0f}s)", flush=True)
            dt = timeit(f, seed, *args) / reps
            print(f"[{name}] mxuK8 prec={prec}: {dt*1e3:7.2f} ms "
                  f"/128k-lane pass ({pool/dt/1e6:6.1f} Mray/s)", flush=True)

    # --- cluster-kernel baseline ---
    from raytrace_tpu.ops.pallas.mesh_hit_kernel import mesh_hit_tiles

    for name, (ro, rd) in ray_sets.items():
        g = lambda a: jnp.asarray(a.astype(np.float32).reshape(pool // 128, 128))
        args = (g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2]),
                g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2]))
        seed2 = jnp.full((pool // 128, 128), INF, jnp.float32)

        def step(c, *a):
            t, gi, u, v = mesh_hit_tiles(
                *a, c, jnp.asarray(sc.mk_bounds), jnp.asarray(sc.mk_sbounds),
                jnp.asarray(sc.mk_sgbounds), jnp.asarray(sc.mk_tri),
                n_clusters=sc.mk_bounds.shape[0], width=sc.cl_idx.shape[1])
            return t

        f = reps_runner(step, reps)
        t0 = time.time()
        np.asarray(f(seed2, *args))
        print(f"  (compile {time.time()-t0:.0f}s)", flush=True)
        dt = timeit(f, seed2, *args) / reps
        print(f"[{name}] cluster kernel: {dt*1e3:7.2f} ms /128k-lane pass "
              f"({pool/dt/1e6:6.1f} Mray/s)", flush=True)


if __name__ == "__main__":
    main()
