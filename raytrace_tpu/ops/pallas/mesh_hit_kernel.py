"""Pallas mesh closest-hit kernel: cluster-culled Möller–Trumbore with
the whole mesh resident in VMEM.

The XLA cluster-culled path pays ~0.1 ms per lax.cond iteration; here
the cluster loop is a real in-kernel loop whose skip (@pl.when on the
tile's slab test) costs nanoseconds. Mesh data sits in VMEM for the
kernel's lifetime — every reference scene fits (a380-scale 127k tris
= 4.6 MB of 16 MB); cluster AABBs live in SMEM for scalar access.

This kernel only resolves the nearest hit (t, global tri id, u, v
barycentrics) seeded with the sphere/free-tri best; shading (textures,
BSDF) stays in the XLA integrator — the hybrid keeps texture gathers
out of the kernel while the O(rays x tris) work runs at VPU speed.

Correctness contract: identical results to integrator._triangle_t over
the same clusters (cross-checked in tests/test_pallas_mesh.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4
INF = 3.4e38

LANES = 128
SUBLANES = 8  # (8, 128) ray blocks


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, seed_ref,
            bounds_ref, tri_ref, idx_ref,
            t_out, i_out, u_out, v_out,
            *, n_clusters: int, width: int):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]

    # slab direction clamp (aabb.rs:33-35)
    def clamp(d):
        return jnp.where(jnp.abs(d) < EPS, jnp.where(d < 0.0, -EPS, EPS), d)

    fx = 1.0 / clamp(dx)
    fy = 1.0 / clamp(dy)
    fz = 1.0 / clamp(dz)

    t_out[...] = seed_ref[...]
    i_out[...] = jnp.full_like(i_out[...], -1)
    u_out[...] = jnp.zeros_like(u_out[...])
    v_out[...] = jnp.zeros_like(v_out[...])

    def cluster_body(c, _):
        b = lambda j: bounds_ref[c, j]
        t0x = (b(0) - ox) * fx
        t1x = (b(3) - ox) * fx
        t0y = (b(1) - oy) * fy
        t1y = (b(4) - oy) * fy
        t0z = (b(2) - oz) * fz
        t1z = (b(5) - oz) * fz
        entry = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        reach = (entry <= exit_) & (exit_ >= 0.0) & (entry < t_out[...])

        @pl.when(jnp.any(reach))
        def _():
            def tri_body(w, _):
                base = c * width + w
                # tables are (9, C*W)/(1, C*W): big axis minor so VMEM
                # tiling doesn't pad a 9-wide minor dim to 128 lanes
                tr = lambda j: tri_ref[j, base]
                e1x, e1y, e1z = tr(3), tr(4), tr(5)
                e2x, e2y, e2z = tr(6), tr(7), tr(8)
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) >= EPS
                inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
                hx, hy, hz = ox - tr(0), oy - tr(1), oz - tr(2)
                u = inv_det * (hx * pvx + hy * pvy + hz * pvz)
                qx = hy * e1z - hz * e1y
                qy = hz * e1x - hx * e1z
                qz = hx * e1y - hy * e1x
                w_ = inv_det * (dx * qx + dy * qy + dz * qz)
                t_i = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                gid = idx_ref[0, base]
                ok2 = ok & (u >= 0.0) & (u <= 1.0) & (w_ >= 0.0) & (u + w_ <= 1.0)
                ok2 = ok2 & (t_i >= EPS) & (gid >= 0)
                better = ok2 & (jnp.where(ok2, t_i, INF) < t_out[...])
                t_out[...] = jnp.where(better, t_i, t_out[...])
                i_out[...] = jnp.where(better, gid, i_out[...])
                u_out[...] = jnp.where(better, u, u_out[...])
                v_out[...] = jnp.where(better, w_, v_out[...])
                return 0

            jax.lax.fori_loop(0, width, tri_body, 0)

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)


def pack_mesh_tables(scene):
    """SceneArrays clusters -> (bounds (C, 8), tri (9, C*W), idx (1, C*W)).
    Big axis MINOR: VMEM tiles the minor dim to 128 lanes, so a 9-wide
    minor dim would pad 14x (OOM at a380 scale)."""
    C = int(scene.n_clusters)
    W = int(scene.cl_idx.shape[1])
    bounds = np.zeros((max(C, 1), 8), np.float32)
    if C:
        bounds[:, 0:3] = np.asarray(scene.cl_lo)
        bounds[:, 3:6] = np.asarray(scene.cl_hi)
    tri = np.zeros((9, max(C * W, 1)), np.float32)
    idx = np.full((1, max(C * W, 1)), -1, np.int32)
    if C:
        tri[0:3] = np.asarray(scene.cl_v0).reshape(C * W, 3).T
        tri[3:6] = np.asarray(scene.cl_e1).reshape(C * W, 3).T
        tri[6:9] = np.asarray(scene.cl_e2).reshape(C * W, 3).T
        idx[0] = np.asarray(scene.cl_idx).reshape(C * W)
    return bounds, tri, idx


@functools.partial(jax.jit, static_argnames=("n_clusters", "width", "interpret"))
def mesh_hit_tiles(ox, oy, oz, dx, dy, dz, seed, bounds, tri, idx,
                   n_clusters: int, width: int, interpret: bool = False):
    """All args (R, 128) lane grids except the tables. Returns
    (t, gid, u, v) each (R, 128); gid == -1 where nothing beat seed."""
    rows = ox.shape[0]
    assert rows % SUBLANES == 0
    grid = rows // SUBLANES
    lane = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    kernel = functools.partial(_kernel, n_clusters=n_clusters, width=width)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[lane] * 7 + [smem(bounds), full(tri), full(idx)],
        out_specs=[lane, lane, lane, lane],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, seed, bounds, tri, idx)
