"""Pallas mesh closest-hit kernel: cluster-culled Möller–Trumbore with
HBM-resident mesh data streamed per-cluster into VMEM.

The XLA cluster-culled path pays ~0.1 ms per lax.cond iteration; here
the cluster loop is a real in-kernel loop whose skip (@pl.when on the
tile's slab test) costs nanoseconds.

Memory layout (the part that makes this compile AND scale):
  * cluster AABBs: (C, 8) f32 in SMEM — scalar reads at a dynamic
    cluster index are an SMEM feature;
  * triangle table: (S, GROUP*W/8, 128) f32 in compiler-chosen memory
    ("ANY" — VMEM when it fits, HBM at large scale), supercluster-
    major so ONE DMA copies a whole reached group of GROUP clusters
    (per-cluster 4 KB copies issued start->wait were latency-bound at
    a380 scale; the group copy amortizes the ~µs DMA latency 16x and
    overlaps with the group's cluster slab tests, which only read the
    resident bounds table). Each 128-lane row packs EIGHT triangles
    of 16 columns [v0(3) | e1(3) | e2(3) | gid-as-f32 | pad]:
    triangle w of cluster c lives at
    [c//GROUP, (c%GROUP)*(W/8) + w//8, (w%8)*16 + j]. That exact-128
    minor dim is what makes this legal on the hardware: the DMA slice
    .at[s] is tile-aligned, and the triangle loop reads
    scratch[base + w8, K*16+j] with a dynamic SUBLANE index and a
    STATIC lane index (the 8 in-row triangles are a static unroll).
    Every alternative fails: a (16, C*W) layout needs dynamic lane
    offsets (Mosaic requires them provably 128-aligned), a (C*W, 16)
    VMEM table pads 16 -> 128 lanes and OOMs at a380 scale, and a
    (C, W, 16) DMA slice violates tiling alignment. Streaming reached
    groups from wherever the table lives removes the
    mesh-must-fit-VMEM limit entirely; the slab cull means only
    reached groups pay the DMA.

The global triangle id rides in the f32 table (exact for meshes up to
2^24 triangles); -1 marks padding rows.

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
TRI_COLS = 16  # v0 xyz | e1 xyz | e2 xyz | gid | 6 pad


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, seed_ref,
            bounds_ref, sbounds_ref, sgbounds_ref, tri_hbm,
            t_out, i_out, u_out, v_out,
            tri_vmem, dma_sem,
            *, n_super: int, group: int, n_sg: int, sgroup: int, width: int):
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

    def slab_reach(ref, c):
        b = lambda j: ref[c, j]
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
        return (entry <= exit_) & (exit_ >= 0.0) & (entry < t_out[...])

    rows_per_cluster = width // 8

    def super_body(s, _):
        # two-level cull: one slab test retires `group` clusters at a
        # time — at a380-scale cluster counts the flat loop's overhead
        # (C sequential slab tests per ray block per bounce) dominates
        @pl.when(jnp.any(slab_reach(sbounds_ref, s)))
        def _():
            # Per-cluster DMA of REACHED clusters only (round 3, same
            # rationale as mesh_bounce_kernel): the whole-group copy
            # made a380-scale launches DMA-byte-bound when miss lanes
            # prune nothing. All reached clusters' copies start
            # back-to-back on per-cluster semaphores before the first
            # wait, overlapping their ~µs latency.
            reaches = [
                jnp.any(slab_reach(bounds_ref, s * group + cl))
                for cl in range(group)
            ]
            rpc = width // 8

            def cl_copy(cl):
                return pltpu.make_async_copy(
                    tri_hbm.at[s, pl.ds(cl * rpc, rpc)],
                    tri_vmem.at[pl.ds(cl * rpc, rpc)],
                    dma_sem.at[cl],
                )

            for cl in range(group):  # static unroll
                @pl.when(reaches[cl])
                def _(cl=cl):
                    cl_copy(cl).start()

            for cl in range(group):  # static unroll
                def row_body(w8, _, base=cl * rows_per_cluster):
                    for k in range(8):  # static unroll: lane index stays static
                        tr = lambda j: tri_vmem[base + w8, k * TRI_COLS + j]
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
                        gid_f = tr(9)
                        ok2 = ok & (u >= 0.0) & (u <= 1.0) & (w_ >= 0.0) & (u + w_ <= 1.0)
                        ok2 = ok2 & (t_i >= EPS) & (gid_f >= 0.0)
                        better = ok2 & (jnp.where(ok2, t_i, INF) < t_out[...])
                        t_out[...] = jnp.where(better, t_i, t_out[...])
                        i_out[...] = jnp.where(
                            better,
                            jnp.full_like(i_out[...], gid_f.astype(jnp.int32)),
                            i_out[...],
                        )
                        u_out[...] = jnp.where(better, u, u_out[...])
                        v_out[...] = jnp.where(better, w_, v_out[...])
                    return 0

                @pl.when(reaches[cl])
                def _(row_body=row_body, cl=cl):
                    cl_copy(cl).wait()
                    jax.lax.fori_loop(0, rows_per_cluster, row_body, 0)

        return 0

    # level-3 cull (see mesh_bounce_kernel): one supergroup slab test
    # retires sgroup supers' always-paid per-block tests
    if n_sg > 1:
        def sg_body(g, _):
            @pl.when(jnp.any(slab_reach(sgbounds_ref, g)))
            def _():
                jax.lax.fori_loop(g * sgroup, (g + 1) * sgroup, super_body, 0)
            return 0

        jax.lax.fori_loop(0, n_sg, sg_body, 0)
    else:
        jax.lax.fori_loop(0, n_super, super_body, 0)


GROUP = 16  # clusters per supercluster
SGROUP = 8  # superclusters per supergroup (level-3 cull, round 3)
_NOHIT_LO, _NOHIT_HI = 3.0e38, -3.0e38  # inverted AABB: slab never hits


def pack_mesh_tables_np(cl_idx, cl_lo, cl_hi, cl_v0, cl_e1, cl_e2, cam_o=None):
    """Cluster arrays -> (bounds (Cp, 8), sbounds (S, 8),
    sgbounds (S/SGROUP, 8), tri (S, GROUP*W/8, 128)) numpy f32,
    Cp = C padded to a GROUP*SGROUP multiple, S = Cp/GROUP. Runs ONCE
    at scene build. Triangle w of cluster c at
    [c//GROUP, (c%GROUP)*(W/8) + w//8, (w%8)*16 + j]; gid packed as
    f32 in column 9 (exact below 2^24 triangles); padding rows carry
    gid -1. Empty/padding clusters get inverted AABBs so the slab test
    retires them; superclusters are unions of GROUP consecutive
    clusters, supergroups unions of SGROUP consecutive superclusters
    (build order is spatially local, so every level's AABB stays
    compact — the level-3 cull retires SGROUP*GROUP clusters on one
    slab test at a380-scale cluster counts).

    cam_o (3,) enables FRONT-TO-BACK ordering, hierarchically so
    membership at every level keeps its BVH-contiguous (compact) span:
    clusters sort within their supercluster, superclusters within
    their supergroup, supergroups globally — all by distance from
    cam_o to their AABB. The kernels skip a node whose slab entry
    exceeds the lane's current best t (`entry < tt` in slab_reach), so
    a near-first visit order turns that test into real early
    termination on primary rays — the role near/far ordering plays in
    the reference's KD traversal (accel/kdtree.rs:66-104). Perf-only:
    closest-hit is an argmin over all clusters in any order."""
    cl_idx = np.asarray(cl_idx)
    C, W = cl_idx.shape
    assert W % 8 == 0, W
    granule = GROUP * SGROUP
    Cp = -(-max(C, 1) // granule) * granule
    lo = np.full((Cp, 3), _NOHIT_LO, np.float32)
    hi = np.full((Cp, 3), _NOHIT_HI, np.float32)
    nonempty = (cl_idx >= 0).any(axis=1)
    lo[:C][nonempty] = np.asarray(cl_lo)[nonempty]
    hi[:C][nonempty] = np.asarray(cl_hi)[nonempty]
    tri = np.zeros((Cp, W, TRI_COLS), np.float32)
    tri[:, :, 9] = -1.0
    tri[:C, :, 0:3] = np.asarray(cl_v0)
    tri[:C, :, 3:6] = np.asarray(cl_e1)
    tri[:C, :, 6:9] = np.asarray(cl_e2)
    tri[:C, :, 9] = cl_idx.astype(np.float32)

    if cam_o is not None and C:
        cam = np.asarray(cam_o, np.float32).reshape(1, 3)
        valid = lo[:, 0] <= hi[:, 0]
        # padding clusters sort last; compute distances only over valid
        # rows (clip on an inverted +-3e38 AABB overflows f32 in norm)
        d = np.full((Cp,), np.inf, np.float32)
        d[valid] = np.linalg.norm(
            np.clip(cam, lo[valid], hi[valid]) - cam, axis=1
        )
        S = Cp // GROUP
        dg = d.reshape(S, GROUP)
        within = np.argsort(dg, axis=1, kind="stable")  # (S, GROUP)
        dsup = dg.min(axis=1)  # (S,)
        Sg = S // SGROUP
        dsg = dsup.reshape(Sg, SGROUP)
        within_s = np.argsort(dsg, axis=1, kind="stable")  # (Sg, SGROUP)
        sg_order = np.argsort(dsg.min(axis=1), kind="stable")  # (Sg,)
        sperm = (sg_order[:, None] * SGROUP + within_s[sg_order]).reshape(-1)
        perm = (sperm[:, None] * GROUP + within[sperm]).reshape(-1)
        lo, hi, tri = lo[perm], hi[perm], tri[perm]

    bounds = np.concatenate([lo, hi, np.zeros((Cp, 2), np.float32)], axis=1)
    S = Cp // GROUP
    slo = lo.reshape(S, GROUP, 3).min(axis=1)
    shi = hi.reshape(S, GROUP, 3).max(axis=1)
    sbounds = np.concatenate([slo, shi, np.zeros((S, 2), np.float32)], axis=1)
    sglo = slo.reshape(S // SGROUP, SGROUP, 3).min(axis=1)
    sghi = shi.reshape(S // SGROUP, SGROUP, 3).max(axis=1)
    sgbounds = np.concatenate(
        [sglo, sghi, np.zeros((S // SGROUP, 2), np.float32)], axis=1
    )
    return (bounds, sbounds, sgbounds,
            tri.reshape(S, GROUP * (W // 8), 8 * TRI_COLS))


@functools.partial(jax.jit, static_argnames=("n_clusters", "width", "interpret"))
def mesh_hit_tiles(ox, oy, oz, dx, dy, dz, seed, bounds, sbounds, sgbounds,
                   tri,
                   n_clusters: int, width: int, interpret: bool = False):
    """All ray args (R, 128) lane grids; bounds (Cp, 8); sbounds
    (Cp/GROUP, 8); sgbounds (Cp/GROUP/SGROUP, 8); tri
    (Cp/GROUP, GROUP*W/8, 128) — from pack_mesh_tables_np
    (n_clusters = the PADDED Cp). Returns (t, gid, u, v) each
    (R, 128); gid == -1 where nothing beat seed."""
    rows = ox.shape[0]
    assert rows % SUBLANES == 0
    assert n_clusters % (GROUP * SGROUP) == 0
    grid = rows // SUBLANES
    lane = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # bounds are scalar-indexed at a dynamic cluster id — SMEM's native
    # trick, but SMEM is tiny, so a380-class cluster counts fall back
    # to VMEM (dynamic SUBLANE + static lane indexing works there too)
    bounds_space = pltpu.SMEM if n_clusters <= 512 else pltpu.VMEM
    table = lambda a, space: pl.BlockSpec(
        a.shape, lambda i: (0, 0, 0)[: a.ndim], memory_space=space
    )
    kernel = functools.partial(
        _kernel, n_super=n_clusters // GROUP, group=GROUP,
        n_sg=n_clusters // GROUP // SGROUP, sgroup=SGROUP, width=width
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[lane] * 7
        + [
            table(bounds, bounds_space),
            table(sbounds, pltpu.SMEM if sbounds.shape[0] <= 512 else pltpu.VMEM),
            table(sgbounds, pltpu.SMEM if sgbounds.shape[0] <= 512 else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[lane, lane, lane, lane],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP * (width // 8), 8 * TRI_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((GROUP,)),
        ],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, seed, bounds, sbounds, sgbounds, tri)
