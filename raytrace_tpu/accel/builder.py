"""KD-tree / cluster builder: ctypes binding to native/kdtree.cpp with
a pure-numpy fallback implementing the same algorithm.

The native library is compiled on demand with g++ (no pybind11 in this
image — plain C ABI + ctypes). Output is fully flattened:

  nodes: axis(-1=leaf), split, left, right, leaf_off, leaf_len
  leaf_prims: concatenated per-leaf primitive id lists
  clusters: (n_clusters, width) primitive ids (-1 padded) + AABBs —
            the dense view TPU culling kernels consume.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_NATIVE_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "kdtree.cpp")
_NATIVE_SO = os.path.join(os.path.dirname(_NATIVE_SRC), "_kdtree_native.so")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_NATIVE_SO) or os.path.getmtime(_NATIVE_SO) < os.path.getmtime(_NATIVE_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _NATIVE_SRC, "-o", _NATIVE_SO]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_NATIVE_SO)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.kdtree_fetch.restype = None
    lib.kdtree_fetch.argtypes = [ctypes.c_void_p] + [i32p, f32p] + [i32p] * 4 + [i32p, i32p, f32p, f32p]
    lib.kdtree_free.restype = None
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


@dataclass
class KdTree:
    node_axis: np.ndarray  # (N,) i32, -1 = leaf
    node_split: np.ndarray  # (N,) f32
    node_left: np.ndarray  # (N,) i32
    node_right: np.ndarray
    node_leaf_off: np.ndarray
    node_leaf_len: np.ndarray
    leaf_prims: np.ndarray  # (L,) i32
    cluster_prims: np.ndarray  # (C, W) i32, -1 padded
    cluster_lo: np.ndarray  # (C, 3) f32
    cluster_hi: np.ndarray  # (C, 3) f32

    @property
    def n_clusters(self):
        return self.cluster_prims.shape[0]


def build_kdtree(
    aabb_lo: np.ndarray,
    aabb_hi: np.ndarray,
    max_depth: int = 17,
    leaf_target: int = 64,
    axis_mode: int = 0,
    native: bool = True,
    coalesce: bool = True,
) -> KdTree:
    """aabb_lo/hi: (M, 3) f32 per-primitive bounds. axis_mode 0 =
    widest-axis/median (default), 1 = the reference's depth%3 / mean
    policy (kdtree.rs:113-116).

    With coalesce=True (default) the cluster view is re-binned: leaves
    in DFS order (spatially local) are packed+deduped into clusters of
    ~leaf_target primitives — straddler duplication otherwise fragments
    real meshes into thousands of nearly-empty leaves, and cluster
    COUNT is what the TPU culled-traversal loop pays for."""
    lo = np.ascontiguousarray(aabb_lo, np.float32)
    hi = np.ascontiguousarray(aabb_hi, np.float32)
    m = lo.shape[0]
    tree = None
    if native:
        try:
            tree = _build_native(lo, hi, m, max_depth, leaf_target, axis_mode)
        except Exception:
            pass
    if tree is None:
        tree = _build_numpy(lo, hi, max_depth, leaf_target, axis_mode)
    if coalesce:
        tree = _coalesce_clusters(tree, lo, hi, leaf_target)
    return tree


def _coalesce_clusters(tree: KdTree, lo: np.ndarray, hi: np.ndarray, target: int) -> KdTree:
    """Re-bin the cluster view: walk leaves in node order, accumulate
    deduped primitive ids, flush a cluster when it reaches target."""
    bins = []
    cur: list = []
    seen: set = set()
    order = np.argsort(tree.node_leaf_off[tree.node_axis < 0])
    leaf_nodes = np.where(tree.node_axis < 0)[0][order]
    for nid in leaf_nodes:
        off = tree.node_leaf_off[nid]
        ln = tree.node_leaf_len[nid]
        for p in tree.leaf_prims[off : off + ln]:
            if p not in seen:
                seen.add(p)
                cur.append(p)
        if len(cur) >= target:
            bins.append(cur)
            cur = []
            seen = set()
    if cur:
        bins.append(cur)
    if not bins:
        bins = [[]]
    # an overfull leaf (one max-depth KD leaf holding hundreds of
    # prims) must not widen EVERY cluster: the kernel's triangle loop
    # runs the full padded width for every reached cluster, so split
    # overfull bins into target-sized chunks instead
    bins = [b[i : i + target] for b in bins for i in range(0, max(len(b), 1), target)]
    width = max(target, max(len(b) for b in bins))
    width = ((width + 7) // 8) * 8
    cp = np.full((len(bins), width), -1, np.int32)
    cl = np.zeros((len(bins), 3), np.float32)
    ch = np.zeros((len(bins), 3), np.float32)
    for i, b in enumerate(bins):
        arr = np.asarray(b, np.int32)
        cp[i, : arr.size] = arr
        if arr.size:
            cl[i] = lo[arr].min(0)
            ch[i] = hi[arr].max(0)
    return KdTree(
        node_axis=tree.node_axis, node_split=tree.node_split,
        node_left=tree.node_left, node_right=tree.node_right,
        node_leaf_off=tree.node_leaf_off, node_leaf_len=tree.node_leaf_len,
        leaf_prims=tree.leaf_prims,
        cluster_prims=cp, cluster_lo=cl, cluster_hi=ch,
    )


def build_clusters_bvh(
    aabb_lo: np.ndarray, aabb_hi: np.ndarray, leaf_target: int = 64
):
    """BVH-style clustering: recursive EXACT median partition of
    primitive centroids along the widest axis (no straddler
    duplication — each primitive lands in exactly one cluster; cluster
    AABBs may overlap, which culling handles naturally). Balanced:
    n_clusters = ceil(M / leaf_target)-ish, every cluster full.

    Returns (cluster_prims (C, W) i32 -1-padded, cluster_lo, cluster_hi).
    Preferred over the kd build for the TPU culled-traversal path —
    spatial straddler duplication fragments real meshes (observed 16x
    duplication on the reference's biplane asset)."""
    lo = np.ascontiguousarray(aabb_lo, np.float32)
    hi = np.ascontiguousarray(aabb_hi, np.float32)
    cent = 0.5 * (lo + hi)
    leaves = []

    def rec(ids: np.ndarray):
        if ids.size <= leaf_target:
            leaves.append(ids)
            return
        c = cent[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        mid = ids.size // 2
        part = np.argpartition(c[:, axis], mid)
        rec(ids[part[:mid]])
        rec(ids[part[mid:]])

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        rec(np.arange(lo.shape[0], dtype=np.int32))
    finally:
        sys.setrecursionlimit(old)

    width = ((leaf_target + 7) // 8) * 8
    cp = np.full((len(leaves), width), -1, np.int32)
    cl = np.zeros((len(leaves), 3), np.float32)
    ch = np.zeros((len(leaves), 3), np.float32)
    for i, ids in enumerate(leaves):
        cp[i, : ids.size] = ids
        cl[i] = lo[ids].min(0)
        ch[i] = hi[ids].max(0)
    return cp, cl, ch


def _build_native(lo, hi, m, max_depth, leaf_target, axis_mode) -> KdTree:
    lib = _load_native()
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    def ip(a):
        return a.ctypes.data_as(i32p)

    def fp(a):
        return a.ctypes.data_as(f32p)

    sizes = np.zeros(4, np.int32)
    handle = lib.kdtree_build(fp(lo), fp(hi), m, max_depth, leaf_target, axis_mode, ip(sizes))
    n_nodes, n_leaf, n_clusters, width = [int(x) for x in sizes]
    na = np.zeros(n_nodes, np.int32)
    ns = np.zeros(n_nodes, np.float32)
    nl = np.zeros(n_nodes, np.int32)
    nr = np.zeros(n_nodes, np.int32)
    no = np.zeros(n_nodes, np.int32)
    nn = np.zeros(n_nodes, np.int32)
    lp = np.zeros(max(n_leaf, 1), np.int32)
    cp = np.zeros(max(n_clusters * width, 1), np.int32)
    cl = np.zeros(max(n_clusters * 3, 1), np.float32)
    ch = np.zeros(max(n_clusters * 3, 1), np.float32)
    lib.kdtree_fetch(handle, ip(na), fp(ns), ip(nl), ip(nr), ip(no), ip(nn), ip(lp), ip(cp), fp(cl), fp(ch))
    lib.kdtree_free(handle)
    return KdTree(
        node_axis=na, node_split=ns, node_left=nl, node_right=nr,
        node_leaf_off=no, node_leaf_len=nn, leaf_prims=lp[:n_leaf],
        cluster_prims=cp[: n_clusters * width].reshape(n_clusters, width),
        cluster_lo=cl[: n_clusters * 3].reshape(n_clusters, 3),
        cluster_hi=ch[: n_clusters * 3].reshape(n_clusters, 3),
    )


def _build_numpy(lo, hi, max_depth, leaf_target, axis_mode) -> KdTree:
    """Same algorithm in numpy (fallback / cross-check)."""
    nodes = []
    leaf_prims: list = []
    leaves: list = []

    def rec(prims: np.ndarray, depth: int) -> int:
        nid = len(nodes)
        nodes.append(None)
        if depth >= max_depth or prims.size <= leaf_target:
            off = len(leaf_prims)
            leaf_prims.extend(prims.tolist())
            nodes[nid] = (-1, 0.0, -1, -1, off, prims.size)
            leaves.append(prims)
            return nid
        cent = 0.5 * (lo[prims] + hi[prims])
        if axis_mode == 1:
            axis = depth % 3
            split = float(cent[:, axis].mean())
        else:
            widths = cent.max(0) - cent.min(0)
            axis = int(np.argmax(widths))
            # nth_element-at-mid semantics, matching the C++ build
            mid = cent.shape[0] // 2
            split = float(np.partition(cent[:, axis], mid)[mid])
        high = prims[hi[prims, axis] >= split]
        low = prims[lo[prims, axis] <= split]
        if low.size == prims.size and high.size == prims.size:
            off = len(leaf_prims)
            leaf_prims.extend(prims.tolist())
            nodes[nid] = (-1, 0.0, -1, -1, off, prims.size)
            leaves.append(prims)
            return nid
        l = rec(low, depth + 1)
        r = rec(high, depth + 1)
        nodes[nid] = (axis, split, l, r, -1, 0)
        return nid

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        rec(np.arange(lo.shape[0], dtype=np.int32), 0)
    finally:
        sys.setrecursionlimit(old)

    arr = np.array([n[:1] for n in nodes], np.int32)
    width = max((len(p) for p in leaves), default=1)
    width = ((width + 7) // 8) * 8
    cp = np.full((len(leaves), width), -1, np.int32)
    cl = np.zeros((len(leaves), 3), np.float32)
    ch = np.zeros((len(leaves), 3), np.float32)
    for i, p in enumerate(leaves):
        cp[i, : len(p)] = p
        if len(p):
            cl[i] = lo[p].min(0)
            ch[i] = hi[p].max(0)
    return KdTree(
        node_axis=np.array([n[0] for n in nodes], np.int32),
        node_split=np.array([n[1] for n in nodes], np.float32),
        node_left=np.array([n[2] for n in nodes], np.int32),
        node_right=np.array([n[3] for n in nodes], np.int32),
        node_leaf_off=np.array([n[4] for n in nodes], np.int32),
        node_leaf_len=np.array([n[5] for n in nodes], np.int32),
        leaf_prims=np.array(leaf_prims, np.int32),
        cluster_prims=cp,
        cluster_lo=cl,
        cluster_hi=ch,
    )
