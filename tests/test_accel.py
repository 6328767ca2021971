"""KD-tree / cluster builder: native == numpy, structure invariants,
and cluster coverage (every primitive reachable)."""
import numpy as np
import pytest

from raytrace_tpu.accel import build_kdtree


def _random_aabbs(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return centers - half, centers + half


@pytest.mark.parametrize("native", [True, False])
def test_build_invariants(native):
    lo, hi = _random_aabbs(500)
    t = build_kdtree(lo, hi, max_depth=10, leaf_target=16, native=native)
    # every primitive appears in at least one leaf
    covered = np.unique(t.leaf_prims)
    assert covered.size == 500
    assert (covered == np.arange(500)).all()
    # cluster AABBs contain their primitives
    for ci in range(t.n_clusters):
        prims = t.cluster_prims[ci]
        prims = prims[prims >= 0]
        if prims.size == 0:
            continue
        assert (lo[prims] >= t.cluster_lo[ci] - 1e-5).all()
        assert (hi[prims] <= t.cluster_hi[ci] + 1e-5).all()
    # interior nodes have valid children
    interior = t.node_axis >= 0
    assert (t.node_left[interior] >= 0).all()
    assert (t.node_right[interior] >= 0).all()


def test_native_matches_numpy():
    lo, hi = _random_aabbs(300, seed=3)
    tn = build_kdtree(lo, hi, max_depth=8, leaf_target=16, native=True)
    tp = build_kdtree(lo, hi, max_depth=8, leaf_target=16, native=False)
    np.testing.assert_array_equal(tn.node_axis, tp.node_axis)
    np.testing.assert_allclose(tn.node_split, tp.node_split, rtol=1e-6)
    np.testing.assert_array_equal(tn.leaf_prims, tp.leaf_prims)
    np.testing.assert_array_equal(tn.cluster_prims, tp.cluster_prims)


def test_reference_axis_mode():
    """axis_mode=1 = the reference's depth%3 axis + centroid-mean split
    (kdtree.rs:113-116)."""
    lo, hi = _random_aabbs(100, seed=5)
    t = build_kdtree(lo, hi, max_depth=6, leaf_target=4, axis_mode=1)
    # root splits on x (depth 0 % 3), its children on y
    assert t.node_axis[0] == 0
    lchild = t.node_left[0]
    if t.node_axis[lchild] >= 0:
        assert t.node_axis[lchild] == 1


def test_scales_to_a380_size():
    lo, hi = _random_aabbs(127_749, seed=7)
    import time

    t0 = time.time()
    t = build_kdtree(lo, hi, max_depth=17, leaf_target=64)
    dt = time.time() - t0
    assert np.unique(t.leaf_prims).size == 127_749
    assert dt < 10.0, f"native build too slow: {dt:.1f}s"
