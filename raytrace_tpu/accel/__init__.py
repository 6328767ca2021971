"""Acceleration structures: native cluster builder (C++) consumed by
the slab-culled traversal kernels. Replaces reference src/accel/
(kdtree.rs, aabb.rs) with the dense cluster layout the TPU kernels
traverse (ops/pallas/mesh_hit_kernel.py)."""

from .builder import build_clusters_bvh  # noqa: F401
