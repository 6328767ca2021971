"""Acceleration structures: native KD-tree/cluster builder + jnp
culling ops. Replaces reference src/accel/ (kdtree.rs, aabb.rs) with a
TPU-consumable flattened layout (the shape the reference's own GPU
serialization used, gpu_structs.rs:628-772)."""

from .builder import KdTree, build_kdtree  # noqa: F401
