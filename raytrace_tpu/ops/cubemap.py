"""Distant cube map: branchless face select + texel fetch.

Reproduces reference elements/distant_cube_map.rs:28-76 ==
trace.wgsl:1199-1249: dominant-|axis| face selection with the WGSL's
``>=`` tie ordering (x beats y beats z), uv = (minor/major)*uv_scale
remapped to [0,1], nearest-neighbor sample. Faces are packed into the
scene texel pool in the WGSL's face index order
[neg_z, pos_z, neg_x, pos_x, neg_y, pos_y].
"""
from __future__ import annotations

import jax.numpy as jnp

from .geom import normalize
from .texture import sample_nearest

FACE_ORDER = ("neg_z", "pos_z", "neg_x", "pos_x", "neg_y", "pos_y")


def sample(tex_pool, face_offsets, face_dims, face_uv_scales, rd):
    """tex_pool: (T,) flat texels; face_offsets: (6,) i32;
    face_dims: (6, 2) i32 (w, h); face_uv_scales: (6, 2) f32;
    rd: (..., 3) ray directions (need not be normalized — normalized
    here, like the reference). Returns (..., 3) RGB."""
    d = normalize(rd)
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    # trace.wgsl:1209-1243 ordering: x if ax>=ay and ax>=az, elif y, else z
    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= ax) & (ay >= az)
    is_z = ~is_x & ~is_y

    face = jnp.where(
        is_x,
        jnp.where(d[..., 0] < 0.0, 2, 3),
        jnp.where(
            is_y,
            jnp.where(d[..., 1] < 0.0, 4, 5),
            jnp.where(d[..., 2] < 0.0, 0, 1),
        ),
    )
    u = jnp.where(is_x, d[..., 2], jnp.where(is_y, d[..., 0], d[..., 0]))
    v = jnp.where(is_x, d[..., 1], jnp.where(is_y, d[..., 2], d[..., 1]))
    fact = jnp.where(is_x, d[..., 0], jnp.where(is_y, d[..., 1], d[..., 2]))

    us = jnp.take(face_uv_scales[:, 0], face)
    vs = jnp.take(face_uv_scales[:, 1], face)
    su = 0.5 * (u * us / fact) + 0.5
    sv = 0.5 * (v * vs / fact) + 0.5
    return sample_nearest(
        tex_pool,
        jnp.take(face_offsets, face),
        jnp.take(face_dims[:, 0], face),
        jnp.take(face_dims[:, 1], face),
        su,
        sv,
    )
