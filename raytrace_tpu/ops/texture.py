"""Nearest-neighbor texture sampling from a flat packed texel pool.

All images in a scene (mesh base-color / normal / metal-rough maps and
the 6 cubemap faces) are concatenated into ONE flat float32 array of
RGB texels at scene-build time; each image is addressed by
(offset, width, height). Sampling semantics match the reference's
UVRgb32FImage::get_pixel (material/uv_image.rs:10-23 ==
trace.wgsl get_pixel_from_image): nearest-neighbor,
px = trunc(clamp(u*W, 0, W-1)), no v flip, clamp addressing.
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_nearest(tex_pool, offset, width, height, u, v):
    """tex_pool: (T,) flat RGB texels — f32, or u8/u16 converted to
    f32 after the gather (bit-identical; see
    models.scene.pool_texels_to_f32). offset/width/height: (...,)
    int32 per-lane image descriptors. u, v: (...,) f32. Returns
    (..., 3) f32 RGB.

    Degenerate descriptors (width == 0) return black; callers mask."""
    from ..models.scene import pool_texels_to_f32

    w = width.astype(jnp.float32)
    h = height.astype(jnp.float32)
    px = jnp.clip(u * w, 0.0, jnp.maximum(w - 1.0, 0.0)).astype(jnp.int32)
    py = jnp.clip(v * h, 0.0, jnp.maximum(h - 1.0, 0.0)).astype(jnp.int32)
    base = offset + 3 * (px + py * width)
    ok = width > 0
    base = jnp.where(ok, base, 0)
    if tex_pool.dtype == jnp.uint32:
        # packed all-8-bit pool: one u32 word per texel (R|G<<8|B<<16)
        # — one gather instead of three (models/scene._TexPool). base
        # is off + 3k with off divisible by 3, so // 3 is the texel id.
        w32 = jnp.take(tex_pool, base // 3, mode="clip")
        rgb = jnp.stack(
            [((w32 >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.float32)
             / jnp.float32(255.0)
             for i in range(3)], axis=-1,
        )
    else:
        rgb = jnp.stack(
            [jnp.take(tex_pool, base + i, mode="clip") for i in range(3)],
            axis=-1,
        )
        rgb = pool_texels_to_f32(rgb)
    return jnp.where(ok[..., None], rgb, 0.0)


def interp_uv(uv012, bu, bv):
    """Barycentric interpolation of per-vertex UVs, w = 1-u-v first:
    uv = b0*uv0 + b1*uv1 + b2*uv2 with (b1, b2) = intersection
    barycentrics (mesh/triangle.rs:228-237 == trace.wgsl
    tex_coord_from_bary). uv012: (..., 3, 2); bu, bv: (...,)."""
    b0 = 1.0 - bu - bv
    return (
        uv012[..., 0, :] * b0[..., None]
        + uv012[..., 1, :] * bu[..., None]
        + uv012[..., 2, :] * bv[..., None]
    )
