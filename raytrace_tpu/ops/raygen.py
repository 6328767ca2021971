"""Camera ray generation: pinhole + optional thin lens, jittered.

Mirrors reference ray/generate.rs:13-66 == trace.wgsl:330-384, fully
vectorized over the pixel grid:

  x_cf = screen_w / W;  y_cf = screen_h / H
  right = normalize(normalize(cam_d) x up)
  raw d = cam_d + x_cf*(x - W/2)*right + y_cf*(y - H/2)*up
  lens (if lens_r): u,v ~ U[0,1); r=sqrt(u); th=2*pi*v;
      off = right*(r-0.5)*2*lens_r*cos(th) + up*(...)sin(th)
      o += off; d -= off
  jitter: u,v ~ U[0,1)-0.5; d += right*u*x_cf + up*v*y_cf; d /= |d|

Pixel y index 0 is the BOTTOM of the image (the reference flips
vertically when writing PNGs; we keep identical indexing and flip at
save time in utils/image.py).

Draw order per lane matches the WGSL: raw ray (lens u,v if enabled)
happens FIRST in generate.rs but note the Rust code jitters after
building the raw ray; WGSL draws jitter u,v after the raw-ray lens
draws too (trace.wgsl:347-356 calls pix_cam_raw_ray first). We draw
lens (when enabled) then jitter.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import rng
from . import vec as v3
from .vec import Vec3

TWO_PI = 2.0 * jnp.pi


def generate(state, x_idx, y_idx, cam):
    """state: (N,) u32 rng streams; x_idx, y_idx: (N,) i32 pixel
    coords; cam: render.renderer.CameraArrays. Returns
    (state, ro: Vec3, rd: Vec3) in scalar-SoA layout."""
    x = x_idx.astype(jnp.float32)
    y = y_idx.astype(jnp.float32)
    s_x = cam.x_cf * (x - cam.x_off)
    s_y = cam.y_cf * (y - cam.y_off)
    cam_d = Vec3(cam.d[0], cam.d[1], cam.d[2])
    up = Vec3(cam.up[0], cam.up[1], cam.up[2])
    right = Vec3(cam.right[0], cam.right[1], cam.right[2])
    cam_o = Vec3(cam.o[0], cam.o[1], cam.o[2])

    d = cam_d + right * s_x + up * s_y

    if cam.lens_r is not None:
        state, u = rng.next_f32(state)
        state, v = rng.next_f32(state)
        r = jnp.sqrt(u)
        thet = TWO_PI * v
        ox = (r - 0.5) * (2.0 * cam.lens_r) * jnp.cos(thet)
        oy = (r - 0.5) * (2.0 * cam.lens_r) * jnp.sin(thet)
        off = right * ox + up * oy
        o = off + cam_o
        d = d - off
    else:
        one = jnp.ones_like(x)
        o = Vec3(one * cam_o.x, one * cam_o.y, one * cam_o.z)

    state, ju = rng.next_f32(state)
    state, jv = rng.next_f32(state)
    d = d + right * ((ju - 0.5) * cam.x_cf) + up * ((jv - 0.5) * cam.y_cf)
    return state, o, v3.normalize(d)
