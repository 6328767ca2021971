"""Scene camera: YAML precursor -> render-ready camera arrays.

Mirrors reference builder/pr/cam.rs:66-80 (the live path; the `lookat`
branch there is dead commented-out code): rotate d and up by the
view_eulers rotation matrix, keep o / screen dims / lens_r. Euler
convention matches nalgebra's from_euler_angles(r, p, y) =
Rz(y) @ Ry(p) @ Rx(r) (roll about x, pitch about y, yaw about z).

Also precomputes what the reference's RayCompute (ray/generate.rs:13-23)
derives per render: x_cf/y_cf screen-to-pixel factors, the `right`
basis vector and the half-canvas offsets.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


def euler_matrix(r: float, p: float, y: float) -> np.ndarray:
    """Rz(y) @ Ry(p) @ Rx(r), nalgebra from_euler_angles convention."""
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], dtype=np.float64)
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], dtype=np.float64)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], dtype=np.float64)
    return (rz @ ry @ rx).astype(np.float32)


@dataclass
class Camera:
    """Render-ready camera. All fields are host numpy (converted to jnp
    by the renderer); a pytree-friendly flat bundle."""

    o: np.ndarray  # (3,)
    d: np.ndarray  # (3,) o -> screen center, carries focal distance
    up: np.ndarray  # (3,) unit
    right: np.ndarray  # (3,) normalize(normalize(d) x up)
    screen_width: float
    screen_height: float
    x_cf: float
    y_cf: float
    x_off: float
    y_off: float
    lens_r: Optional[float]
    width: int
    height: int


def build_camera(cfg, width: int, height: int) -> Camera:
    r, p, y = [float(v) for v in cfg.view_eulers]
    rot = euler_matrix(r, p, y)
    d = rot @ cfg.d
    up = rot @ cfg.up
    dn = d / np.linalg.norm(d)
    right = np.cross(dn, up)
    right = right / np.linalg.norm(right)
    return Camera(
        o=cfg.o.astype(np.float32),
        d=d.astype(np.float32),
        up=up.astype(np.float32),
        right=right.astype(np.float32),
        screen_width=cfg.screen_width,
        screen_height=cfg.screen_height,
        x_cf=cfg.screen_width / width,
        y_cf=cfg.screen_height / height,
        x_off=width / 2.0,
        y_off=height / 2.0,
        lens_r=cfg.lens_r,
        width=width,
        height=height,
    )
