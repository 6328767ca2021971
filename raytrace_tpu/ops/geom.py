"""Small batched 3-vector helpers used across the numerics core.

Vectors are stored as ``(..., 3)`` float32 arrays (struct-of-arrays at
the call sites; the trailing axis keeps the math readable and XLA fuses
it all onto the VPU anyway).
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a, eps: float = 0.0):
    """a / |a|. With eps=0 matches the reference exactly (nalgebra
    normalize divides by the true norm; NaN on zero vectors — the
    reference has the same behavior). Pass a small eps for guarded
    variants used in gradient paths."""
    n = norm(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n[..., None]


def reflect(d, n):
    """Mirror reflection d - 2(d.n)n (reference interaction.rs:7,
    trace.wgsl reflect builtin)."""
    return d - n * (2.0 * dot(d, n))[..., None]
