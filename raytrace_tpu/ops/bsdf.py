"""BSDF sampling: mirror, cosine-weighted diffuse, dielectric, PBR divert.

Formula parity with reference material/interaction.rs:6-60 ==
trace.wgsl:517-579 (they agree except where noted). All functions are
elementwise over ray lanes: inputs (..., 3) / (...,), rng state is a
(...,) uint32 stream advanced per lane.

Every function returns (state, new_dir, aux...) and never branches in
Python — material selection is done by the caller with masked selects,
exactly like the WGSL material switch (trace.wgsl:459-513).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import rng
from .geom import dot, normalize, reflect

TWO_PI = 2.0 * jnp.pi


def sample_spec(d, n):
    """Mirror reflection (interaction.rs:6-9)."""
    return normalize(reflect(d, n))


def sample_diff(state, d, n):
    """Cosine-weighted hemisphere about n, built on the local frame
    (xd, yd, n) with xd = normalize(d - n(d.n)) (interaction.rs:11-27).
    Draws two uniforms."""
    xd = normalize(d - n * dot(d, n)[..., None], eps=1e-20)
    yd = normalize(jnp.cross(n, xd), eps=1e-20)
    state, u = rng.next_f32(state)
    state, v = rng.next_f32(state)
    r = jnp.sqrt(u)
    thet = TWO_PI * v
    x = r * jnp.cos(thet)
    y = r * jnp.sin(thet)
    z = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    new_d = normalize(xd * x[..., None] + yd * y[..., None] + n * z[..., None])
    return state, new_d


def sample_refract(state, d, n, n_out, n_in, mode: str = "gpu"):
    """Dielectric: Snell refraction + total internal reflection +
    Schlick fresnel with stochastic reflect/transmit choice.

    interaction.rs:29-60 (CPU) vs trace.wgsl:543-579 (GPU). Shared:
    c = n.d decides enter/exit; n_over = n1/n2; TIR when c22 < 0;
    r0 = ((n1-n2)/(n1+n2))^2; Schlick uses (1 + r0) — both backends
    have that same sign quirk — and reflect with prob re.
    Divergences handled by ``mode``:
      * 'gpu' computes re with cos = trns.n always (wgsl:571) and
        returns weight 1 on reflection (wgsl:575-576);
      * 'cpu' uses c1 when entering (interaction.rs:51) and returns
        weight re on reflection (interaction.rs:55).
    Returns (state, new_d, weight). Draws one uniform.
    """
    c = dot(n, d)
    into = c < 0.0
    n1 = jnp.where(into, n_out, n_in)
    n2 = jnp.where(into, n_in, n_out)
    c1 = jnp.abs(c)
    nr = jnp.where(into[..., None], n, -n)

    n_over = n1 / n2
    c22 = 1.0 - n_over * n_over * (1.0 - c1 * c1)
    total_internal = c22 < 0.0

    refl_d = sample_spec(d, nr)
    sq_c22 = jnp.sqrt(jnp.where(c22 > 0.0, c22, 1.0))  # grad-safe at TIR
    trns = d * n_over[..., None] + nr * (n_over * c1 - sq_c22)[..., None]
    trns = jnp.where(total_internal[..., None], d, trns)  # unused lanes, keep finite

    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    if mode == "gpu":
        cos_term = 1.0 - dot(trns, n)
    else:
        cos_term = 1.0 - jnp.where(into, c1, dot(trns, n))
    re = r0 + (1.0 + r0) * cos_term**5

    state, u = rng.next_f32(state)
    do_reflect = total_internal | (u < re)

    new_d = jnp.where(do_reflect[..., None], refl_d, normalize(trns, eps=1e-20))
    if mode == "gpu":
        w_reflect = jnp.float32(1.0)
    else:
        w_reflect = jnp.where(total_internal, 1.0, re)
    weight = jnp.where(do_reflect, w_reflect, 1.0 - re)
    return state, new_d, weight


def pbr_reflectance(metalness, d, n):
    """glTF metal-roughness Schlick probe used by mesh triangles:
    r0 = 0.04 + 0.96*metal; reflectance = r0 + (1-r0)*(1 - |d.n|^5)
    (mesh/triangle.rs:199-203 == trace.wgsl:1139-1143; note the
    reference's exponent placement: 1 - |d.n|^5, NOT (1-|d.n|)^5,
    and CUSTOM_ATTEN = 1)."""
    r0 = 0.04 + (1.0 - 0.04) * metalness
    return r0 + (1.0 - r0) * (1.0 - jnp.abs(dot(d, n)) ** 5)


def sample_pbr_divert(state, d, n, metalness, roughness):
    """Mesh-triangle PBR: choose diffuse with prob 1-reflectance, then
    add roughness-scaled random scatter normalize([u,v,w]) — the
    reference draws the u,v,w uniforms in [0,1) (positive octant bias,
    mesh/triangle.rs:209-226 == trace.wgsl:498-508). Draws up to 6
    uniforms (always 6 here for lane-uniform stream advance: choice,
    2 diffuse, 3 scatter — spec lanes simply ignore the diffuse pair).
    Returns (state, new_d)."""
    refl = pbr_reflectance(metalness, d, n)
    diffp = 1.0 - refl
    state, u = rng.next_f32(state)
    should_diff = u < diffp
    state, diff_d = sample_diff(state, d, n)
    spec_d = sample_spec(d, n)
    base = jnp.where(should_diff[..., None], diff_d, spec_d)
    state, (su, sv, sw) = rng.next_f32_n(state, 3)
    scatter = normalize(jnp.stack([su, sv, sw], axis=-1), eps=1e-20) * roughness[..., None]
    return state, normalize(base + scatter)
