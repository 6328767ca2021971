"""shard_map render and train steps over the (tile, spp) mesh.

Pixel rows shard over "tile" (the reference's rayon/workgroup pixel
parallelism), sample indices shard over "spp" (the reference's batch
axis); per-device partial radiance sums are psum'd over "spp" (the ONLY
collective in the forward path — it rides ICI). The differentiable
train step additionally psums scene/camera gradients over both axes,
which is the standard data-parallel gradient all-reduce.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..render.integrator import IntegratorParams, trace_paths
from ..render.renderer import sample_batch


def make_render_step(mesh: Mesh, width: int, height: int):
    """Returns render_step(scene, cam, params, x_idx, y_idx,
    sample_base, n_samples_per_spp_shard) -> (P, 3) radiance sums,
    where x_idx/y_idx are (P,) pixel coords (P divisible by the tile
    axis) and the TOTAL samples accumulated = spp_axis *
    n_samples_per_spp_shard."""
    spp_size = mesh.shape["spp"]

    def step(scene, cam, params, x_idx, y_idx, sample_base, n_samples):
        spp_i = jax.lax.axis_index("spp")
        base = sample_base + spp_i * n_samples
        acc = sample_batch(scene, cam, params, width, height, x_idx, y_idx, base, n_samples)
        return jax.lax.psum(acc, "spp")

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("tile"), P("tile"), P(), P()),
        out_specs=P("tile"),
        check_rep=False,
    )
    return jax.jit(sharded), spp_size


# scene leaves that carry geometry/appearance gradients; int/bool
# tables (kinds, masks, texture descriptors) are non-differentiable.
DIFF_SCENE_FIELDS = (
    "sph_c", "sph_r", "sph_rgb", "sph_emissive",
    "ft_v0", "ft_e1", "ft_e2", "ft_norm", "ft_rgb", "ft_emissive",
    "mt_v0", "mt_e1", "mt_e2", "mt_const_norm", "mt_rgb_factor",
    "tex_pool",
)


def split_diff_scene(scene):
    """scene -> (diff dict of float leaves, merge fn)."""
    diff = {f: getattr(scene, f) for f in DIFF_SCENE_FIELDS}
    return diff, (lambda d: scene.replace(**d))


def make_train_step(
    mesh: Mesh, width: int, height: int, n_samples: int = 1, loss_scale: float = 1.0
):
    """Differentiable distributed step: render a sample batch, compare
    to a target image shard, and return (loss, (scene_grads, cam_grads))
    where scene_grads is a dict over DIFF_SCENE_FIELDS — grads
    all-reduced over the whole mesh. This is the 'full training step'
    shape: data-parallel pixels (tile) + sample parallelism (spp) +
    replicated parameters with psum'd grads."""

    def step(scene, cam, params, x_idx, y_idx, sample_base, target):
        diff, _ = split_diff_scene(scene)

        # differentiate ONLY the local sample batch (no collectives
        # inside the vjp — shard_map's conservative psum transpose with
        # check_rep=False would inflate replicated cotangents by the
        # axis size); the MSE loss pieces around it are linear/explicit.
        def local_render(diff, cam):
            sc = scene.replace(**diff)
            spp_i = jax.lax.axis_index("spp")
            base = sample_base + spp_i * n_samples
            return sample_batch(
                sc, cam, params, width, height, x_idx, y_idx, base, n_samples
            )

        acc, vjp = jax.vjp(local_render, diff, cam)
        total_spp = n_samples * jax.lax.psum(1, "spp")
        img = jax.lax.psum(acc, "spp") / total_spp
        err = img - target
        local_sum = jnp.sum(err * err)
        n_total = err.size * jax.lax.psum(1, "tile")
        loss = jax.lax.psum(local_sum, "tile") / n_total * loss_scale

        # analytic cotangent of loss wrt THIS device's acc:
        # d(loss)/d(acc_d) = 2*err / (n_total * total_spp) * loss_scale
        cot = (2.0 * loss_scale / n_total / total_spp) * err
        grads = vjp(cot)
        # explicit data-parallel gradient all-reduce over the mesh (ICI)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, ("tile", "spp")), grads)
        return loss, grads

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("tile"), P("tile"), P(), P("tile")),
        out_specs=(P(), (P(), P())),
        check_rep=False,
    )
    return jax.jit(sharded)
