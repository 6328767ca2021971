"""Two-level instancing (round 5): scenes made of N >= 4 copies of one
glTF asset build ASSET-LOCAL kernel tables + an instance table
(models/scene._try_build_instancing) and the fused mesh kernel walks
them per instance in the instance frame (mesh_bounce_kernel inst_body).
Cross-check: the instanced kernel driver vs the XLA integrator (which
always uses the FLATTENED world-space tables) on the same streams.

The asset is a tiny synthetic glTF written to tmp (8-triangle
octahedron, embedded base64 buffer) so interpret mode stays fast."""
import base64
import json
import os
import struct
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytrace_tpu.models import config as cfg
from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.models.scene import build_scene
from raytrace_tpu.ops.pallas import trace_kernel as tk
from raytrace_tpu.render import fused_mesh as fm
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

W, H = 64, 32


def _write_octahedron_gltf(tmp_path):
    """Minimal glTF 2.0: one mesh, 6 verts / 8 tris, embedded buffer."""
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    idx = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.uint16
    ).reshape(-1)
    vb = verts.tobytes()
    ib = idx.tobytes()
    buf = vb + ib
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1,
            "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.7, 0.6, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.5,
        }}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 6,
             "type": "VEC3", "min": verts.min(0).tolist(),
             "max": verts.max(0).tolist()},
            {"bufferView": 1, "componentType": 5123, "count": int(idx.size),
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vb)},
            {"buffer": 0, "byteOffset": len(vb), "byteLength": len(ib)},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
    }
    p = os.path.join(tmp_path, "oct.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def _scheme(gltf_path, n_inst=5):
    raw = {
        "render_info": {
            "width": W, "height": H, "samps_per_pix": 4,
            "kd_tree_depth": 17,
            "rad_info": {
                "debug_single_ray": False, "dir_light_samp": False,
                "russ_roull_info": {"assured_depth": 3, "max_thres": 0.5},
            },
            "use_gpu": True,
        },
        "cam": {
            "d": [0, 0, 6], "up": [0, 1, 0], "view_eulers": [0, 0, 0],
            "o": [0, 0, -14], "screen_width": 8.0, "screen_height": 4.0,
        },
        "scene_members": [
            cfg.Tagged("Sphere", {
                "c": [0, 60, -30], "r": 40,
                "coloring": cfg.Tagged("Solid", [0, 0, 0]),
                "mat": {"divert_ray": "Diff", "emissive": [2.0, 2.0, 2.0]},
            }),
        ],
    }
    scheme = cfg.parse_scheme(raw)
    for i in range(n_inst):
        scheme.scene_members.append(cfg.ModelMember(
            path=gltf_path, uniform_scale=0.8 + 0.1 * (i % 3),
            translation=np.array([-4.0 + 2.1 * i, 0.3 * (i % 2), 0.0],
                                 np.float32),
            euler_angles=np.array([0.2 * i, 0.5 * i, 0.1 * i], np.float32),
        ))
    return scheme


def test_instancing_builds_and_matches_integrator(tmp_path):
    gltf = _write_octahedron_gltf(str(tmp_path))
    scheme = _scheme(gltf)
    scene = build_scene(scheme, pad_mult=64)
    assert scene.n_inst == 5, "instancing did not engage"
    assert scene.inst_tris == 8
    assert scene.n_mesh_tris == 40
    assert scene.mk_inst.shape == (5, 24)
    # local tables cover ONE asset
    assert scene.mxu_chunks == 0

    camera = build_camera(scheme.cam, W, H)
    cam = camera_to_arrays(camera)
    params = IntegratorParams(assured_depth=3, max_bounces=6)
    flat = np.arange(W * H, dtype=np.int32)
    xs = jnp.asarray(flat % W)
    ys = jnp.asarray(flat // W)
    sph_t, ft_t = tk.pack_scene_tables(scene)
    hints = tk.scene_static_hints(sph_t, ft_t, scene.n_spheres, scene.n_free_tris)
    cam_vec = jnp.asarray(tk.make_cam_vec(camera, float(params.max_thres)))

    ref = np.asarray(sample_batch(
        scene, cam, params, W, H, xs, ys, jnp.int32(0), jnp.int32(2)))
    out = np.asarray(fm.wavefront_mesh_fused(
        (jnp.asarray(sph_t), jnp.asarray(ft_t)), cam_vec, scene, cam,
        params, W, H, xs, ys, jnp.int32(0), jnp.int32(2), pool=1024,
        has_lens=False, hints=hints, interpret=True, python_loop=True,
    ))
    # local-frame Moller-Trumbore differs from the world-frame oracle
    # in ulps, so knife-edge lanes can flip — the same class and limit
    # as the flattened kernel's parity tests
    mismatch = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert (mismatch > 1e-3).mean() < 0.012, f"{(mismatch > 1e-3).mean()}"
    md = np.abs(out.mean(0) - ref.mean(0)) / (np.abs(ref.mean(0)) + 1e-6)
    assert md.max() < 2e-2, f"channel means off {md}"
    assert np.isfinite(out).all()


def test_instancing_image_matches_flattened(tmp_path):
    """The instanced build renders the same image as the flattened
    build of the identical scene (RTPU_INSTANCING=0)."""
    gltf = _write_octahedron_gltf(str(tmp_path))
    scheme = _scheme(gltf)
    os.environ["RTPU_INSTANCING"] = "0"
    try:
        flat_scene = build_scene(scheme, pad_mult=64)
    finally:
        os.environ.pop("RTPU_INSTANCING")
    assert flat_scene.n_inst == 0
    inst_scene = build_scene(scheme, pad_mult=64)
    assert inst_scene.n_inst == 5

    camera = build_camera(scheme.cam, W, H)
    cam = camera_to_arrays(camera)
    params = IntegratorParams(assured_depth=3, max_bounces=6)
    flat = np.arange(W * H, dtype=np.int32)
    xs = jnp.asarray(flat % W)
    ys = jnp.asarray(flat // W)

    imgs = []
    for scene in (flat_scene, inst_scene):
        sph_t, ft_t = tk.pack_scene_tables(scene)
        hints = tk.scene_static_hints(
            sph_t, ft_t, scene.n_spheres, scene.n_free_tris)
        cam_vec = jnp.asarray(tk.make_cam_vec(camera, float(params.max_thres)))
        imgs.append(np.asarray(fm.wavefront_mesh_fused(
            (jnp.asarray(sph_t), jnp.asarray(ft_t)), cam_vec, scene, cam,
            params, W, H, xs, ys, jnp.int32(0), jnp.int32(2), pool=1024,
            has_lens=False, hints=hints, interpret=True, python_loop=True,
        )))
    a, b = imgs
    mismatch = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert (mismatch > 1e-3).mean() < 0.012, f"{(mismatch > 1e-3).mean()}"
    md = np.abs(a.mean(0) - b.mean(0)) / (np.abs(a.mean(0)) + 1e-6)
    assert md.max() < 2e-2, f"channel means off {md}"


def test_instancing_multidevice_matches_single(tmp_path):
    """The instanced kernel tables through the spp-sharded multi-device
    wrapper (renderer `_multi_step`) on the 8-CPU mesh vs
    single-device — the one sharding x instancing combination nothing
    else covers (mk_inst and the asset-local tables ride the scene
    pytree into shard_map)."""
    import jax

    from raytrace_tpu.render.renderer import Renderer

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 CPU devices"
    gltf = _write_octahedron_gltf(str(tmp_path))
    scheme = _scheme(gltf)
    scene = build_scene(scheme, pad_mult=64)
    assert scene.n_inst == 5
    r1 = Renderer(scheme, scene=scene, devices=[devs[0]],
                  use_mesh_fused=True, interpret=True)
    assert r1.use_mesh_fused
    img1 = r1.render(samples=8, batch=8, progress=False)
    r8 = Renderer(scheme, scene=scene, devices=devs[:8],
                  use_mesh_fused=True, interpret=True)
    assert r8.use_mesh_fused and r8._mesh1d is not None
    img8 = r8.render(samples=8, batch=8, progress=False)
    assert img1.mean() > 0.003
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=2e-5)
