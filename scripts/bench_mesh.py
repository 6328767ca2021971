"""a380-class mesh benchmark: the reference's a380 asset is missing its
scene.bin in this snapshot, so build a procedural scene with the SAME
triangle count (127,749 — README.md:173) and measure paths/s against
the reference's numbers (GPU brute force 0.26 Mpaths/s, CPU+KD-tree
0.34 Mpaths/s, BASELINE.md derived table).

The procedural 'aircraft-class' mesh: a displaced icosphere-ish shell
of jittered triangles in the camera frustum, plus the reference a380
scheme's sun sphere + camera geometry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models import config as cfg
from raytrace_tpu.models.camera import build_camera
from raytrace_tpu.models.gltf import LoadedMesh, Primitive
from raytrace_tpu.models import scene as scene_mod
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

N_TRIS = 127_749  # a380 element count (reference README.md:173)
W, H = 1216, 608
SPP = int(os.environ.get("BENCH_MESH_SPP", "4"))


def make_mesh(n_tris: int, seed: int = 0) -> LoadedMesh:
    rng = np.random.default_rng(seed)
    # triangles scattered in a thick shell around the origin (roughly
    # plane-sized: 60 units), sized ~0.3 units like dense mesh detail
    centers = rng.normal(0, 1, (n_tris, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers *= rng.uniform(18, 30, (n_tris, 1))
    centers[:, 1] *= 0.3  # flatten: aircraft-ish slab
    e1 = rng.normal(0, 0.25, (n_tris, 3))
    e2 = rng.normal(0, 0.25, (n_tris, 3))
    v0 = centers - (e1 + e2) / 3.0
    poses = np.concatenate([v0, v0 + e1, v0 + e2], axis=0).astype(np.float32)
    idx = np.stack(
        [np.arange(n_tris), np.arange(n_tris) + n_tris, np.arange(n_tris) + 2 * n_tris],
        axis=1,
    ).astype(np.int32)
    norms = np.cross(e1, e2)
    norms /= np.maximum(np.linalg.norm(norms, axis=1, keepdims=True), 1e-9)
    vnorms = np.concatenate([norms, norms, norms], axis=0).astype(np.float32)
    prim = Primitive(
        poses=poses,
        norms=vnorms,
        indices=idx,
        rgb_factor=np.array([0.7, 0.72, 0.75], np.float32),
        metal_factor=0.6,
        rough_factor=0.35,
    )
    return LoadedMesh(primitives=[prim], trans_mat=np.eye(4, dtype=np.float32))


def main():
    raw = {
        "render_info": {
            "width": W, "height": H, "samps_per_pix": SPP, "kd_tree_depth": 17,
            "rad_info": {
                "debug_single_ray": False, "dir_light_samp": False,
                "russ_roull_info": {"assured_depth": 5, "max_thres": 0.5},
            },
            "use_gpu": True,
        },
        # a380.yml camera (reference schemes/a380.yml)
        "cam": {
            "d": [0, 0, 6], "up": [0, 1, 0], "view_eulers": [-0.6, 0.1, 0],
            "o": [0, -15, -30], "screen_width": 10.0, "screen_height": 5.0,
        },
        "scene_members": [
            cfg.Tagged("Sphere", {
                "c": [2500, 2200, -200], "r": 1200,
                "coloring": cfg.Tagged("Solid", [0, 0, 0]),
                "mat": {"divert_ray": "Diff", "emissive": [1.0, 1.0, 1.0]},
            }),
        ],
    }
    scheme = cfg.parse_scheme(raw)
    scene = scene_mod.build_scene(scheme)

    # splice the procedural mesh in (bypasses glTF loading)
    mt = scene_mod._mesh_triangle_arrays([make_mesh(N_TRIS)], scene_mod._TexPool())
    import raytrace_tpu.models.scene as sm

    M = mt["v0"].shape[0]
    assert M == N_TRIS, M
    # reuse build_scene's mesh packing by constructing a fresh scene
    scheme2 = cfg.parse_scheme(raw)
    scene = _build_with_mesh(scheme2, mt)
    print(f"scene: {scene.n_mesh_tris} tris, {scene.n_clusters} clusters "
          f"x{scene.cl_idx.shape[1]}", flush=True)

    cam = camera_to_arrays(build_camera(scheme.cam, W, H))
    params = IntegratorParams(assured_depth=5, max_bounces=24, mesh_kernel=True)
    flat = np.arange(W * H, dtype=np.int32)
    # tile-ordered lanes (32x32) like the renderer
    ys_all, xs_all = np.divmod(flat, W)
    tiles_x = -(-W // 32)
    perm = np.lexsort(((ys_all % 32) * 32 + xs_all % 32, (ys_all // 32) * tiles_x + xs_all // 32))
    xs = jnp.asarray(xs_all[perm].astype(np.int32))
    ys = jnp.asarray(ys_all[perm].astype(np.int32))
    scene = jax.device_put(scene)

    mode = os.environ.get(
        "BENCH_MESH_MODE",
        "classic" if os.environ.get("BENCH_MESH_CLASSIC") else "fused",
    )
    if mode == "fused":
        # the production TPU path: queue-refilled hybrid over the
        # fused mesh bounce kernel (render/fused_mesh.wavefront_mesh_fused)
        from functools import partial
        from raytrace_tpu.ops.pallas import trace_kernel as tk
        from raytrace_tpu.render.fused_mesh import wavefront_mesh_fused

        camera = build_camera(scheme.cam, W, H)
        sph_t, ft_t = tk.pack_scene_tables(scene)
        hints = tk.scene_static_hints(sph_t, ft_t, scene.n_spheres, scene.n_free_tris)
        cam_vec = jnp.asarray(tk.make_cam_vec(camera, 0.5))
        tables = (jnp.asarray(sph_t), jnp.asarray(ft_t))
        pool = min(1 << 17, -(-(W * H) // 1024) * 1024)
        spl = int(os.environ.get("RTPU_MESH_SPL", "1"))
        step = jax.jit(partial(
            wavefront_mesh_fused, width=W, height=H, pool=pool,
            has_lens=False, hints=hints, spl=spl,
        ))
        t0 = time.time()
        out = step(tables, cam_vec, scene, cam, params,
                   xs_tab=xs, ys_tab=ys,
                   sample_base=jnp.int32(0), n_samples=jnp.int32(1))
        np.asarray(out)
        print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = step(tables, cam_vec, scene, cam, params,
                   xs_tab=xs, ys_tab=ys,
                   sample_base=jnp.int32(1), n_samples=jnp.int32(SPP))
        np.asarray(out)
        dt = time.time() - t0
    elif mode == "classic":
        step = jax.jit(lambda sc, c, b: sample_batch(sc, c, params, W, H, xs, ys, b, 1))
        t0 = time.time()
        out = step(scene, cam, jnp.int32(0))
        np.asarray(out)  # axon: block_until_ready does not fence
        print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for s in range(SPP):
            out = step(scene, cam, jnp.int32(1 + s))
        np.asarray(out)  # axon: block_until_ready does not fence
        dt = time.time() - t0
    else:
        from functools import partial
        from raytrace_tpu.render.wavefront import wavefront_batch

        pool = 1 << 17
        sort_lanes = os.environ.get("WF_SORT", "0") == "1"
        print(f"sort_lanes={sort_lanes}", flush=True)
        step = jax.jit(partial(wavefront_batch, width=W, height=H, pool=pool,
                               sort_lanes=sort_lanes))
        t0 = time.time()
        out = step(scene, cam, params, xs, ys, jnp.int32(0), jnp.int32(1))
        np.asarray(out)  # axon: block_until_ready does not fence
        print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
        # one dispatch per spp: at this scale a multi-spp dispatch can
        # outlive the TPU runtime watchdog
        t0 = time.time()
        for s in range(SPP):
            out = step(scene, cam, params, xs, ys, jnp.int32(1 + s), jnp.int32(1))
        np.asarray(out)  # axon: block_until_ready does not fence
        dt = time.time() - t0
    pps = W * H * SPP / dt
    print(f"steady: {dt:.1f}s for {SPP} spp -> {pps/1e6:.3f} Mpaths/s "
          f"(reference a380: GPU 0.26, CPU+kd 0.34)", flush=True)
    print("mean:", np.asarray(out).mean(axis=0), flush=True)


def _build_with_mesh(scheme, mt):
    """build_scene, but with the mesh-triangle SoA supplied directly."""
    import raytrace_tpu.models.scene as sm

    orig = sm._mesh_triangle_arrays
    sm._mesh_triangle_arrays = lambda meshes, pool: mt
    # build_scene only calls it when meshes non-empty; fake one member
    scheme.scene_members.append(
        cfg.ModelMember(path="<procedural>", uniform_scale=1.0,
                        translation=np.zeros(3, np.float32),
                        euler_angles=np.zeros(3, np.float32))
    )
    orig_load = sm.gltf_mod.load_model
    sm.gltf_mod.load_model = lambda *a, **k: [make_mesh(N_TRIS)]
    orig_resolve = sm.resolve_asset_path
    sm.resolve_asset_path = lambda p, d: p
    try:
        return sm.build_scene(scheme)
    finally:
        sm._mesh_triangle_arrays = orig
        sm.gltf_mod.load_model = orig_load
        sm.resolve_asset_path = orig_resolve


if __name__ == "__main__":
    main()
