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
from raytrace_tpu.models.gltf import LoadedMesh, Primitive, TextureData
from raytrace_tpu.models import scene as scene_mod
from raytrace_tpu.render.integrator import IntegratorParams
from raytrace_tpu.render.renderer import camera_to_arrays, sample_batch

N_TRIS = 127_749  # a380 element count (reference README.md:173)
W, H = 1216, 608
# 16 spp amortizes the fixed per-dispatch cost (axon dispatch chain +
# readback, ~0.6 s) that dominates a 4-spp run at ~0.7 Mpaths/s:
# composite measured 0.661 at 4 spp vs 0.703 at 16 (round 5 session 4);
# a single 16-spp dispatch is ~17 s — safely under the TPU watchdog
SPP = int(os.environ.get("BENCH_MESH_SPP", "16"))


N_TEXTURES = int(os.environ.get("BENCH_MESH_TEXTURES", "0"))
TEX_SIZE = int(os.environ.get("BENCH_MESH_TEX_SIZE", "1024"))
# geometry stand-ins for the missing a380 asset (its scene.bin is
# absent from this snapshot — the reference itself cannot load it):
#   soup      round-1/2 random soup (pathologically uncullable)
#   surface   round-3 displaced-sphere surface, exactly 127,749 tris
#   composite round 4 (VERDICT ask 2): SEVENTEEN instances of the REAL
#             biplane glTF (7,316 tris each -> 124,372, 97% of the
#             a380's 127,749) — real multi-part geometry with wings /
#             struts / gear overlapping thin parts, real u8 textures,
#             the honest test of whether cluster AABBs survive an
#             actual aircraft rather than one smooth closed shell
GEOM = os.environ.get("BENCH_MESH_GEOM", "surface")
BIPLANE = "/root/reference/assets/airplane_biplane/scene.gltf"


def _soup(n_tris, rng):
    """Round-1/2 stand-in: random triangle soup in a thick shell.
    Pathologically uncullable — ANY spatial cluster of random-soup
    triangles has a huge AABB, so cluster culling retires almost
    nothing (~300 of 2048 clusters reached per ray block, measured
    round 3). Kept for comparison under BENCH_MESH_GEOM=soup."""
    centers = rng.normal(0, 1, (n_tris, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers *= rng.uniform(18, 30, (n_tris, 1))
    centers[:, 1] *= 0.3  # flatten: aircraft-ish slab
    e1 = rng.normal(0, 0.25, (n_tris, 3))
    e2 = rng.normal(0, 0.25, (n_tris, 3))
    v0 = centers - (e1 + e2) / 3.0
    return v0, e1, e2


def _surface(n_tris, rng):
    """Round-3 default: a displaced-sphere SURFACE triangulation with
    exactly n_tris triangles — representative of the real a380 asset
    (an aircraft is a coherent surface mesh; that coherence is what
    the reference's KD-tree exploits for its ~60x claim,
    README.md:104, and what our cluster AABBs need to stay tight)."""
    nu = 360
    nv = -(-n_tris // (2 * nu)) + 2
    uu = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vv = np.linspace(0.05, np.pi - 0.05, nv)
    U, V = np.meshgrid(uu, vv, indexing="ij")  # (nu, nv)
    r = 24.0 * (
        1.0
        + 0.18 * np.sin(3 * U) * np.cos(2 * V)
        + 0.08 * np.sin(7 * U + 1.3) * np.sin(5 * V)
    )
    X = r * np.sin(V) * np.cos(U)
    Z = r * np.sin(V) * np.sin(U)
    Y = 0.3 * r * np.cos(V)  # flattened: aircraft-ish slab
    verts = np.stack([X, Y, Z], -1).reshape(nu * nv, 3)
    i = np.arange(nu)[:, None]
    j = np.arange(nv - 1)[None, :]
    a = i * nv + j
    b = ((i + 1) % nu) * nv + j
    quads_a = np.stack([a, b, a + 1], -1).reshape(-1, 3)
    quads_b = np.stack([b, b + 1, a + 1], -1).reshape(-1, 3)
    idx = np.concatenate([quads_a, quads_b], 0)[:n_tris]
    v0 = verts[idx[:, 0]]
    e1 = verts[idx[:, 1]] - v0
    e2 = verts[idx[:, 2]] - v0
    return (v0.astype(np.float32), e1.astype(np.float32),
            e2.astype(np.float32))


def make_mesh(n_tris: int, seed: int = 0) -> LoadedMesh:
    """BENCH_MESH_TEXTURES=20 adds ~20 procedural base-color textures
    sized like the real a380 asset's maps (TEX_SIZE^2 each), splitting
    the triangle shell into that many primitives with per-vertex uvs —
    so the texture-pool gather path (SURVEY 7.3's named bandwidth
    risk) is exercised at scale (VERDICT round-2 ask 7)."""
    rng = np.random.default_rng(seed)
    v0, e1, e2 = (_soup if GEOM == "soup" else _surface)(n_tris, rng)
    norms = np.cross(e1, e2)
    norms /= np.maximum(np.linalg.norm(norms, axis=1, keepdims=True), 1e-9)

    n_prims = max(1, N_TEXTURES)
    bounds = np.linspace(0, n_tris, n_prims + 1).astype(np.int64)
    prims = []
    for p in range(n_prims):
        lo_i, hi_i = bounds[p], bounds[p + 1]
        m = int(hi_i - lo_i)
        if m == 0:
            continue
        sv0, se1, se2 = v0[lo_i:hi_i], e1[lo_i:hi_i], e2[lo_i:hi_i]
        poses = np.concatenate([sv0, sv0 + se1, sv0 + se2], 0).astype(np.float32)
        idx = np.stack(
            [np.arange(m), np.arange(m) + m, np.arange(m) + 2 * m], axis=1
        ).astype(np.int32)
        vnorms = np.concatenate([norms[lo_i:hi_i]] * 3, 0).astype(np.float32)
        rgb_tex = None
        if N_TEXTURES:
            prng = np.random.default_rng(1000 + p)
            # u8 source texels like the real assets' PNGs -> the pool
            # packs u8 (round 4); BENCH_MESH_TEX_F32=1 forces the old
            # f32 pool for the storage-format comparison
            raw = prng.integers(51, 256, (TEX_SIZE, TEX_SIZE, 3),
                                dtype=np.uint8)
            pixels = raw.astype(np.float32) / 255.0
            if os.environ.get("BENCH_MESH_TEX_F32"):
                raw = None
            coords = prng.uniform(0.0, 1.0, (3 * m, 2)).astype(np.float32)
            rgb_tex = TextureData(pixels=pixels, coords=coords,
                                  pixels_raw=raw)
        prims.append(Primitive(
            poses=poses,
            norms=vnorms,
            indices=idx,
            rgb_factor=np.array([0.7, 0.72, 0.75], np.float32),
            rgb_tex=rgb_tex,
            metal_factor=0.6,
            rough_factor=0.35,
        ))
    return LoadedMesh(primitives=prims, trans_mat=np.eye(4, dtype=np.float32))


def add_composite_members(scheme):
    """Append 17 REAL biplane instances (7,316 tris each -> 124,372,
    97% of the a380's 127,749) in a 2-layer formation inside the a380
    camera frustum; per-instance yaw/pitch/roll so wings and fuselages
    overlap at many orientations — the worst case for cluster AABBs
    that a single smooth surface never exercises."""
    k = 0
    for tz in (-12.0, 0.0, 12.0):
        for tx in (-26.0, -13.0, 0.0, 13.0, 26.0):
            scheme.scene_members.append(cfg.ModelMember(
                path=BIPLANE, uniform_scale=0.05,
                translation=np.array([tx, 2.0 * ((k % 3) - 1), tz],
                                     np.float32),
                euler_angles=np.array(
                    [0.15 * ((k % 5) - 2), 0.45 * k, 0.1 * ((k % 3) - 1)],
                    np.float32),
            ))
            k += 1
    for tx, ty, tz in ((-6.5, 7.0, 6.0), (6.5, 7.0, -6.0)):
        scheme.scene_members.append(cfg.ModelMember(
            path=BIPLANE, uniform_scale=0.05,
            translation=np.array([tx, ty, tz], np.float32),
            euler_angles=np.array([0.1, 0.45 * k, -0.1], np.float32)))
        k += 1


def a380_cam_scheme(spp=SPP):
    """The a380.yml camera + sun over an empty member list."""
    raw = {
        "render_info": {
            "width": W, "height": H, "samps_per_pix": spp, "kd_tree_depth": 17,
            "rad_info": {
                "debug_single_ray": False, "dir_light_samp": False,
                "russ_roull_info": {"assured_depth": 5, "max_thres": 0.5},
            },
            "use_gpu": True,
        },
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
    return cfg.parse_scheme(raw)


def main():
    scheme = a380_cam_scheme()
    if GEOM == "composite":
        add_composite_members(scheme)
        scene = scene_mod.build_scene(scheme)
        assert scene.n_mesh_tris == 17 * 7316, scene.n_mesh_tris
    else:
        # splice the procedural mesh in (bypasses glTF loading only —
        # the real build_scene packs the SoA AND its texel pool, so
        # textured meshes get their pixels into scene.tex_pool; round 3
        # fixed a black-render bug where a prebuilt SoA pointed into a
        # discarded pool)
        scene = _build_with_mesh(scheme)
        assert scene.n_mesh_tris == N_TRIS, scene.n_mesh_tris
    print(f"scene: {scene.n_mesh_tris} tris, {scene.n_clusters} clusters "
          f"x{scene.cl_idx.shape[1]}, tex_pool "
          f"{scene.tex_pool.shape[0] * 4 / 1e6:.0f} MB", flush=True)

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
        # shade mode by coverage, exactly like the production Renderer
        from raytrace_tpu.render.renderer import (
            estimate_mesh_coverage, pick_retire_width, pick_shade_width)

        cov = estimate_mesh_coverage(scene, camera, W, H)
        cw = int(os.environ.get(
            "RTPU_SHADE_WIDTH", str(pick_shade_width(cov, pool))))
        rw = int(os.environ.get(
            "RTPU_RETIRE_WIDTH", str(pick_retire_width(cov, pool))))
        iks = spl == 1 and os.environ.get(
            "RTPU_INKERNEL_SHADE", "1" if cw >= pool else "0") != "0"
        print(f"coverage {cov:.2f} -> shade_width {cw} "
              f"({'dense' if cw >= pool else 'defer'}) retire_width {rw} "
              f"inkernel_shade {iks}", flush=True)
        step = jax.jit(partial(
            wavefront_mesh_fused, width=W, height=H, pool=pool,
            has_lens=False, hints=hints, spl=spl, shade_width=cw,
            retire_width=rw, inkernel_shade=iks,
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

    if os.environ.get("BENCH_MESH_TRACE") == "1" and mode == "fused":
        # device-op attribution of one steady dispatch (the same
        # aggregation profile_hybrid uses)
        import glob as _glob
        import gzip as _gzip
        import json as _json
        from collections import defaultdict as _dd

        trace_dir = "/tmp/bench_mesh_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            out = step(tables, cam_vec, scene, cam, params,
                       xs_tab=xs, ys_tab=ys,
                       sample_base=jnp.int32(1), n_samples=jnp.int32(SPP))
            np.asarray(out)
        paths = _glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
        if paths:
            with _gzip.open(paths[0], "rt") as f:
                tr = _json.load(f)
            pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                         for e in tr.get("traceEvents", [])
                         if e.get("ph") == "M" and e.get("name") == "process_name"}
            by = _dd(float)
            for e in tr.get("traceEvents", []):
                if e.get("ph") == "X" and "dur" in e:
                    pn = pid_names.get(e.get("pid"), "")
                    if "TPU" in pn or "tpu" in pn or "/device" in pn.lower():
                        by[e["name"]] += e["dur"] / 1e6
            print(f"device op time total {sum(by.values()):.2f}s; top 15:")
            for nm, t in sorted(by.items(), key=lambda kv: -kv[1])[:15]:
                print(f"  {t:7.3f}s  {nm[:110]}", flush=True)
    print("mean:", np.asarray(out).mean(axis=0), flush=True)

    # per-scene JSON artifact (VERDICT round-3 ask 8)
    import json

    art_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCENES_r05.json")
    art = {}
    if os.path.exists(art_path):
        with open(art_path) as f:
            art = json.load(f)
    key = f"a380_{GEOM}" + (f"_tex{N_TEXTURES}" if N_TEXTURES else "")
    art[key] = {
        "scene": key, "spp": SPP, "width": W, "height": H,
        "n_tris": int(scene.n_mesh_tris),
        "paths_per_s": round(pps, 1),
        "mpaths_per_s": round(pps / 1e6, 3),
        "vs_ref_gpu": round(pps / 0.26e6, 3),
        "vs_ref_cpu_kd": round(pps / 0.34e6, 3),
        "seconds": round(dt, 2),
        "config": {
            "mode": mode, "geom": GEOM, "n_textures": N_TEXTURES,
            "tex_pool_mb": round(np.asarray(scene.tex_pool).nbytes / 1e6, 1),
            "tex_pool_dtype": str(np.asarray(scene.tex_pool).dtype),
            "spl": int(os.environ.get("RTPU_MESH_SPL", "1")),
            "rng": "ctr",
            "coverage": round(locals().get("cov", -1.0), 3),
            "shade_width": locals().get("cw"),
            "retire_width": locals().get("rw"),
            "inkernel_shade": locals().get("iks"),
            "mxu_chunks": scene.mxu_chunks,
        },
        "image_mean": [round(float(x), 6)
                       for x in np.asarray(out).mean(axis=0)],
    }
    with open(art_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art[key]), flush=True)


def _build_with_mesh(scheme):
    """build_scene with glTF loading replaced by the procedural mesh
    (scene packing, clustering and the texel pool all run for real)."""
    import raytrace_tpu.models.scene as sm

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
        sm.gltf_mod.load_model = orig_load
        sm.resolve_asset_path = orig_resolve


if __name__ == "__main__":
    main()
