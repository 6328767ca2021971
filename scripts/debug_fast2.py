"""Debug harness: fast2 vs exact wavefront_mesh_fused on the
test_mesh_fused scene (interpret mode), classify the mismatch lanes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import test_mesh_fused as T
from raytrace_tpu.render import fused_mesh as fm
from raytrace_tpu.render.renderer import sample_batch


def run(prec, setup, spp=2):
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = setup
    out = fm.wavefront_mesh_fused(
        tables, cam_vec, scene, cam, params, T.W, T.H, xs, ys,
        jnp.int32(0), jnp.int32(spp), pool=1024, has_lens=False,
        hints=hints, interpret=True, python_loop=True, mxu_prec=prec,
        return_stats=True,
    )
    return np.asarray(out[0]), out[1]


def main():
    setup = T._setup()
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = setup
    print(f"scene: {scene.n_mesh_tris} tris mxu_chunks={scene.mxu_chunks} "
          f"n_sph={scene.n_spheres} n_ft={scene.n_free_tris}", flush=True)
    ref = np.asarray(sample_batch(
        scene, cam, params, T.W, T.H, xs, ys, jnp.int32(0), jnp.int32(2)))
    exact, st_e = run("exact", setup)
    fast, st_f = run("fast2", setup)
    for name, out, st in (("exact", exact, st_e), ("fast2", fast, st_f)):
        mm = np.abs(out - ref) / (np.abs(ref) + 1e-3)
        bad = (mm > 1e-3)
        lanes = bad.any(axis=1)
        print(f"{name}: mismatch entries {(bad).mean():.4%} lanes "
              f"{lanes.sum()}/{lanes.size} iters={int(st['iterations'])} "
              f"bounces={int(st['lane_bounces'])} "
              f"pend_sum={int(st.get('pend_sum', -1))}", flush=True)
    # lanes where fast2 differs from EXACT driver (protocol apples-to-apples)
    d = np.abs(fast - exact) / (np.abs(exact) + 1e-3)
    lanes = (d > 1e-3).any(axis=1)
    idx = np.where(lanes)[0]
    print(f"fast2 vs exact: {lanes.sum()} lanes differ: pix {idx[:20]}")
    # and fast2-vs-integrator mismatch pixels
    mm = np.abs(fast - ref) / (np.abs(ref) + 1e-3)
    il = np.where((mm > 1e-3).any(axis=1))[0]
    print(f"fast2 vs integrator mism pixels: {il[:30]}")
    em = np.abs(exact - ref) / (np.abs(ref) + 1e-3)
    el = np.where((em > 1e-3).any(axis=1))[0]
    print(f"exact vs integrator mism pixels: {el[:30]}")
    both = set(il) - set(el)
    print(f"fast2-only mismatches: {len(both)}: {sorted(both)[:20]}")




def trace_pix(pix):
    setup = T._setup()
    scheme, scene, camera, cam, xs, ys, params, tables, hints, cam_vec = setup
    for prec in ("exact", "fast2"):
        print(f"--- trace pix {pix} prec={prec}")
        os.environ["RTPU_DEBUG_PIX"] = str(pix)
        out = fm.wavefront_mesh_fused(
            tables, cam_vec, scene, cam, params, T.W, T.H, xs, ys,
            jnp.int32(0), jnp.int32(1), pool=1024, has_lens=False,
            hints=hints, interpret=True, python_loop=True, mxu_prec=prec)
        print("pix radiance:", np.asarray(out)[pix])
        os.environ.pop("RTPU_DEBUG_PIX")


if __name__ == "__main__":
    main()
