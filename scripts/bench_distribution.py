"""Distribution-overhead accounting on ONE chip (VERDICT round-2 ask 5).

Real multi-chip is unavailable in this environment (one v5e via the
axon tunnel), so this measures the honest single-chip proxy for the
>=80% scaling-efficiency target (BASELINE.md):

  1. t_raw      — the raw fused driver, one dispatch of K samples
  2. t_sharded  — the SAME driver wrapped in the production
                  make_spp_sharded_step over a 1-device mesh (the
                  shard_map + axis_index + psum machinery the
                  multi-chip path adds), same K samples
  overhead share = (t_sharded - t_raw) / t_sharded

  3. bytes/dispatch of the image all-reduce (the ONLY forward
     collective): n_pix * 3 * 4 bytes psum over the spp axis.

Scaling-efficiency model for N chips: each chip renders K samples in
~t_raw (sample-sharded, embarrassingly parallel), plus the psum of the
partial image. eff(N) ~ t_raw / (t_sharded + t_allreduce(N)); with
measured overhead share and the ICI-ring all-reduce moving
2*(N-1)/N * bytes per chip, the >=80% bar holds as long as
t_allreduce + overhead < 0.25 * t_raw.
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
from jax.sharding import Mesh

from raytrace_tpu.models.config import load_scheme
from raytrace_tpu.parallel.distributed import make_spp_sharded_step
from raytrace_tpu.render.renderer import Renderer, sample_batch_fused

SCHEME = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/schemes/walled.yml"
SPP = int(os.environ.get("BENCH_DIST_SPP", "2048"))


def main():
    scheme = load_scheme(SCHEME)
    r = Renderer(scheme, devices=jax.devices()[:1])
    assert r.use_fused, "walled should engage the fused driver"
    n_pix = r.width * r.height
    scene_dev = jax.device_put(r.scene)

    kw = dict(
        xs2d=r._fxs, ys2d=r._fys, rep2d=r._frep,
        sample_base=jnp.int32(0), n_samples=jnp.int32(SPP),
    )

    def run_raw():
        return r._fstep(r._tables, r._cam_vec, scene_dev, r.params, **kw)

    # warm + time, fenced by readback (axon: block_until_ready lies)
    np.asarray(run_raw())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_raw())
        ts.append(time.perf_counter() - t0)
    t_raw = min(ts)

    # the production multi-device wrapper on a 1-device mesh
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("spp",))
    _w, _h = r.width, r.height
    _spd, _spl = r.spd, r._fspl
    _hl, _hints, _hw = r.camera.lens_r is not None, r._hints, r.hw_rng

    def _fin(tables, cam_vec, scene, params, xs2d, ys2d, rep2d,
             sample_base, n_samples):
        return sample_batch_fused(
            tables, cam_vec, scene, params, _w, _h, xs2d, ys2d, rep2d,
            sample_base, n_samples, samples_per_dispatch=_spd,
            samples_per_lane=_spl, has_lens=_hl, hints=_hints, hw_rng=_hw,
        )

    mstep, _ = make_spp_sharded_step(mesh1, _fin, {})

    def run_sharded():
        return mstep(r._tables, r._cam_vec, scene_dev, r.params,
                     r._fxs, r._fys, r._frep, jnp.int32(0), jnp.int32(SPP))

    np.asarray(run_sharded())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_sharded())
        ts.append(time.perf_counter() - t0)
    t_sharded = min(ts)

    overhead = (t_sharded - t_raw) / t_sharded
    ar_bytes = n_pix * 3 * 4
    # v5e ICI: ~45 GB/s per direction per link; ring all-reduce moves
    # 2*(N-1)/N * bytes per chip — model at N=8
    ici_bw = 45e9
    t_ar8 = 2 * (8 - 1) / 8 * ar_bytes / ici_bw
    eff8 = t_raw / (t_sharded + t_ar8)
    print(f"scheme={os.path.basename(SCHEME)} spp={SPP} n_pix={n_pix}")
    print(f"t_raw      {t_raw:8.3f} s")
    print(f"t_sharded  {t_sharded:8.3f} s  (shard_map+psum machinery, 1 device)")
    print(f"overhead share {overhead:7.4%}")
    print(f"image all-reduce: {ar_bytes/1e6:.2f} MB/dispatch "
          f"(modelled ring time at N=8 over ICI: {t_ar8*1e3:.2f} ms)")
    print(f"modelled scaling efficiency at N=8: {eff8:.2%} "
          f"(>=80% target: {'PASS' if eff8 >= 0.8 else 'FAIL'})")


if __name__ == "__main__":
    main()
