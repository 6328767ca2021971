"""Renderer driver: jit-compiled sample-batch steps over pixel tiles.

The TPU-native replacement for the reference's render orchestration
(renderer.rs:27-63 + draw_scene.rs): instead of per-batch dispatch +
blocking readback (the reference's known bottleneck, README.md:156-160),
the accumulator lives on device, each batch is one donated jit call, and
the host only pulls pixels for previews / the final image.

spp batching (`render_batch`) keeps the reference's scheme-file meaning
(progress/preview cadence; there is no watchdog to dodge here).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera, build_camera
from ..models.config import Scheme
from ..models.scene import SceneArrays, build_scene
from ..ops import raygen, rng
from . import fused_mesh as _fm
from . import wavefront as _wf
from .integrator import IntegratorParams, trace_paths
from .target import RenderTarget


@flax.struct.dataclass
class CameraArrays:
    """Traced camera bundle consumed by ops.raygen (and a
    differentiable leaf set for camera gradients)."""

    o: Any
    d: Any
    up: Any
    right: Any
    x_cf: Any
    y_cf: Any
    x_off: Any
    y_off: Any
    lens_r: Any = None  # None => pinhole (static structure)


def camera_to_arrays(cam: Camera) -> CameraArrays:
    return CameraArrays(
        o=jnp.asarray(cam.o),
        d=jnp.asarray(cam.d),
        up=jnp.asarray(cam.up),
        right=jnp.asarray(cam.right),
        x_cf=jnp.float32(cam.x_cf),
        y_cf=jnp.float32(cam.y_cf),
        x_off=jnp.float32(cam.x_off),
        y_off=jnp.float32(cam.y_off),
        lens_r=(jnp.float32(cam.lens_r) if cam.lens_r is not None else None),
    )


def sample_batch(
    scene, cam, params, width, height, x_idx, y_idx, sample_base, n_samples,
    samples_per_dispatch: int = 1,
):
    """Radiance SUM over n_samples for the given pixels. Pure function
    (jit under the driver): per sample s, seed the per-pixel stream from
    (x, y, sample_base + s), generate the jittered camera ray, trace.

    samples_per_dispatch (static) packs that many sample replicas of
    every pixel into one giant lane batch per bounce-loop dispatch —
    the bounce loop's cost is dominated by per-iteration overheads, so
    more lanes per iteration is nearly free throughput. n_samples must
    be divisible by it.
    """

    from ..ops.vec import Vec3

    spd = samples_per_dispatch
    n = x_idx.shape[0]
    if spd > 1:
        xs = jnp.tile(x_idx, spd)
        ys = jnp.tile(y_idx, spd)
        rep = jnp.repeat(jnp.arange(spd, dtype=jnp.int32), n)
    else:
        xs, ys, rep = x_idx, y_idx, None

    def body(s, acc):
        if spd > 1:
            samp = sample_base + s * spd + rep
        else:
            samp = sample_base + s
        state = rng.init_state(xs, ys, width, height, samp)
        state, ro, rd = raygen.generate(state, xs, ys, cam)
        radiance, _ = trace_paths(scene, params, ro, rd, state)
        if spd > 1:
            radiance = Vec3(
                radiance.x.reshape(spd, n).sum(0),
                radiance.y.reshape(spd, n).sum(0),
                radiance.z.reshape(spd, n).sum(0),
            )
        return acc + radiance

    z = jnp.zeros((n,), jnp.float32)
    acc0 = Vec3(z, z, z)
    if params.differentiable:
        # reverse-mode needs static trip counts: scan over a static
        # number of samples (n_samples must be a python int here)
        if not isinstance(n_samples, int):
            raise TypeError("differentiable sample_batch needs static int n_samples")
        assert n_samples % spd == 0, "n_samples must divide by samples_per_dispatch"

        def scan_body(acc, s):
            return body(s, acc), None

        acc, _ = jax.lax.scan(scan_body, acc0, jnp.arange(n_samples // spd))
    else:
        # traced n_samples: driver guarantees divisibility
        acc = jax.lax.fori_loop(0, n_samples // spd, body, acc0)
    return acc.to_array()


def sample_batch_fused(
    tables, cam_vec, scene, params, width, height, xs2d, ys2d, rep2d,
    sample_base, n_samples, samples_per_dispatch: int = 1,
    samples_per_lane: int = 1, has_lens: bool = False, hints=None,
    hw_rng: bool = False, interpret: bool = False,
):
    """Fused-kernel equivalent of sample_batch for supported scenes
    (ops/pallas/trace_kernel.py): per sample round, one pallas_call
    runs the whole bounce loop; cubemap misses are resolved with an
    XLA gather afterwards. xs2d/ys2d/rep2d are (R, 128) lane grids
    holding samples_per_dispatch // samples_per_lane pixel replicas;
    the kernel covers samples_per_lane consecutive sample ids per lane
    by in-kernel regeneration (cubemap-free scenes only — their lanes
    would need one miss record per sample). Returns (n_pix, 3)
    radiance sums."""
    from ..ops.pallas import trace_kernel as tk
    from ..ops.vec import Vec3

    del width, height  # pixel coords come in via the lane grids
    sph_table, ft_table = tables
    spd = samples_per_dispatch
    spl = samples_per_lane
    assert spd % spl == 0
    reps = spd // spl
    n_lanes = xs2d.size
    n_pix = n_lanes // reps  # padded pixel count (caller slices)

    def body(s, acc):
        samp = sample_base + s * spd + rep2d * spl
        lr, lg, lb, mdx, mdy, mdz, mwr, mwg, mwb = tk.trace_tiles(
            xs2d, ys2d, samp, sph_table, ft_table, cam_vec,
            n_sph=scene.n_spheres, n_ft=scene.n_free_tris,
            has_lens=has_lens,
            assured=params.assured_depth,
            max_bounces=params.max_bounces,
            samples_per_lane=spl,
            hints=hints if hints is not None else tk._PERMISSIVE,
            hw_rng=hw_rng,
            seed=(sample_base + s * spd).astype(jnp.int32).reshape(1, 1),
            interpret=interpret,
            # lane-tiles per kernel block (read at trace time): 4 won
            # the round-4 walled sweep by +27% over 1 — see trace_tiles
            block_cols=int(os.environ.get("RTPU_BLOCK_COLS", "4")),
        )
        if scene.has_cubemap:
            from .integrator import sample_cubemap

            md = Vec3(mdx.reshape(-1), mdy.reshape(-1), mdz.reshape(-1))
            missed = (md.x != 0.0) | (md.y != 0.0) | (md.z != 0.0)
            sky = sample_cubemap(scene, Vec3(
                jnp.where(missed, md.x, 1.0), md.y, md.z))
            lr = lr.reshape(-1) + jnp.where(missed, mwr.reshape(-1) * sky.x, 0.0)
            lg = lg.reshape(-1) + jnp.where(missed, mwg.reshape(-1) * sky.y, 0.0)
            lb = lb.reshape(-1) + jnp.where(missed, mwb.reshape(-1) * sky.z, 0.0)
        else:
            lr, lg, lb = lr.reshape(-1), lg.reshape(-1), lb.reshape(-1)
        if reps > 1:
            rad = Vec3(
                lr.reshape(reps, n_pix).sum(0),
                lg.reshape(reps, n_pix).sum(0),
                lb.reshape(reps, n_pix).sum(0),
            )
        else:
            rad = Vec3(lr, lg, lb)
        return acc + rad

    z = jnp.zeros((n_pix,), jnp.float32)
    acc = jax.lax.fori_loop(0, n_samples // spd, body, Vec3(z, z, z))
    return acc.to_array()


# module-level shared jits: every Renderer instance (and every animation
# frame, which builds one Renderer per frame — renderer.rs:169-204's
# shape) reuses the SAME traced/compiled executable for a given
# (shapes, statics) key instead of re-jitting through a fresh
# functools.partial each time.
_jit_step = jax.jit(
    sample_batch,
    static_argnames=("width", "height", "samples_per_dispatch"),
)
_jit_fused_step = jax.jit(
    sample_batch_fused,
    static_argnames=(
        "width", "height", "samples_per_dispatch", "samples_per_lane", "has_lens",
        "hints", "hw_rng", "interpret",
    ),
)
_jit_wavefront_step = jax.jit(
    _wf.wavefront_batch,
    static_argnames=("width", "height", "pool", "sort_lanes", "return_stats"),
)
_jit_mesh_fused_step = jax.jit(
    _fm.sample_batch_mesh_fused,
    static_argnames=(
        "width", "height", "spl", "has_lens", "hints", "interpret",
        "python_loop", "return_stats",
    ),
)
_jit_wf_mesh_fused_step = jax.jit(
    _fm.wavefront_mesh_fused,
    static_argnames=(
        "width", "height", "pool", "has_lens", "hints", "interpret",
        "python_loop", "return_stats", "spl", "compact_lanes",
        "shade_width", "ablate", "attr_div", "retire_width",
        "inkernel_shade", "mxu_prec",
    ),
)


# pend-shade mode threshold: estimated fraction of primary rays
# entering the mesh root AABB above which the hybrid driver shades
# pend lanes DENSE (full pool width) instead of deferring to a
# pool//4 compacted buffer. Chosen from the round-4 sweep
# (scripts/sweep_shade_mode.py, BENCH_NOTES round 4): deferral wins
# sparse-pend scenes (biplane cov 0.21), saturates and loses ~30%
# when pend production exceeds the fixed width (spaceship cov 0.58).
SHADE_DENSE_COVERAGE = 0.30


def pick_shade_width(coverage: float, pool: int) -> int:
    """Shade width for the hybrid mesh driver: dense (== pool) for
    mesh-heavy scenes, pool//4 deferral for sky-dominated ones.
    Round-4 sweep (SWEEP_SHADE_r04.json, 5 scenes x 3 modes, 8 spp):
    defer4 wins at coverage 0.10 (2.23 vs 2.18 dense) and 0.21 (3.06
    vs 2.83); dense wins at 0.58 (1.31 vs 0.93), 0.90 (1.10 vs 0.93)
    and 1.00 (0.469 vs 0.438); the pool//2 middle mode never wins
    (rank machinery at 2x width without the density win). Any
    threshold in (0.21, 0.58) fits the data; 0.30 stays.
    Unit-tested at the boundary in tests/test_texpool.py."""
    return pool if coverage > SHADE_DENSE_COVERAGE else pool // 4


def pick_retire_width(coverage: float, pool: int) -> int:
    """Retirement/sky compaction width for the hybrid mesh driver
    (fused_mesh.wavefront_mesh_fused retire_width). Mesh-heavy scenes
    retire/miss a minority of lanes per iteration (spaceship_r1:
    sel avg ~43%, max ~60% of pool), so compacting the sky texel
    gathers + the image scatter to 5*pool//8 rows wins; sky-dominated
    scenes retire ~79% of the pool every iteration (biplane avg path
    length 1.19 bounces) — nothing to compact, the rank pass is pure
    overhead and the dense formulation (0) stays. Same coverage signal
    and threshold as pick_shade_width (the two regimes coincide:
    dense-shade scenes are the compactable-retirement scenes).
    Measured round 4 (16/64 spp profile_hybrid): spaceship 36.1 ->
    32.2 ms/iter, 1.57 -> 1.755 Mpaths/s at 5*pool//8 (width sweep
    1/2: 1.698, 9/16: 1.669, 5/8: 1.755, 3/4: 1.681 — wider keeps
    occupancy, narrower compacts more; 5/8 balances); biplane FORCED
    to 5*pool//8 measured 3.98 vs 4.36 dense (sel avg 0.855, deferral
    on 562 of 579 iterations, occupancy 94.6 -> 72.4%)."""
    return 5 * pool // 8 if coverage > SHADE_DENSE_COVERAGE else 0


def estimate_mesh_coverage(scene, cam, width: int, height: int) -> float:
    """Estimated fraction of primary rays whose slab test enters the
    mesh root AABB (numpy, every-8th-pixel grid, no jitter) — drives
    the pend-shade mode choice. 0.0 when no mesh."""
    if scene.n_inst:
        # instanced scenes: mk_bounds are asset-LOCAL; the world-space
        # root AABBs live in the instance table
        it = np.asarray(scene.mk_inst)
        lo = it[:, 12:15].min(axis=0)
        hi = it[:, 15:18].max(axis=0)
    else:
        mb = np.asarray(scene.mk_bounds)
        valid = mb[:, 0] <= mb[:, 3]
        if not valid.any():
            return 0.0
        lo = mb[valid, 0:3].min(axis=0)
        hi = mb[valid, 3:6].max(axis=0)
    xs = np.arange(0, width, 8, dtype=np.float32)
    ys = np.arange(0, height, 8, dtype=np.float32)
    X, Y = np.meshgrid(xs, ys)
    s_x = (cam.x_cf * (X - cam.x_off))[..., None]
    s_y = (cam.y_cf * (Y - cam.y_off))[..., None]
    d = cam.d[None, None, :] + cam.right * s_x + cam.up * s_y
    d = np.where(np.abs(d) < 1e-4, np.where(d < 0, -1e-4, 1e-4), d)
    inv = 1.0 / d
    t0 = (lo - cam.o) * inv
    t1 = (hi - cam.o) * inv
    entry = np.minimum(t0, t1).max(axis=-1)
    exit_ = np.maximum(t0, t1).min(axis=-1)
    return float(((entry <= exit_) & (exit_ >= 0.0)).mean())


def adapt_dispatch_spp(b: int, dt: float, ceiling: int,
                       grow_below: float = 15.0,
                       shrink_above: float = 35.0) -> int:
    """Watchdog-aware dispatch sizing for mesh scenes (round 5).

    The per-dispatch fixed costs — the wavefront drain tail (the
    max-path-length iterations the pool pays at collapsing occupancy
    once per dispatch) and the host sync + (n_pix, 3) readback —
    favor LARGE dispatches, but a single dispatch that outlives the
    ~60 s TPU runtime watchdog kills the worker (the reference had
    the same constraint on consumer GPUs, README.md:280-285), and a
    safe static cap must assume the slowest scene class (~16 spp).
    n_samples is a TRACED scalar in every driver, so resizing the
    dispatch does not recompile: after each dispatch the renderer
    doubles `b` while the measured wall time stays under
    `grow_below` seconds (the next dispatch then worst-cases at
    ~2x grow_below, comfortably inside the watchdog) and halves it
    above `shrink_above`. Measured at the reference's 200-spp
    protocol on one v5e: spaceship_r1 4.32 Mpaths/s at a static
    50-spp cap vs 4.46 at 100 — the growth path recovers that
    without risking a380-class scenes (~0.7 Mpaths/s, where 100 spp
    would be ~105 s and a worker kill)."""
    if dt < grow_below and b * 2 <= ceiling:
        return b * 2
    if dt > shrink_above and b > 1:
        return max(1, b // 2)
    return b


def _params_from_scheme(scheme: Scheme, mode: str, differentiable: bool, mesh_chunk: int):
    ri = scheme.render_info.rad_info
    return IntegratorParams(
        max_thres=jnp.float32(ri.russ_roull_info.max_thres),
        assured_depth=ri.russ_roull_info.assured_depth,
        mode=mode,
        debug_single_ray=ri.debug_single_ray,
        dir_light_samp=ri.dir_light_samp,
        mesh_chunk=mesh_chunk,
        differentiable=differentiable,
    )


class Renderer:
    """Static-scene renderer (the consume_and_do analogue,
    renderer.rs:41-63)."""

    def __init__(
        self,
        scheme: Scheme,
        mode: Optional[str] = None,
        tile_size: int = 1 << 17,
        mesh_chunk: int = 2048,
        scene: Optional[SceneArrays] = None,
        samples_per_dispatch: Optional[int] = None,
        use_fused: Optional[bool] = None,
        use_wavefront: Optional[bool] = None,
        use_mesh_fused: Optional[bool] = None,
        hw_rng: Optional[bool] = None,
        devices: Optional[Any] = None,
        interpret: bool = False,
    ):
        """devices: devices to render on (default: ALL attached
        devices). With more than one, every dispatch spp-shards over a
        1-D jax.sharding.Mesh — each device renders the full pixel set
        for a disjoint contiguous sample-id slice and the partial
        images psum over ICI (parallel/distributed.py). Sample ids are
        partitioned exactly, so incremental/resumed renders stay
        stream-exact."""
        self.scheme = scheme
        # interpret=True runs the Pallas kernels in interpret mode so
        # the fused drivers (and their multi-device wrappers) execute
        # on CPU — the virtual-mesh test path for renderer wiring that
        # previously only ever ran on real TPU hardware
        self.interpret = interpret
        info = scheme.render_info
        self.width, self.height = info.width, info.height
        self.devices = list(devices) if devices is not None else list(jax.devices())
        self.n_devices = len(self.devices)
        self._mesh1d = None
        if self.n_devices > 1:
            from jax.sharding import Mesh

            self._mesh1d = Mesh(np.asarray(self.devices), ("spp",))
        # use_gpu in the scheme selects the reference backend; for us it
        # selects which reference SEMANTICS to reproduce (gpu default).
        self.mode = mode or ("gpu" if info.use_gpu else "cpu")
        self.scene = scene if scene is not None else build_scene(scheme, pad_mult=mesh_chunk)
        m = self.scene.mt_v0.shape[0]
        if m:
            mesh_chunk = min(mesh_chunk, m)
        self.params = _params_from_scheme(scheme, self.mode, False, mesh_chunk)
        if jax.default_backend() != "cpu":
            # Pallas mesh closest-hit kernel (gpu semantics, forward)
            self.params = self.params.replace(mesh_kernel=True)
        self.camera = build_camera(scheme.cam, self.width, self.height)
        self.cam_arrays = camera_to_arrays(self.camera)
        self.target = RenderTarget(self.width, self.height)
        self.tile_size = min(tile_size, self.width * self.height)
        self._scene_dev = None  # lazy one-time device upload (render())

        from ..ops.pallas import trace_kernel as tk

        if use_fused is None:
            use_fused = tk.supports(self.scene, self.params) and jax.default_backend() != "cpu"
        self.use_fused = use_fused and tk.supports(self.scene, self.params)
        # fused mesh bounce pipeline (ops/pallas/mesh_bounce_kernel):
        # the default production path for mesh scenes on TPU
        if use_mesh_fused is None:
            use_mesh_fused = (
                _fm.supports(self.scene, self.params)
                and jax.default_backend() != "cpu"
            )
        self.use_mesh_fused = (
            use_mesh_fused
            and not self.use_fused
            and _fm.supports(self.scene, self.params)
        )
        self.spd = samples_per_dispatch or (
            4 if self.use_fused else (16 if self.use_mesh_fused else 1)
        )
        # hardware-PRNG draws are a fused-kernel feature; resolve the
        # flag unconditionally so renderer.hw_rng is always readable
        if hw_rng is None:
            hw_rng = os.environ.get("RTPU_HW_RNG", "0") == "1"
        self.hw_rng = bool(hw_rng)
        if self.hw_rng and not self.use_fused:
            import warnings

            warnings.warn(
                "hw_rng=True has no effect outside the fused kernel path; "
                "this renderer uses counter-RNG streams", stacklevel=2,
            )
            self.hw_rng = False

        n_pix = self.width * self.height
        # lane order: 32x32 pixel tiles, NOT scanlines — consecutive
        # 1024-lane blocks are spatially square so cluster-culling's
        # per-block slab tests actually skip (a scanline block crosses
        # the whole image and skips nothing). Results are unscrambled
        # on accumulation via _perm.
        ys_all, xs_all = np.divmod(np.arange(n_pix, dtype=np.int64), self.width)
        tiles_x = -(-self.width // 32)
        tile_id = (ys_all // 32) * tiles_x + (xs_all // 32)
        within = (ys_all % 32) * 32 + (xs_all % 32)
        self._perm = np.lexsort((within, tile_id)).astype(np.int64)

        n_tiles = -(-n_pix // self.tile_size)
        pad = n_tiles * self.tile_size - n_pix
        flat = np.concatenate(
            [self._perm, np.full(pad, self._perm[-1], np.int64)]
        ).astype(np.int32)
        self._pad = pad
        self._x_idx = (flat % self.width).reshape(n_tiles, self.tile_size)
        self._y_idx = (flat // self.width).reshape(n_tiles, self.tile_size)
        self.n_tiles = n_tiles

        if self.use_fused:
            # fused path: one lane grid covering ALL pixels x `reps`
            # replicas, rep-major so the (reps, padded_npix) reshape
            # sums replicas; pixel count padded so lanes fill
            # (SUBLANES x 128) tiles. Cubemap-free scenes run ONE
            # replica and instead let the kernel regenerate spd
            # samples per lane in place (no idle-lane tail per round).
            reps = self.spd if self.scene.has_cubemap else 1
            self._fspl = self.spd // reps
            lane_unit = tk.SUBLANES * tk.LANES
            assert lane_unit % reps == 0
            unit = lane_unit // reps
            padded_npix = -(-n_pix // unit) * unit
            lane = np.arange(padded_npix * reps)
            pix_order = np.concatenate(
                [self._perm, np.full(padded_npix - n_pix, self._perm[-1], np.int64)]
            )
            lane_pix = pix_order[lane % padded_npix]
            rep = lane // padded_npix
            rows = lane.size // tk.LANES
            self._fxs = jnp.asarray((lane_pix % self.width).astype(np.int32).reshape(rows, tk.LANES))
            self._fys = jnp.asarray((lane_pix // self.width).astype(np.int32).reshape(rows, tk.LANES))
            self._frep = jnp.asarray(rep.astype(np.int32).reshape(rows, tk.LANES))
            self._fpadded_npix = padded_npix
            sph_t, ft_t = tk.pack_scene_tables(self.scene)
            self._tables = (jnp.asarray(sph_t), jnp.asarray(ft_t))
            self._hints = tk.scene_static_hints(
                sph_t, ft_t, self.scene.n_spheres, self.scene.n_free_tris
            )
            self._cam_vec = jnp.asarray(
                tk.make_cam_vec(self.camera, float(scheme.render_info.rad_info.russ_roull_info.max_thres))
            )
            self._fstep = partial(
                _jit_fused_step,
                width=self.width, height=self.height,
                samples_per_dispatch=self.spd,
                samples_per_lane=self._fspl,
                has_lens=self.camera.lens_r is not None,
                hints=self._hints,
                hw_rng=self.hw_rng,
                interpret=self.interpret,
            )

        if self.use_mesh_fused:
            # queue-refilled hybrid (fused_mesh.wavefront_mesh_fused):
            # a fixed ~full-occupancy lane pool over the fused mesh
            # bounce kernel; work units handed out sample-major over
            # the tile-ordered pixel permutation (block coherence for
            # the kernel's cluster culling)
            # lane-pool cap: 128k lanes keeps every dense per-iteration
            # stage comfortably under VMEM block limits; RTPU_MESH_POOL
            # overrides for pool-scaling experiments (must stay a
            # multiple of 1024 — wavefront_mesh_fused asserts it)
            _pool_cap = int(os.environ.get("RTPU_MESH_POOL", str(1 << 17)))
            self.mf_pool = min(_pool_cap, -(-n_pix // 1024) * 1024)
            # chunk length: a refilled lane owns up to this many
            # consecutive samples of one pixel. Default 1: the sweep
            # (BENCH_NOTES round 3) measured chunking a net LOSS on
            # biplane — the per-iteration dense ops (refill cumsum,
            # scatter, sky resolve) cost pool-width regardless of how
            # many lanes retire, so rarer refills saved nothing while
            # the drain tail grew 124->152 iterations at spl=8.
            self.mf_spl = int(os.environ.get("RTPU_MESH_SPL", "1"))
            # pend-shade mode: deferral at pool/4 wins SPARSE-pend
            # (sky-dominated) scenes; the dense shade wins mesh-heavy
            # ones where deferral saturates (BENCH_NOTES round 3,
            # spaceship 0.87 dense vs 0.62 defer). Chosen by the
            # estimated fraction of primary rays entering the mesh
            # root AABB; RTPU_SHADE_WIDTH overrides (0 = pool/4
            # deferral, >= pool = dense).
            cov = self._mesh_coverage()
            default_cw = pick_shade_width(cov, self.mf_pool)
            self.mf_shade_width = int(
                os.environ.get("RTPU_SHADE_WIDTH", str(default_cw))
            )
            # retirement/sky compaction width (0 = dense): compact the
            # per-iteration sky resolve + image scatter to the lanes
            # that actually missed/retired — wins exactly the scenes
            # where the dense shade wins (see pick_retire_width)
            self.mf_retire_width = int(
                os.environ.get(
                    "RTPU_RETIRE_WIDTH",
                    str(pick_retire_width(cov, self.mf_pool)),
                )
            )
            # in-kernel mesh-pend shade (round 4): the kernel completes
            # pend bounces from driver-gathered attrs (flag 4) and the
            # per-iteration XLA stage reduces to the gathers. Wins
            # exactly the dense-shade scenes (spaceship 1.78 -> 1.84
            # Mpaths/s); on defer-shade scenes the XLA defer machinery
            # is already cheap and iks measured a small loss (biplane
            # 4.56 -> 4.44), so it follows the shade-mode pick. spl ==
            # 1 only; RTPU_INKERNEL_SHADE=0/1 overrides.
            _iks_default = self.mf_shade_width >= self.mf_pool
            self.mf_inkernel = (
                self.mf_spl == 1
                and os.environ.get(
                    "RTPU_INKERNEL_SHADE", "1" if _iks_default else "0"
                ) != "0"
            )
            # MXU intersection mode: exact (6-pass HIGHEST, default)
            # or the opt-in fast2 candidate-refine (3-pass bf16 +
            # exact-MT driver re-test). fast2 measured SLOWER end to
            # end on v5e (1.65 vs 1.74 Mpaths/s spaceship_r1, round 5
            # BENCH_NOTES) — the matmul is no longer the iteration
            # bottleneck, so the refine-stage overhead eats the 3-pass
            # saving; it stays available for study. Resolved HERE, not
            # at trace time — the module-level jit caches by static
            # args, so an env read inside the traced function would
            # bake the first caller's choice into every later renderer
            # in the process.
            self.mf_mxu_prec = os.environ.get("RTPU_MXU_PREC", "exact")
            self._mxs = jnp.asarray((self._perm % self.width).astype(np.int32))
            self._mys = jnp.asarray((self._perm // self.width).astype(np.int32))
            sph_t, ft_t = tk.pack_scene_tables(self.scene)
            self._mtables = (jnp.asarray(sph_t), jnp.asarray(ft_t))
            self._mhints = tk.scene_static_hints(
                sph_t, ft_t, self.scene.n_spheres, self.scene.n_free_tris
            )
            self._mcam_vec = jnp.asarray(
                tk.make_cam_vec(self.camera, float(scheme.render_info.rad_info.russ_roull_info.max_thres))
            )
            self._mstep = partial(
                _jit_wf_mesh_fused_step,
                width=self.width, height=self.height,
                pool=self.mf_pool,
                has_lens=self.camera.lens_r is not None,
                hints=self._mhints,
                spl=self.mf_spl,
                shade_width=self.mf_shade_width,
                retire_width=self.mf_retire_width,
                inkernel_shade=self.mf_inkernel,
                mxu_prec=self.mf_mxu_prec,
                interpret=self.interpret,
            )

        self._step = partial(
            _jit_step, width=self.width, height=self.height,
            samples_per_dispatch=1,
        )

        # wavefront lane-regeneration driver (render/wavefront.py):
        # default for every non-fused forward render it supports — the
        # masked bounce loop wastes most of its width on dead lanes
        if use_wavefront is None:
            use_wavefront = (
                not self.use_fused
                and not self.use_mesh_fused
                and _wf.supports(self.scene, self.params)
            )
        self.use_wavefront = (
            use_wavefront
            and not self.use_fused
            and not self.use_mesh_fused
            and _wf.supports(self.scene, self.params)
        )
        if self.use_wavefront:
            self.wf_pool = min(1 << 17, -(-n_pix // 1024) * 1024)
            self._wxs = jnp.asarray((self._perm % self.width).astype(np.int32))
            self._wys = jnp.asarray((self._perm // self.width).astype(np.int32))
            self._wstep = partial(
                _jit_wavefront_step,
                width=self.width, height=self.height, pool=self.wf_pool,
            )

        # --- multi-device: spp-sharded wrapper around whichever driver
        # is engaged (each device renders a disjoint sample slice of
        # the full pixel set; one image psum per dispatch, over ICI) ---
        if self._mesh1d is not None:
            from ..parallel.distributed import make_spp_sharded_step

            _w, _h = self.width, self.height
            _interp = self.interpret
            if self.use_fused:
                _spd, _spl = self.spd, self._fspl
                _hl, _hints, _hw = (
                    self.camera.lens_r is not None, self._hints, self.hw_rng,
                )

                def _fin(tables, cam_vec, scene, params, xs2d, ys2d, rep2d,
                         sample_base, n_samples):
                    return sample_batch_fused(
                        tables, cam_vec, scene, params, _w, _h,
                        xs2d, ys2d, rep2d, sample_base, n_samples,
                        samples_per_dispatch=_spd, samples_per_lane=_spl,
                        has_lens=_hl, hints=_hints, hw_rng=_hw,
                        interpret=_interp,
                    )

                self._multi_step, _ = make_spp_sharded_step(self._mesh1d, _fin, {})
            elif self.use_mesh_fused:
                _pool, _spl = self.mf_pool, self.mf_spl
                _cw, _rw = self.mf_shade_width, self.mf_retire_width
                _iks = self.mf_inkernel
                _mxp = self.mf_mxu_prec
                _hl, _hints = self.camera.lens_r is not None, self._mhints

                def _min(tables, cam_vec, scene, cam, params, xs_tab, ys_tab,
                         sample_base, n_samples):
                    return _fm.wavefront_mesh_fused(
                        tables, cam_vec, scene, cam, params, _w, _h,
                        xs_tab, ys_tab, sample_base, n_samples,
                        pool=_pool, has_lens=_hl, hints=_hints, spl=_spl,
                        shade_width=_cw, retire_width=_rw,
                        inkernel_shade=_iks, mxu_prec=_mxp,
                        interpret=_interp,
                    )

                self._multi_step, _ = make_spp_sharded_step(self._mesh1d, _min, {})
            elif self.use_wavefront:
                _pool = self.wf_pool

                def _win(scene, cam, params, xs_tab, ys_tab, sample_base, n_samples):
                    return _wf.wavefront_batch(
                        scene, cam, params, xs_tab, ys_tab,
                        sample_base, n_samples, width=_w, height=_h, pool=_pool,
                    )

                self._multi_step, _ = make_spp_sharded_step(self._mesh1d, _win, {})

            # the plain integrator multi-device step is always built:
            # it backs the unfused driver AND the exact-tail path of
            # _render_plain for every driver
            def _pin(scene, cam, params, x_idx, y_idx, sample_base, n_samples):
                return sample_batch(
                    scene, cam, params, _w, _h, x_idx, y_idx,
                    sample_base, n_samples,
                )

            self._multi_plain_step, _ = make_spp_sharded_step(self._mesh1d, _pin, {})
            if not (self.use_fused or self.use_mesh_fused or self.use_wavefront):
                self._multi_step = self._multi_plain_step

    def _mesh_coverage(self) -> float:
        return estimate_mesh_coverage(
            self.scene, self.camera, self.width, self.height
        )

    def _render_plain(self, scene_dev, base: int, n: int) -> int:
        """Run n samples (exactly, unless the multi-device step
        truncates to a device multiple — the remainder re-enters via
        the render() loop and lands here single-device) through the
        plain integrator tile loop; accumulate into the target and
        return the number of samples actually rendered."""
        nd = self.n_devices
        n_pix = self.width * self.height
        use_multi = self._mesh1d is not None and n >= nd
        n_w = (n // nd) * nd if use_multi else n
        tile_sums = []
        for ti in range(self.n_tiles):
            if use_multi:
                out = self._multi_plain_step(
                    scene_dev, self.cam_arrays, self.params,
                    jnp.asarray(self._x_idx[ti]), jnp.asarray(self._y_idx[ti]),
                    jnp.int32(base), jnp.int32(n_w // nd),
                )
            else:
                out = self._step(
                    scene_dev,
                    self.cam_arrays,
                    self.params,
                    x_idx=jnp.asarray(self._x_idx[ti]),
                    y_idx=jnp.asarray(self._y_idx[ti]),
                    sample_base=jnp.int32(base),
                    n_samples=jnp.int32(n_w),
                )
            tile_sums.append(np.asarray(out))
        flat = np.concatenate(tile_sums, axis=0)
        if self._pad:
            flat = flat[:n_pix]
        res = np.empty((n_pix, 3), np.float32)
        res[self._perm] = flat
        self.target.add(res, n_w)
        return n_w

    def render(
        self,
        samples: Optional[int] = None,
        batch: Optional[int] = None,
        update_hook: Optional[Callable[[RenderTarget], None]] = None,
        progress: bool = True,
        async_hook: bool = True,
    ) -> np.ndarray:
        """Run `samples` MORE samples (sample ids continue at
        target.count, so in counter-RNG mode a checkpoint-resumed or
        incremental render is bit-exact — no RNG stream is ever reused;
        with hw_rng=True resume is only statistically equivalent, the
        hardware draws are not keyed by sample id); returns (H, W, 3)
        f32 mean image (row 0 = bottom). update_hook fires after every
        batch with the live target (the reference's per-sample preview
        push, draw_scene.rs:97-99); with async_hook (default) it runs
        on a writer thread against a snapshot, latest-wins, so PNG /
        checkpoint / preview IO never blocks the device between
        batches (the reference's mpsc decoupling, renderer.rs:44)."""
        info = self.scheme.render_info
        total = samples if samples is not None else info.samps_per_pix
        # the scheme's render_batch (gpu_render_batch) is PREVIEW
        # CADENCE: the reference dispatches per batch so the UI can
        # show the accumulating image (and to dodge its GPU watchdog —
        # our own watchdog cap below handles that independently). With
        # no update_hook attached there is nothing to show between
        # batches, and every extra dispatch pays the wavefront drain
        # tail (measured: biplane 64 spp at the scheme's batch=10 runs
        # 3.4 Mpaths/s vs 4.5 in one dispatch), so batching is only
        # honored when a hook wants the intermediate images.
        b = batch or (info.render_batch if update_hook is not None else total)
        b = max(1, min(b or total, total))
        adapt_cap = 0  # 0 = fixed dispatch size (non-mesh, env cap, hook)
        if self.scene.n_mesh_tris:
            # long single dispatches on mesh scenes can trip the TPU
            # runtime's watchdog (the reference had the same constraint
            # on consumer GPUs, README.md:280-285) — keep them short.
            # The wavefront driver gets a bigger budget: its drain tail
            # (max-path-length iterations at collapsing occupancy) is
            # paid once per dispatch, so more spp per dispatch is the
            # occupancy lever.
            # cap overridable for faster boxes / bigger watchdog budgets.
            # Mesh-heavy (dense-shade) scenes run ~1 Mpaths/s — a
            # 64-spp dispatch exceeds the ~60 s TPU runtime watchdog
            # (measured: the spaceship_r1 64-spp dispatch killed the
            # worker), so they get a smaller default.
            if self.use_mesh_fused and self.mf_shade_width >= self.mf_pool:
                default_cap = "16"
            elif self.use_wavefront or self.use_mesh_fused:
                default_cap = "64"
            else:
                default_cap = "2"
            cap = int(os.environ.get("RTPU_MAX_DISPATCH_SPP", default_cap))
            b = min(b, cap)
            # adaptive sizing (see adapt_dispatch_spp): grow past the
            # conservative static default while measured dispatches
            # stay well under the watchdog. An explicit
            # RTPU_MAX_DISPATCH_SPP (bench reproducibility), an
            # explicit batch argument, or a preview hook's batch
            # cadence disables it entirely.
            if ("RTPU_MAX_DISPATCH_SPP" not in os.environ
                    and update_hook is None and batch is None):
                adapt_cap = min(256, total)

        bar = None
        if progress:
            try:
                from tqdm import tqdm

                bar = tqdm(total=total, desc="samples", unit="spp")
            except Exception:
                bar = None
        from ..utils.profiling import Throughput

        meter = Throughput()

        hook = update_hook
        closer = None
        if update_hook is not None and async_hook:
            from ..utils.hooks import AsyncHook

            hook = AsyncHook(update_hook)
            closer = hook.close

        # upload the scene ONCE per Renderer (round 4): re-uploading
        # the texel pools every render() call cost seconds per call on
        # tunneled devices (measured: biplane 4.40 -> 3.02 Mpaths/s
        # when the upload rides inside the timed render)
        if self._scene_dev is None:
            self._scene_dev = jax.device_put(self.scene)
        scene_dev = self._scene_dev
        n_pix = self.width * self.height
        rendered = 0
        while rendered < total:
            n = min(b, total - rendered)
            t_disp = time.time()
            base = self.target.count  # sample ids continue across calls
            nd = self.n_devices
            # Each driver prefers the spp-sharded multi-device step, but
            # only when the chunk covers all devices; a remainder
            # smaller than the mesh (or the fused per-device unit) runs
            # the single-device step so render(samples=k) does exactly
            # k samples — never rounded up to a device multiple.
            if self.use_fused:
                unit = self.spd * nd
                if self._mesh1d is not None and n >= unit:
                    n_f = (n // unit) * unit
                    out = self._multi_step(
                        self._tables, self._cam_vec, scene_dev, self.params,
                        self._fxs, self._fys, self._frep,
                        jnp.int32(base), jnp.int32(n_f // nd),
                    )
                elif n >= self.spd:
                    n_f = (n // self.spd) * self.spd
                    out = self._fstep(
                        self._tables,
                        self._cam_vec,
                        scene_dev,
                        self.params,
                        xs2d=self._fxs,
                        ys2d=self._fys,
                        rep2d=self._frep,
                        sample_base=jnp.int32(base),
                        n_samples=jnp.int32(n_f),
                    )
                else:
                    # tail smaller than one packed dispatch: run EXACTLY
                    # n samples through the plain integrator tile loop
                    # (same per-(pixel, sample) counter streams) so
                    # render(samples=k) adds exactly k — never rounded
                    # up to samples_per_dispatch
                    out = None
                    n_f = self._render_plain(scene_dev, base, n)
                if out is not None:
                    res = np.empty((n_pix, 3), np.float32)
                    res[self._perm] = np.asarray(out)[:n_pix]
                    self.target.add(res, n_f)
                n = n_f
            elif self.use_mesh_fused:
                if self._mesh1d is not None and n >= nd:
                    n_f = (n // nd) * nd
                    out = self._multi_step(
                        self._mtables, self._mcam_vec, scene_dev,
                        self.cam_arrays, self.params, self._mxs, self._mys,
                        jnp.int32(base), jnp.int32(n_f // nd),
                    )
                else:
                    n_f = n
                    out = self._mstep(
                        self._mtables,
                        self._mcam_vec,
                        scene_dev,
                        self.cam_arrays,
                        self.params,
                        xs_tab=self._mxs,
                        ys_tab=self._mys,
                        sample_base=jnp.int32(base),
                        n_samples=jnp.int32(n_f),
                    )
                # hybrid accumulates by natural flat pixel id
                self.target.add(np.asarray(out), n_f)
                n = n_f
            elif self.use_wavefront:
                n_w = (n // nd) * nd if (self._mesh1d is not None and n >= nd) else n
                if self._mesh1d is not None and n >= nd:
                    out = self._multi_step(
                        scene_dev, self.cam_arrays, self.params,
                        self._wxs, self._wys,
                        jnp.int32(base), jnp.int32(n_w // nd),
                    )
                else:
                    out = self._wstep(
                        scene_dev,
                        self.cam_arrays,
                        self.params,
                        self._wxs,
                        self._wys,
                        sample_base=jnp.int32(base),
                        n_samples=jnp.int32(n_w),
                    )
                # wavefront accumulates by natural flat pixel id
                self.target.add(np.asarray(out), n_w)
                n = n_w
            else:
                n = self._render_plain(scene_dev, base, n)
            rendered += n
            if adapt_cap and n == b and rendered < total:
                # full-size dispatches inform the sizing (each driver
                # syncs through np.asarray above, so the wall time is
                # the dispatch time; the first dispatch's jit compile
                # only inflates it, which at worst delays one growth
                # step — conservative in the safe direction)
                b = adapt_dispatch_spp(b, time.time() - t_disp, adapt_cap)
            meter.add(n * n_pix)
            if bar is not None:
                bar.update(n)
                bar.set_postfix_str(f"{meter.mpaths_per_s:.1f} Mpaths/s")
            if hook is not None:
                hook(self.target)
        if bar is not None:
            bar.close()
        if closer is not None:
            closer()  # flush the final snapshot; re-raise hook errors
        return self.target.mean_image()
