"""Validate the hardware-PRNG fused-kernel mode on the real TPU.

Renders the bench walled scene (1200x600) with the counter RNG and the
hardware PRNG at identical spp and compares per-channel image means
(must agree within Monte-Carlo noise) and throughput. interpret mode
cannot test this: pltpu.prng_random_bits is a zeros-stub there.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from __graft_entry__ import _inline_walled_scheme
    from raytrace_tpu.render.renderer import Renderer

    W, H = 1200, 600
    spd = int(os.environ.get("BENCH_SPD", "1024"))
    scheme = _inline_walled_scheme(W, H, assured=5)
    scheme.render_info.width, scheme.render_info.height = W, H

    out = {}
    for name, hw in (("counter", False), ("hw", True)):
        r = Renderer(scheme, samples_per_dispatch=spd, hw_rng=hw)
        r.render(samples=spd, batch=spd, progress=False)  # compile+warm
        t0 = time.time()
        img = r.render(samples=spd, batch=spd, progress=False)
        dt = time.time() - t0
        out[name] = dict(
            mean=[round(float(m), 5) for m in np.asarray(img).mean((0, 1))],
            mpaths_s=round(W * H * spd / dt / 1e6, 1),
        )
    m0 = np.array(out["counter"]["mean"])
    m1 = np.array(out["hw"]["mean"])
    out["max_abs_mean_diff"] = round(float(np.abs(m0 - m1).max()), 5)
    out["ok"] = bool(np.abs(m0 - m1).max() < 0.01)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
