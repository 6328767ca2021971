"""Exact render resume: persist the f32 accumulator + sample count.

The reference can only 'stop whenever satisfied' (the running-mean PNG
is always valid) but loses its f32 accumulator on exit
(SURVEY.md §5 checkpoint/resume). We save (accumulator sum, count,
width, height) so a render resumes bit-exactly — the RNG needs no
state because streams are derived from (pixel, sample_index)."""
from __future__ import annotations

import numpy as np


def save(path: str, target) -> None:
    np.savez_compressed(
        path,
        acc=target.acc,
        count=np.int64(target.count),
        width=np.int64(target.width),
        height=np.int64(target.height),
    )


def load(path: str):
    from ..render.target import RenderTarget

    z = np.load(path)
    t = RenderTarget(int(z["width"]), int(z["height"]))
    t.acc = z["acc"].astype(np.float32)
    t.count = int(z["count"])
    return t
