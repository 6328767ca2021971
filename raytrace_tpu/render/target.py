"""Render target: f32 radiance accumulator + sample count.

The reference keeps a running mean updated every sample/batch
(draw_scene.rs:81-83, trace.wgsl:317-323) in an RGBA8-converted shared
buffer; we keep the exact f32 SUM and the count instead (numerically
identical at readout, and it makes checkpoint/resume exact — the
reference loses its f32 accumulator, SURVEY.md §5)."""
from __future__ import annotations

import numpy as np


class RenderTarget:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.acc = np.zeros((height * width, 3), np.float32)
        self.count = 0

    def add(self, radiance_sum: np.ndarray, n_samples: int):
        self.acc += radiance_sum
        self.count += n_samples

    def mean_image(self) -> np.ndarray:
        """(H, W, 3) f32 mean radiance; row 0 = bottom scanline."""
        c = max(self.count, 1)
        return (self.acc / c).reshape(self.height, self.width, 3)

    def to_u8_rgba(self) -> np.ndarray:
        """Clamp[0,1] -> u8 RGBA exactly like rgb_f_to_u8
        (draw_scene.rs:104-109): (clamp(c,0,1)*255 + 0.5) truncated."""
        img = self.mean_image()
        u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        rgba = np.concatenate(
            [u8, np.full(u8.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
        return rgba

    def chunk_to_pix(self, idx: int):
        """Flat index -> (x, y) (target.rs:9-15)."""
        return idx % self.width, idx // self.width
