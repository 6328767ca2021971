"""PNG output with the reference's vertical flip.

The reference's pixel row 0 is the BOTTOM of the image and every PNG is
written flipped (ui_util.rs:46-49); we keep identical file output."""
from __future__ import annotations

import numpy as np
from PIL import Image


def save_png(path: str, rgba_or_rgb: np.ndarray):
    """rgba_or_rgb: (H, W, 3|4) u8 with row 0 = bottom; flipped on save."""
    arr = rgba_or_rgb[::-1]
    Image.fromarray(arr).save(path, format="PNG")


def encode_png(rgba_or_rgb: np.ndarray) -> bytes:
    """save_png to memory (same vertical flip); used by the live
    preview server."""
    import io

    buf = io.BytesIO()
    Image.fromarray(rgba_or_rgb[::-1]).save(buf, format="PNG")
    return buf.getvalue()


def load_png(path: str) -> np.ndarray:
    """Inverse of save_png: returns (H, W, C) u8 with row 0 = bottom."""
    arr = np.asarray(Image.open(path))
    return arr[::-1]
