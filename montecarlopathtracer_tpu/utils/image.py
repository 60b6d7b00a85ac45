"""PNG I/O — the framework's equivalent of the reference's OpenCV /
D3DX image paths (`cvSaveImage`, CUTracer.cu:394-395; `main.cpp:28`)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def save_png(path: str, rgb_u8: np.ndarray) -> None:
    """Write an H×W×3 uint8 RGB array as PNG, creating parent dirs."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    Image.fromarray(rgb_u8, mode="RGB").save(path)


def load_png(path: str) -> np.ndarray:
    """Read a PNG as H×W×3 uint8 RGB."""
    return np.asarray(Image.open(path).convert("RGB"))
