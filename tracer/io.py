"""Image export — PNG (8-bit display) and PFM/NPZ (float radiance).

The reference has **no** image export (screenshots only, SURVEY.md section
5.4); this fills that gap. PNG via PIL; PFM is the classic float format
readable by HDR tools; NPZ keeps exact float32 for diffing.
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3) float in [0, 1] (already display-transformed)."""
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr, "RGB").save(path)


def write_pfm(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3) float32 linear radiance. PFM stores bottom-up."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        assert header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(
            f.read(), "<f4" if scale < 0 else ">f4"
        ).reshape(h, w, 3)
    return np.flipud(data).copy()


def write_npz(path: str, img: np.ndarray, **extra) -> None:
    np.savez_compressed(path, image=np.asarray(img, np.float32), **extra)
