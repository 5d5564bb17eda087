"""Minimal PFM (portable float map) reader — the format FlyingThings uses for
object-index masks. Standard format: header 'PF'/'Pf', dims, scale (sign =
endianness), rows bottom-up."""

from __future__ import annotations

import re

import numpy as np


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if channels == 3 else (height, width)
    return np.flipud(data.reshape(shape)).copy()


def read_image_or_pfm(path: str) -> np.ndarray:
    if path.lower().endswith(".pfm"):
        data = read_pfm(path)
        return data[:, :, :3] if data.ndim == 3 else data
    import imageio.v2 as imageio
    return imageio.imread(path)
