"""Loader + wrappers for ``native/libpipshost.so`` with numpy fallbacks."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpipshost.so"))

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.isfile(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.pips_decode_pfm.argtypes = [u8p, ctypes.c_int64, f32p, i32p, i32p, i32p]
        lib.pips_decode_pfm.restype = ctypes.c_int
        lib.pips_composite.argtypes = [f32p, f32p, f32p,
                                       ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.pips_resize_bilinear.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                             ctypes.c_int32, f32p,
                                             ctypes.c_int32, ctypes.c_int32]
        lib.pips_chain_step.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                        f32p, ctypes.c_int64]
        if hasattr(lib, "pips_mark_covered_frame"):  # native version >= 2
            lib.pips_mark_covered_frame.argtypes = [
                u8p, f32p, i32p, f32p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64]
            lib.pips_visibility_frame.argtypes = [
                f32p, f32p, f32p, u8p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64]
        if hasattr(lib, "pips_mark_in_rects"):  # native version >= 3
            lib.pips_mark_in_rects.argtypes = [
                f32p, i32p, ctypes.c_int32, f32p, ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def ensure_built(force: bool = False) -> bool:
    """Compile the library if missing (g++ required). Returns availability."""
    global _load_attempted
    if os.path.isfile(_SO_PATH) and not force:
        return _try_load() is not None
    script = os.path.join(_NATIVE_DIR, "build.sh")
    try:
        subprocess.run(["sh", script], check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError) as e:
        print(f"native build failed ({e}); using numpy fallbacks")
        return False
    _load_attempted = False
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_pfm(data: bytes) -> np.ndarray:
    """PFM bytes -> (H, W[, 3]) float32 (top-down rows)."""
    lib = _try_load()
    if lib is None:
        from pips_tpu.data.pfm import read_pfm
        import io
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".pfm", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            return read_pfm(path).astype(np.float32)
        finally:
            os.unlink(path)

    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    u8p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.pips_decode_pfm(u8p, len(data), None, ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"invalid PFM (code {rc})")
    out = np.empty((h.value, w.value, c.value), np.float32)
    rc = lib.pips_decode_pfm(u8p, len(data), _f32p(out), ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"PFM decode failed (code {rc})")
    return out[..., 0] if c.value == 1 else out


def decode_pfm_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_pfm(f.read())


def composite(rgb: np.ndarray, alt: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """In-place ``rgb = rgb*(1-mask) + alt*mask``. rgb/alt: (S, H, W, 3)
    float32 contiguous; mask: (S, H, W)."""
    lib = _try_load()
    if lib is None:
        rgb *= (1.0 - mask[..., None])
        rgb += alt * mask[..., None]
        return rgb
    S, H, W, _ = rgb.shape
    assert rgb.flags.c_contiguous and alt.flags.c_contiguous and mask.flags.c_contiguous
    lib.pips_composite(_f32p(rgb), _f32p(alt), _f32p(mask), S, H, W)
    return rgb


def resize_bilinear(src: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(H, W, C) float32 -> (H2, W2, C), half-pixel bilinear (cv2 semantics)."""
    lib = _try_load()
    H2, W2 = out_hw
    if lib is None:
        try:
            import cv2
            return cv2.resize(src, (W2, H2), interpolation=cv2.INTER_LINEAR)
        except ImportError:
            import jax.image
            return np.asarray(jax.image.resize(src, (H2, W2, src.shape[2]), "linear"))
    src = np.ascontiguousarray(src, np.float32)
    H, W, C = src.shape
    dst = np.empty((H2, W2, C), np.float32)
    lib.pips_resize_bilinear(_f32p(src), H, W, C, _f32p(dst), H2, W2)
    return dst


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _point_passes_lib():
    lib = _try_load()
    return lib if lib is not None and hasattr(lib, "pips_mark_covered_frame") \
        else None


def mark_in_rects(trajs_s: np.ndarray, rects: np.ndarray,
                  vis_s: np.ndarray) -> bool:
    """Zero vis_s (N,) where the float point trajs_s (N, 2) lies in any
    half-open integer rect (x0, x1, y0, y1) of rects (R, 4) int32.
    Returns False when the native library lacks the entry point (caller
    falls back); arrays C-contiguous."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "pips_mark_in_rects"):
        return False
    assert trajs_s.flags.c_contiguous and vis_s.flags.c_contiguous
    rects = np.ascontiguousarray(rects, np.int32)
    lib.pips_mark_in_rects(_f32p(trajs_s),
                           rects.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int32)),
                           rects.shape[0], _f32p(vis_s), trajs_s.shape[0])
    return True


def mark_covered_frame(painter: np.ndarray, trajs_s: np.ndarray,
                       birth: np.ndarray, vis_s: np.ndarray) -> None:
    """Zero vis_s (N,) where painter (H, W) uint8 at the point's rounded,
    in-bounds pixel holds a layer newer than birth (N,) int32. In place;
    all arrays C-contiguous."""
    lib = _point_passes_lib()
    H, W = painter.shape
    if lib is None or painter.dtype != np.uint8:
        xy = trajs_s.round().astype(np.int32)
        xcl = xy[:, 0].clip(0, W - 1)
        ycl = xy[:, 1].clip(0, H - 1)
        inb = ((xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
               & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1))
        vis_s[(painter[ycl, xcl] > birth) & inb] = 0
        return
    assert painter.flags.c_contiguous and trajs_s.flags.c_contiguous
    lib.pips_mark_covered_frame(_u8p(painter), _f32p(trajs_s),
                                birth.ctypes.data_as(
                                    ctypes.POINTER(ctypes.c_int32)),
                                _f32p(vis_s), H, W, trajs_s.shape[0])


def visibility_frame(trajs_s: np.ndarray, occ: np.ndarray, vis_s: np.ndarray,
                     inb_f_s: np.ndarray) -> None:
    """One frame of post-aug visibility bookkeeping: zero vis_s where the
    point sits on an occ==255 padding pixel (rounded, in-bounds) or is out
    of bounds in float coords; write the float in-bounds mask to inb_f_s
    (N,) uint8. In place; all arrays C-contiguous float32/uint8."""
    lib = _point_passes_lib()
    H, W = occ.shape
    if lib is None:
        x, y = trajs_s[:, 0], trajs_s[:, 1]
        xy = trajs_s.round().astype(np.int32)
        xcl = xy[:, 0].clip(0, W - 1)
        ycl = xy[:, 1].clip(0, H - 1)
        inb_r = ((xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
                 & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1))
        inf = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        vis_s[((occ[ycl, xcl] == 255) & inb_r) | ~inf] = 0
        inb_f_s[:] = inf
        return
    assert (trajs_s.flags.c_contiguous and occ.flags.c_contiguous
            and vis_s.flags.c_contiguous)
    lib.pips_visibility_frame(_f32p(trajs_s), _f32p(occ), _f32p(vis_s),
                              _u8p(inb_f_s), H, W, trajs_s.shape[0])


def chain_step(flow: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """One forward-flow chaining step, in place. flow: (H, W, 2) float32;
    coords: (N, 2) float32 contiguous."""
    lib = _try_load()
    if lib is None:
        H, W, _ = flow.shape
        xi = np.clip(np.round(coords[:, 0]).astype(np.int64), 0, W - 1)
        yi = np.clip(np.round(coords[:, 1]).astype(np.int64), 0, H - 1)
        coords += flow[yi, xi]
        return coords
    flow = np.ascontiguousarray(flow, np.float32)
    assert coords.flags.c_contiguous and coords.dtype == np.float32
    H, W, _ = flow.shape
    lib.pips_chain_step(_f32p(flow), H, W, _f32p(coords), coords.shape[0])
    return coords
