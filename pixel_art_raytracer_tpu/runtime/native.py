"""ctypes bindings for the native host library (native/par_native.cpp).

Provides the independently written C++ oracle renderer and the fast GIF
encoder.  The library is built on demand with ``make`` (g++); every entry
point has a pure-Python fallback elsewhere in the package, so the framework
works without a toolchain — the native paths are used when available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..scene import Scene, Light

_HERE = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libpar_native.so"
_SRC_DIR = _HERE.parent.parent / "native"

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


class _ParConfig(ctypes.Structure):
    _fields_ = [
        ("view_w", ctypes.c_int32), ("view_h", ctypes.c_int32),
        ("view_l", ctypes.c_int32), ("bin_size", ctypes.c_int32),
        ("bin_cap", ctypes.c_int32), ("sprite_w", ctypes.c_int32),
        ("sprite_h", ctypes.c_int32), ("ambient", ctypes.c_float),
        ("early_exit", ctypes.c_int32),
    ]

    @classmethod
    def from_config(cls, cfg: RenderConfig) -> "_ParConfig":
        return cls(cfg.view_width, cfg.view_height, cfg.view_length,
                   cfg.bin_size, cfg.bin_capacity, cfg.sprite_width,
                   cfg.sprite_height, cfg.ambient, int(cfg.early_exit))


def build_library(force: bool = False) -> pathlib.Path | None:
    """Compile libpar_native.so with make; returns its path or None."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-s"], cwd=_SRC_DIR, check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return _LIB_PATH if _LIB_PATH.exists() else None


_lib = None


def load_library():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))

    lib.par_build_bins.argtypes = [
        ctypes.POINTER(_ParConfig), ctypes.c_int32, _i32p, _i32p, _i32p, _i32p]
    lib.par_build_bins.restype = None

    lib.par_trace_pixels.argtypes = [
        ctypes.POINTER(_ParConfig), ctypes.c_int32, _i32p, _i32p, _i32p,
        _i32p, _i32p, _f32p, _u8p, _i32p, _i32p, _u8p,
        _f32p, _u8p, _i32p, _i32p, _i32p]
    lib.par_trace_pixels.restype = None

    lib.par_shade.argtypes = [
        ctypes.POINTER(_ParConfig), _i32p, _i32p, _i32p, _i32p,
        _f32p, _u8p, _i32p, _i32p, _i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p]
    lib.par_shade.restype = None

    lib.par_gif_write.argtypes = [
        ctypes.c_char_p, _u8p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.par_gif_write.restype = ctypes.c_int32

    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


# ---------------------------------------------------------------------------
# C++ oracle renderer wrappers.
# ---------------------------------------------------------------------------

def cpp_build_bins(scene: Scene, config: RenderConfig = DEFAULT_CONFIG):
    lib = load_library()
    assert lib is not None, "native library unavailable"
    cfg = _ParConfig.from_config(config)
    bins_ent = np.empty((config.hash_volume, config.bin_capacity), np.int32)
    counts = np.empty(config.hash_volume, np.int32)
    lib.par_build_bins(ctypes.byref(cfg), scene.n_entities,
                       np.ascontiguousarray(scene.pos, np.int32),
                       np.ascontiguousarray(scene.ext, np.int32),
                       bins_ent, counts)
    return bins_ent, counts


def cpp_trace_pixels(scene: Scene, bins_ent, counts,
                     config: RenderConfig = DEFAULT_CONFIG):
    from ..oracle.cpu_renderer import GBuffer

    lib = load_library()
    assert lib is not None, "native library unavailable"
    cfg = _ParConfig.from_config(config)
    H, W = config.view_height, config.view_width
    normal = np.empty((H, W, 3), np.float32)
    color = np.empty((H, W, 4), np.uint8)
    y = np.empty((H, W), np.int32)
    z = np.empty((H, W), np.int32)
    ent = np.empty((H, W), np.int32)
    bg = np.ascontiguousarray(config.background, np.uint8)
    lib.par_trace_pixels(
        ctypes.byref(cfg), scene.n_entities,
        np.ascontiguousarray(scene.pos, np.int32),
        np.ascontiguousarray(scene.ext, np.int32),
        np.ascontiguousarray(scene.sprite_id, np.int32),
        np.ascontiguousarray(scene.atlas.color, np.int32),
        np.ascontiguousarray(scene.atlas.depth, np.int32),
        np.ascontiguousarray(scene.atlas.normal, np.float32),
        np.ascontiguousarray(config.palette_array, np.uint8),
        np.ascontiguousarray(bins_ent, np.int32),
        np.ascontiguousarray(counts, np.int32),
        bg, normal, color, y, z, ent)
    return GBuffer(normal=normal, color=color, y=y, z=z, entity_index=ent)


def cpp_shade(scene: Scene, gbuf, bins_ent, counts, light: Light,
              config: RenderConfig = DEFAULT_CONFIG):
    lib = load_library()
    assert lib is not None, "native library unavailable"
    cfg = _ParConfig.from_config(config)
    H, W = config.view_height, config.view_width
    out = np.empty((H, W, 3), np.uint8)
    lib.par_shade(
        ctypes.byref(cfg),
        np.ascontiguousarray(scene.pos, np.int32),
        np.ascontiguousarray(scene.ext, np.int32),
        np.ascontiguousarray(bins_ent, np.int32),
        np.ascontiguousarray(counts, np.int32),
        np.ascontiguousarray(gbuf.normal, np.float32),
        np.ascontiguousarray(gbuf.color, np.uint8),
        np.ascontiguousarray(gbuf.y, np.int32),
        np.ascontiguousarray(gbuf.z, np.int32),
        np.ascontiguousarray(gbuf.entity_index, np.int32),
        light.x, light.y, light.z, out)
    return out


def cpp_render_frame(scene: Scene, light: Light,
                     config: RenderConfig = DEFAULT_CONFIG):
    bins_ent, counts = cpp_build_bins(scene, config)
    gbuf = cpp_trace_pixels(scene, bins_ent, counts, config)
    img = cpp_shade(scene, gbuf, bins_ent, counts, light, config)
    return img, gbuf


def gif_write_native(path: str, frames_idx: np.ndarray, palette: np.ndarray,
                     delay_cs: int = 4, loop: int = 0) -> bool:
    """Encode palette-indexed frames to an animated GIF via the native LZW
    encoder.  frames_idx: (F, H, W) uint8, palette: (P, 3) uint8."""
    lib = load_library()
    if lib is None:
        return False
    f, h, w = frames_idx.shape
    rc = lib.par_gif_write(str(path).encode(),
                           np.ascontiguousarray(frames_idx, np.uint8),
                           f, w, h,
                           np.ascontiguousarray(palette, np.uint8),
                           palette.shape[0], delay_cs, loop)
    return rc == 0
