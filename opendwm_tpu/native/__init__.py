"""ctypes bindings for the native data-plane library (data_plane.cpp).

Compiled on first use with g++ (no pybind11 in this image); every entry
point has a pure-Python/numpy fallback so the framework works without a
toolchain. Use :func:`available` to check whether the native path loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "data_plane.cpp")
_LIB_PATH = os.path.join(_HERE, "libdata_plane.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-lz", "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.zip_scan_central_directory.restype = ctypes.c_int64
        lib.inflate_raw.restype = ctypes.c_int64
        lib.decode_lidar_bin.restype = ctypes.c_int64
        lib.voxelize_points.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Wrappers (native with numpy fallback)
# ---------------------------------------------------------------------------

def zip_scan_central_directory(data: bytes) -> list[dict]:
    """Parse a ZIP central directory into entry metadata records."""
    lib = _load()
    if lib is None:
        import io
        import zipfile

        zf = zipfile.ZipFile(io.BytesIO(data))
        return [
            {
                "name": zi.filename,
                "header_offset": zi.header_offset,
                "compress_type": zi.compress_type,
                "compress_size": zi.compress_size,
                "file_size": zi.file_size,
            }
            for zi in zf.infolist()
            if not zi.is_dir()
        ]
    max_entries = max(64, data.count(b"PK\x01\x02"))
    header_offsets = np.zeros(max_entries, np.int64)
    compress_types = np.zeros(max_entries, np.int32)
    compress_sizes = np.zeros(max_entries, np.int64)
    file_sizes = np.zeros(max_entries, np.int64)
    name_lens = np.zeros(max_entries, np.int32)
    name_buf = np.zeros(1 << 22, np.uint8)
    buf = np.frombuffer(data, np.uint8)
    n = lib.zip_scan_central_directory(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)), ctypes.c_int64(max_entries),
        header_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        compress_types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        compress_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        file_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        name_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(name_buf.size),
        name_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise ValueError(f"zip scan failed ({n})")
    out = []
    pos = 0
    for i in range(n):
        ln = int(name_lens[i])
        name = bytes(name_buf[pos: pos + ln]).decode("utf-8")
        pos += ln
        if name.endswith("/"):
            continue
        out.append({
            "name": name,
            "header_offset": int(header_offsets[i]),
            "compress_type": int(compress_types[i]),
            "compress_size": int(compress_sizes[i]),
            "file_size": int(file_sizes[i]),
        })
    return out


def inflate_raw(data: bytes, out_size: int) -> bytes:
    lib = _load()
    if lib is None:
        import zlib

        return zlib.decompress(data, -15)
    src = np.frombuffer(data, np.uint8)
    dst = np.zeros(out_size, np.uint8)
    n = lib.inflate_raw(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(out_size),
    )
    if n < 0:
        raise ValueError("inflate failed")
    return bytes(dst[:n])


def decode_lidar_bin(
    raw: bytes,
    stride: int = 5,
    max_points: int = 32768,
    pc_range: Optional[tuple] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """float32 records → ((max_points, 3) xyz, (max_points,) bool mask)."""
    lib = _load()
    if lib is None:
        pts = np.frombuffer(raw, np.float32).reshape(-1, stride)[:, :3]
        if pc_range is not None:
            lo = np.asarray(pc_range[:3])
            hi = np.asarray(pc_range[3:])
            keep = np.all((pts >= lo) & (pts <= hi), -1)
            pts = pts[keep]
        out = np.zeros((max_points, 3), np.float32)
        mask = np.zeros(max_points, bool)
        n = min(len(pts), max_points)
        out[:n] = pts[:n]
        mask[:n] = True
        return out, mask
    buf = np.frombuffer(raw, np.uint8)
    out = np.zeros((max_points, 3), np.float32)
    mask = np.zeros(max_points, np.uint8)
    r = pc_range or (0, 0, 0, 0, 0, 0)
    lib.decode_lidar_bin(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(raw)), ctypes.c_int32(stride),
        ctypes.c_float(r[0]), ctypes.c_float(r[3]),
        ctypes.c_float(r[1]), ctypes.c_float(r[4]),
        ctypes.c_float(r[2]), ctypes.c_float(r[5]),
        ctypes.c_int32(1 if pc_range is not None else 0),
        ctypes.c_int64(max_points),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, mask.astype(bool)


def voxelize_points_host(
    points: np.ndarray, mask: Optional[np.ndarray],
    x_min: float, y_min: float, z_min: float,
    step: float, z_step: float,
    depth: int, height: int, width: int,
) -> np.ndarray:
    lib = _load()
    grid = np.zeros((depth, height, width), np.float32)
    if lib is None:
        pts = points if mask is None else points[mask]
        iw = np.floor((pts[:, 0] - x_min) / step).astype(int)
        ih = np.floor((pts[:, 1] - y_min) / step).astype(int)
        idp = np.floor((pts[:, 2] - z_min) / z_step).astype(int)
        keep = (
            (iw >= 0) & (iw < width) & (ih >= 0) & (ih < height)
            & (idp >= 0) & (idp < depth)
        )
        grid[idp[keep], ih[keep], iw[keep]] = 1.0
        return grid
    pts = np.ascontiguousarray(points, np.float32)
    m = (
        np.ascontiguousarray(mask, np.uint8)
        if mask is not None else None
    )
    lib.voxelize_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if m is not None else None,
        ctypes.c_int64(len(pts)),
        ctypes.c_float(x_min), ctypes.c_float(y_min), ctypes.c_float(z_min),
        ctypes.c_float(step), ctypes.c_float(z_step),
        ctypes.c_int64(depth), ctypes.c_int64(height),
        ctypes.c_int64(width),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return grid
