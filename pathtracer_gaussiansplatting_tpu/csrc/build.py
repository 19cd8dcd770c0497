"""Lazy builder/loader for the native preprocessing library (ctypes).

Compiles csrc/native.cpp once into csrc/_native_<tag>.so with g++ -O3 and
caches it; every entry point has a pure-numpy fallback so the framework runs
on machines without a toolchain (the fallbacks are also the test oracles).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_tag() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def _compile() -> str | None:
    tag = _source_tag()
    so_path = os.path.join(_DIR, f"_native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", so_path + ".tmp", _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception as e:  # no compiler / failure -> numpy fallback
        print(f"[gspt.native] build failed ({e}); using numpy fallbacks",
              file=sys.stderr)
        return None


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        fp = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.morton3d.argtypes = [fp, i64, fp, fp, u32p]
        lib.radix_argsort_u32.argtypes = [u32p, i64, i32p]
        lib.grid_bin.argtypes = [fp, fp, i64, fp, fp, i32, i32, i32, i32,
                                 i32p, i32p]
        lib.grid_bin_aniso.argtypes = [fp, fp, fp, i64, fp, fp, i32, i32,
                                       i32, i32, i32p, i32p]
        lib.chebyshev_dist.argtypes = [u8p, i32, i32, i32, i32, u8p]
        lib.format_ply_rows.argtypes = [fp, fp, u8p, i64,
                                        ctypes.c_char_p, i64]
        lib.format_ply_rows.restype = i64
        _LIB = lib
        return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def morton3d(points, lo=None, hi=None) -> np.ndarray:
    """30-bit Morton codes of (N, 3) float32 points within [lo, hi]."""
    points = np.ascontiguousarray(points, np.float32)
    lo = points.min(0) if lo is None else np.asarray(lo, np.float32)
    hi = points.max(0) if hi is None else np.asarray(hi, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(points), np.uint32)
        lib.morton3d(_fptr(points), len(points), _fptr(lo), _fptr(hi),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out
    from pathtracer_gaussiansplatting_tpu.ops.morton import morton3d as m3

    ext = np.maximum(hi - lo, 1e-12)
    q = (points - lo) / ext
    return m3(q[:, 0], q[:, 1], q[:, 2]).astype(np.uint32)


def radix_argsort(keys) -> np.ndarray:
    """Stable ascending argsort of uint32 keys."""
    keys = np.ascontiguousarray(keys, np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(keys), np.int32)
        lib.radix_argsort_u32(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(keys), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    return np.argsort(keys, kind="stable").astype(np.int32)


def grid_bin(centers, radii, grid_dims, lo=None, hi=None,
             max_per_cell: int = 64):
    """Bin bounding spheres into a (gx, gy, gz) uniform grid.

    Returns (cell_indices (gz*gy*gx, max_per_cell) int32 padded with -1,
             cell_counts (gz*gy*gx,) int32 untruncated,
             lo, hi (3,) float32 used bounds).
    """
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    n = len(centers)
    lo = (centers - radii[:, None]).min(0) if lo is None else np.asarray(lo)
    hi = (centers + radii[:, None]).max(0) if hi is None else np.asarray(hi)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    gx, gy, gz = (int(d) for d in grid_dims)
    n_cells = gx * gy * gz
    lib = get_lib()
    if lib is not None:
        idx = np.empty((n_cells, max_per_cell), np.int32)
        cnt = np.empty(n_cells, np.int32)
        lib.grid_bin(_fptr(centers), _fptr(radii), n, _fptr(lo), _fptr(hi),
                     gx, gy, gz, max_per_cell,
                     idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return idx, cnt, lo, hi
    # numpy fallback (oracle)
    ext = np.maximum(hi - lo, 1e-12)
    dims = np.array([gx, gy, gz])
    c0 = np.clip(np.floor((centers - radii[:, None] - lo) / ext * dims),
                 0, dims - 1).astype(np.int64)
    c1 = np.clip(np.floor((centers + radii[:, None] - lo) / ext * dims),
                 0, dims - 1).astype(np.int64)
    idx = np.full((n_cells, max_per_cell), -1, np.int32)
    cnt = np.zeros(n_cells, np.int32)
    for i in range(n):
        for z in range(c0[i, 2], c1[i, 2] + 1):
            for y in range(c0[i, 1], c1[i, 1] + 1):
                for x in range(c0[i, 0], c1[i, 0] + 1):
                    cell = (z * gy + y) * gx + x
                    if cnt[cell] < max_per_cell:
                        idx[cell, cnt[cell]] = i
                    cnt[cell] += 1
    return idx, cnt, lo, hi


def grid_bin_aniso(centers, extents, priority, grid_dims, lo, hi,
                   max_per_cell: int = 16):
    """Bin axis-aligned boxes (center +- per-axis extent) into a grid.

    When a cell overflows ``max_per_cell``, the lowest-``priority`` entry
    is evicted (keep the strongest contributors). Returns
    (cell_indices (gz*gy*gx, max_per_cell) int32 padded with -1,
     cell_counts (gz*gy*gx,) int32 untruncated).
    """
    centers = np.ascontiguousarray(centers, np.float32)
    extents = np.ascontiguousarray(extents, np.float32)
    priority = np.ascontiguousarray(priority, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    gx, gy, gz = (int(d) for d in grid_dims)
    n_cells = gx * gy * gz
    n = len(centers)
    lib = get_lib()
    if lib is not None:
        idx = np.empty((n_cells, max_per_cell), np.int32)
        cnt = np.empty(n_cells, np.int32)
        lib.grid_bin_aniso(
            _fptr(centers), _fptr(extents), _fptr(priority), n,
            _fptr(lo), _fptr(hi), gx, gy, gz, max_per_cell,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return idx, cnt
    # numpy fallback (oracle)
    ext = np.maximum(hi - lo, 1e-12)
    dims = np.array([gx, gy, gz])
    c0 = np.clip(np.floor((centers - extents - lo) / ext * dims),
                 0, dims - 1).astype(np.int64)
    c1 = np.clip(np.floor((centers + extents - lo) / ext * dims),
                 0, dims - 1).astype(np.int64)
    idx = np.full((n_cells, max_per_cell), -1, np.int32)
    prio = np.zeros((n_cells, max_per_cell), np.float32)
    cnt = np.zeros(n_cells, np.int32)
    for i in range(n):
        for z in range(c0[i, 2], c1[i, 2] + 1):
            for y in range(c0[i, 1], c1[i, 1] + 1):
                for x in range(c0[i, 0], c1[i, 0] + 1):
                    cell = (z * gy + y) * gx + x
                    c = cnt[cell]
                    cnt[cell] = c + 1
                    if c < max_per_cell:
                        idx[cell, c] = i
                        prio[cell, c] = priority[i]
                    else:
                        s = int(np.argmin(prio[cell]))
                        if priority[i] > prio[cell, s]:
                            idx[cell, s] = i
                            prio[cell, s] = priority[i]
    return idx, cnt


def chebyshev_dist(occupied, grid_dims, cap: int = 32) -> np.ndarray:
    """Exact chessboard distance to the nearest occupied cell (<= cap).

    occupied: (gz*gy*gx,) bool/uint8 in z-major linear order (matching
    grid_bin). Returns (gz*gy*gx,) uint8, 0 at occupied cells.
    """
    gx, gy, gz = (int(d) for d in grid_dims)
    occ = np.ascontiguousarray(
        np.asarray(occupied, np.uint8).reshape(gz * gy * gx))
    lib = get_lib()
    if lib is not None:
        out = np.empty(gz * gy * gx, np.uint8)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.chebyshev_dist(occ.ctypes.data_as(u8), gx, gy, gz, cap,
                           out.ctypes.data_as(u8))
        return out
    # numpy fallback: iterative 26-neighbor dilation (cap passes)
    occ3 = occ.reshape(gz, gy, gx).astype(bool)
    dist = np.where(occ3, 0, cap).astype(np.int32)
    frontier = occ3
    for step in range(1, cap):
        if not frontier.any():
            break
        grown = np.zeros_like(frontier)
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sl = grown[max(dz, 0) or None:gz + min(dz, 0) or None,
                               max(dy, 0) or None:gy + min(dy, 0) or None,
                               max(dx, 0) or None:gx + min(dx, 0) or None]
                    src = frontier[max(-dz, 0) or None:
                                   gz + min(-dz, 0) or None,
                                   max(-dy, 0) or None:
                                   gy + min(-dy, 0) or None,
                                   max(-dx, 0) or None:
                                   gx + min(-dx, 0) or None]
                    np.logical_or(sl, src, out=sl)
        newly = grown & (dist > step)
        dist[newly] = step
        frontier = grown
    return dist.astype(np.uint8).reshape(-1)


def format_ply_rows(pos, nrm, rgb) -> str:
    """Format point-cloud PLY body rows (fast path for 1M-point exports)."""
    pos = np.ascontiguousarray(pos, np.float32)
    nrm = np.ascontiguousarray(nrm, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    n = len(pos)
    lib = get_lib()
    if lib is not None:
        cap = max(1024, n * 120)
        buf = ctypes.create_string_buffer(cap)
        written = lib.format_ply_rows(
            _fptr(pos), _fptr(nrm),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, buf, cap)
        if written >= 0:
            return buf.raw[:written].decode("ascii")
    lines = []
    for p, m, c in zip(pos, nrm, rgb):
        lines.append(f"{p[0]:g} {p[1]:g} {p[2]:g} {m[0]:g} {m[1]:g} {m[2]:g} "
                     f"{c[0]} {c[1]} {c[2]}\n")
    return "".join(lines)
