"""Native (C++) input-pipeline core: the tpak packed-frame reader.

Builds ``libtpak.so`` from tpak.cpp on first use (g++, cached next to
the source); degrades gracefully when no compiler is available — the
pure-Python disk/lmdb paths always work.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, 'tpak.cpp')
_SO = osp.join(_DIR, 'libtpak.so')

_lib = None


def _build() -> str:
    if osp.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-pthread', '-std=c++17',
           _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    lib = ctypes.CDLL(so)
    lib.tpak_open.restype = ctypes.c_void_p
    lib.tpak_open.argtypes = [ctypes.c_char_p]
    lib.tpak_close.argtypes = [ctypes.c_void_p]
    lib.tpak_num_clips.restype = ctypes.c_int64
    lib.tpak_num_clips.argtypes = [ctypes.c_void_p]
    lib.tpak_clip_frames.restype = ctypes.c_int64
    lib.tpak_clip_frames.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.tpak_clip_shape.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)
    ]
    lib.tpak_clip_name.restype = ctypes.c_int
    lib.tpak_clip_name.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_int64]
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    lib.tpak_read_windows.restype = ctypes.c_int
    lib.tpak_read_windows.argtypes = [
        ctypes.c_void_p, i64p, i64p, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
        ctypes.c_int
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


class TpakReader:
    """mmap-backed packed-frame dataset reader."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._handle = self._lib.tpak_open(path.encode())
        if not self._handle:
            raise IOError(f'cannot open tpak file: {path}')
        self.num_clips = int(self._lib.tpak_num_clips(self._handle))
        self.clip_names = []
        self.clip_frames = []
        self.clip_shapes = []
        buf = ctypes.create_string_buffer(512)
        for i in range(self.num_clips):
            self._lib.tpak_clip_name(self._handle, i, buf, 512)
            self.clip_names.append(buf.value.decode())
            self.clip_frames.append(
                int(self._lib.tpak_clip_frames(self._handle, i)))
            h = ctypes.c_int64()
            w = ctypes.c_int64()
            c = ctypes.c_int64()
            self._lib.tpak_clip_shape(self._handle, i, ctypes.byref(h),
                                      ctypes.byref(w), ctypes.byref(c))
            self.clip_shapes.append((h.value, w.value, c.value))
        self.name_to_idx = {n: i for i, n in enumerate(self.clip_names)}

    def read_windows(self, clip_idx, start_frame, interval, y0, x0,
                     crop_h: int, crop_w: int, num_frames: int,
                     n_threads: int = 8) -> np.ndarray:
        """Assemble (B, T, crop_h, crop_w, C) uint8 temporal-window
        crops with the native thread pool. Frame indices are clamped to
        the clip range (replicate padding)."""
        clip_idx = np.ascontiguousarray(clip_idx, np.int64)
        start_frame = np.ascontiguousarray(start_frame, np.int64)
        interval = np.ascontiguousarray(interval, np.int64)
        y0 = np.ascontiguousarray(y0, np.int64)
        x0 = np.ascontiguousarray(x0, np.int64)
        batch = clip_idx.shape[0]
        c = self.clip_shapes[int(clip_idx[0])][2]
        out = np.empty((batch, num_frames, crop_h, crop_w, c), np.uint8)
        status = self._lib.tpak_read_windows(
            self._handle, clip_idx, start_frame, interval, y0, x0,
            crop_h, crop_w, num_frames, batch, out, n_threads)
        if status != 0:
            raise ValueError(f'tpak_read_windows failed: {status}')
        return out

    def close(self):
        if getattr(self, '_handle', None):
            self._lib.tpak_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def write_tpak(path: str, clips) -> None:
    """Write a tpak file.

    Args:
        path: output file.
        clips: iterable of (name, frames) where frames is a
            (t, h, w, c) uint8 array or a callable returning one
            (lazy, to bound memory).
    """
    import struct
    clips = list(clips)
    metas = []
    with open(path, 'wb') as f:
        f.write(b'TPAK0001')
        f.write(struct.pack('<Q', len(clips)))
        # reserve header space: compute exact header size first
        header_entries = []
        offset = 16
        for name, frames in clips:
            name_b = name.encode()
            offset += 4 + len(name_b) + 8 + 4 + 4 + 4 + 8
        data_offset = offset
        # second pass: write header with real offsets (need shapes, so
        # materialize lazily per clip but twice is wasteful; require
        # shape via a probe attribute when callable)
        shapes = []
        cursor = data_offset
        for name, frames in clips:
            arr = frames() if callable(frames) else frames
            t, h, w, c = arr.shape
            shapes.append((t, h, w, c, cursor))
            cursor += t * h * w * c
        for (name, frames), (t, h, w, c, off) in zip(clips, shapes):
            name_b = name.encode()
            f.write(struct.pack('<I', len(name_b)))
            f.write(name_b)
            f.write(struct.pack('<QIIIQ', t, h, w, c, off))
        for name, frames in clips:
            arr = frames() if callable(frames) else frames
            f.write(np.ascontiguousarray(arr, np.uint8).tobytes())
