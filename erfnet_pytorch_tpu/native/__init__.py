"""Native (C++) data-loader bindings via ctypes.

``get_lib()`` builds the shared library on first use (g++ is in the image)
and caches it next to the source.  Everything degrades gracefully: callers
check ``available()`` and fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_SO = os.path.join(_DIR, "_loader.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC,
           "-lpng", "-ljpeg", "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[native] build failed, falling back to PIL: {msg}")
        return False


def get_lib():
    """Returns the ctypes lib or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.load_image_f32.restype = ctypes.c_int
        lib.load_image_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.load_label_i32.restype = ctypes.c_int
        lib.load_label_i32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.loader_batch.restype = ctypes.c_int
        lib.loader_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.load_image_u8.restype = ctypes.c_int
        lib.load_image_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.loader_batch_u8.restype = ctypes.c_int
        lib.loader_batch_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.save_png_u8.restype = ctypes.c_int
        lib.save_png_u8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.writer_batch.restype = ctypes.c_int
        lib.writer_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeBatchLoader:
    """Thread-pooled native image IO against caller-visible numpy buffers.

    GIL-free: an entire batch is decoded (``load_batch``) or encoded
    (``write_batch``) by C++ threads during one ctypes call.  Used by
    data.loader.DataLoader as the ``backend="native"`` path and by the
    eval CLIs' PNG output loops.
    """

    def __init__(self, num_threads: int = 4):
        import numpy as np  # local to keep module import light
        self._np = np
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        # clamp like data.loader.DataLoader does: a 0-thread pool would
        # accept jobs no worker ever runs and the first batch call would
        # block forever inside the GIL-released Latch wait
        self._pool = lib.loader_create(max(1, int(num_threads)))

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.loader_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    MODE_GRAY, MODE_RGB, MODE_PAL = 0, 1, 2

    def write_batch(self, paths, arr, *, mode, palette=None, level=1):
        """Encode a (n, h, w[, 3]) uint8 batch to one PNG per path, in
        parallel, GIL-free.  mode: MODE_GRAY / MODE_RGB / MODE_PAL;
        palette: (pal_n, 3) uint8 for MODE_PAL.  level: zlib 0-9 (default
        1: segmentation maps are piecewise-constant, so fast deflate
        already compresses them well — see tests/test_native_writer.py's
        measured sizes).

        The eval CLIs' replacement for the reference's per-image
        ``ToPILImage -> .save`` loop (SURVEY.md §3.3): the whole batch is
        encoded by C++ threads during one ctypes call, overlapping the
        next device batch.
        """
        level = int(level)  # the validated value is what reaches ctypes
        if not 0 <= level <= 9:
            raise ValueError(f"zlib level must be 0-9, got {level}")
        np = self._np
        arr = np.ascontiguousarray(arr, np.uint8)
        n = len(paths)
        want = (arr.shape[0],) + arr.shape[1:3] + ((3,) if mode == 1 else ())
        if n != arr.shape[0] or arr.shape != want:
            raise ValueError(f"shape {arr.shape} != {want} for mode {mode}")
        h, w = arr.shape[1:3]
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        u8p = ctypes.POINTER(ctypes.c_uint8)
        pal_ptr, pal_n = None, 0
        if mode == self.MODE_PAL:
            if palette is None:
                raise ValueError("MODE_PAL requires a palette")
            palette = np.ascontiguousarray(palette, np.uint8)
            pal_ptr = palette.ctypes.data_as(u8p)
            pal_n = palette.shape[0]
        rc = self._lib.writer_batch(
            self._pool, c_paths, arr.ctypes.data_as(u8p), n, h, w,
            mode, pal_ptr, pal_n, level)
        if rc != 0:
            raise IOError(f"native writer failed on batch "
                          f"(first path: {paths[0]!r})")

    def load_batch(self, img_paths, lab_paths, h, w, *, fill=255,
                   image_dtype="float32"):
        """image_dtype 'float32': (n,h,w,3) [0,1] ToTensor form.
        'uint8': the same PIL-rounded resize output raw — 4x less
        host->device traffic; normalize on-device (/255 fuses into the
        first conv under jit)."""
        np = self._np
        n = len(img_paths)
        u8 = image_dtype == "uint8"
        imgs = np.empty((n, h, w, 3), np.uint8 if u8 else np.float32)
        labs = np.empty((n, h, w), np.int32)
        c_imgs = (ctypes.c_char_p * n)(
            *[p.encode() for p in img_paths])
        c_labs = (ctypes.c_char_p * n)(
            *[(p.encode() if p else b"") for p in lab_paths])
        fn = self._lib.loader_batch_u8 if u8 else self._lib.loader_batch
        ptr_t = ctypes.c_uint8 if u8 else ctypes.c_float
        rc = fn(self._pool, c_imgs, c_labs, n, h, w,
                imgs.ctypes.data_as(ctypes.POINTER(ptr_t)),
                labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), fill)
        if rc != 0:
            raise IOError(f"native loader failed on batch "
                          f"(first path: {img_paths[0]!r})")
        return imgs, labs


# The writer is the same C++ pool; the alias keeps call sites readable.
NativeBatchWriter = NativeBatchLoader
