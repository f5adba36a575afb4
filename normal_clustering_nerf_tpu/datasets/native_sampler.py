"""ctypes bindings for the native (C++) host-side batch prefetcher.

Streams gather-ready ray batches assembled by native/raybatch.cpp — the
TPU framework's replacement for the reference's 16 DataLoader worker
processes (reference: train_nerf.py:293-298) when the scene cannot be
device-resident. Builds the shared library on demand with make.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_STRATEGIES = {
    "all_images": 0,
    "same_image": 1,
    "all_images_triang": 2,
    "same_image_triang": 3,
    "all_images_triang_patch": 4,
    "same_image_triang_patch": 5,
}

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_lib():
    so_path = os.path.abspath(os.path.join(_NATIVE_DIR, "libraybatch.so"))
    if not os.path.isfile(so_path):
        subprocess.check_call(["make", "-C", os.path.dirname(so_path)])
    lib = ctypes.CDLL(so_path)
    lib.rb_create.restype = ctypes.c_void_p
    lib.rb_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
    ]
    lib.rb_next.restype = ctypes.c_int32
    lib.rb_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.rb_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeRaySampler:
    """Threaded prefetching batch source over host-resident scene arrays."""

    def __init__(self, strategy: str, batch_size: int, img_wh, rgb: np.ndarray,
                 depth: Optional[np.ndarray] = None,
                 normals: Optional[np.ndarray] = None,
                 semantics: Optional[np.ndarray] = None,
                 max_expand: int = 0, patch_size: int = 8,
                 n_threads: int = 4, queue_depth: int = 8, seed: int = 0):
        self._lib = _load_lib()
        W, H = img_wh
        # mirror the device RaySampler's effective batch: triangle
        # strategies emit whole (x1, x2, x3) triples, patch strategies
        # whole patches (datasets/sampler.py group rounding)
        if "triang_patch" in strategy:
            pa = patch_size ** 2
            batch_size = max(batch_size // pa, 1) * pa
        elif "triang" in strategy:
            batch_size = max(batch_size // 3, 1) * 3
        self.batch_size = batch_size
        # keep references so buffers outlive the native prefetcher
        self._rgb = np.ascontiguousarray(rgb, np.float32)
        self._depth = (np.ascontiguousarray(depth, np.float32)
                       if depth is not None else None)
        self._normals = (np.ascontiguousarray(normals, np.float32)
                         if normals is not None else None)
        self._semantics = (np.ascontiguousarray(semantics, np.int32)
                           if semantics is not None else None)
        n_images = self._rgb.shape[0]

        def ptr(a):
            return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

        self._handle = self._lib.rb_create(
            _STRATEGIES[strategy], batch_size, n_images, W, H,
            max_expand, patch_size,
            ptr(self._rgb), ptr(self._depth), ptr(self._normals),
            ptr(self._semantics), n_threads, queue_depth, seed,
        )
        assert self._handle, "native prefetcher creation failed"

    def next_batch(self) -> Dict[str, np.ndarray]:
        B = self.batch_size
        img_idxs = np.empty(B, np.int32)
        pix_idxs = np.empty(B, np.int32)
        rgb = np.empty((B, 3), np.float32)
        depth = np.empty(B, np.float32) if self._depth is not None else None
        normals = (np.empty((B, 3), np.float32)
                   if self._normals is not None else None)
        sem = np.empty(B, np.int32) if self._semantics is not None else None

        def ptr(a):
            return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

        rc = self._lib.rb_next(
            self._handle, ptr(img_idxs), ptr(pix_idxs), ptr(rgb),
            ptr(depth), ptr(normals), ptr(sem))
        assert rc == 0, "native prefetcher stopped"
        out = {"img_idxs": img_idxs, "pix_idxs": pix_idxs, "rgb": rgb}
        if depth is not None:
            out["depth"] = depth
        if normals is not None:
            out["normals"] = normals
        if sem is not None:
            out["semantics"] = sem
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rb_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
