"""ctypes bindings for the native dataset-zip loader (native/gagan_loader.cpp).

Drop-in accelerator for ImageFolderDataset on dataset zips: the zip central
directory is indexed once in C++, and each batch's PNG decode + CHW/x-flip
transform fans out over a thread pool without the GIL.  Falls back cleanly
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import zipfile
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libgagan_loader.so")


def build_native(force: bool = False) -> bool:
    """Compile the loader if needed; returns availability."""
    if os.path.isfile(_SO_PATH) and not force:
        return True
    src_dir = os.path.join(_REPO_ROOT, "native")
    if not os.path.isfile(os.path.join(src_dir, "gagan_loader.cpp")):
        return False
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True)
        return os.path.isfile(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        if not build_native():
            raise RuntimeError("native loader unavailable (build failed)")
        lib = ctypes.CDLL(_SO_PATH)
        lib.gl_open.restype = ctypes.c_void_p
        lib.gl_open.argtypes = [ctypes.c_char_p]
        lib.gl_error.restype = ctypes.c_char_p
        lib.gl_error.argtypes = [ctypes.c_void_p]
        lib.gl_num_images.restype = ctypes.c_longlong
        lib.gl_num_images.argtypes = [ctypes.c_void_p]
        lib.gl_shape.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_int)] * 3
        lib.gl_read_batch.restype = ctypes.c_int
        lib.gl_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.gl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _get_lib()
        return True
    except RuntimeError:
        return False


class NativeZipDataset:
    """ImageFolderDataset-compatible reader backed by the C++ loader.

    Provides the same max_size/xflip/label semantics
    (training/dataset.py:24-233) with batch reads decoded natively.
    """

    def __init__(self, path: str, max_size: Optional[int] = None,
                 use_labels: bool = False, xflip: bool = False,
                 random_seed: int = 0):
        lib = _get_lib()
        self._lib = lib
        self._handle = lib.gl_open(path.encode())
        err = lib.gl_error(self._handle)
        if err:
            raise IOError(f"native loader: {err.decode()}")
        self._path = path
        n_raw = int(lib.gl_num_images(self._handle))
        c = ctypes.c_int()
        h = ctypes.c_int()
        w = ctypes.c_int()
        lib.gl_shape(self._handle, ctypes.byref(c), ctypes.byref(h),
                     ctypes.byref(w))
        self._shape = (c.value, h.value, w.value)
        self.name = os.path.splitext(os.path.basename(path))[0]

        self._use_labels = use_labels
        self._raw_labels = None

        self._raw_idx = np.arange(n_raw, dtype=np.int64)
        if max_size is not None and self._raw_idx.size > max_size:
            np.random.RandomState(random_seed).shuffle(self._raw_idx)
            self._raw_idx = np.sort(self._raw_idx[:max_size])
        self._xflip = np.zeros(self._raw_idx.size, dtype=np.uint8)
        if xflip:
            self._raw_idx = np.tile(self._raw_idx, 2)
            self._xflip = np.concatenate([self._xflip,
                                          np.ones_like(self._xflip)])

    # -- label handling mirrors ImageFolderDataset --
    def _get_raw_labels(self):
        if self._raw_labels is None:
            labels = None
            if self._use_labels:
                with zipfile.ZipFile(self._path) as z:
                    if "dataset.json" in z.namelist():
                        with z.open("dataset.json") as f:
                            labels = json.load(f)["labels"]
            if labels:
                with zipfile.ZipFile(self._path) as z:
                    import PIL.Image

                    PIL.Image.init()
                    names = sorted(
                        n for n in z.namelist()
                        if os.path.splitext(n)[1].lower()
                        in PIL.Image.EXTENSION)
                lmap = dict(labels)
                arr = np.array([lmap[n] for n in names])
                self._raw_labels = arr.astype(
                    {1: np.int64, 2: np.float32}[arr.ndim])
            else:
                self._raw_labels = np.zeros(
                    [len(self._raw_idx), 0], dtype=np.float32)
        return self._raw_labels

    @property
    def image_shape(self):
        return list(self._shape)

    @property
    def num_channels(self):
        return self._shape[0]

    @property
    def resolution(self):
        return self._shape[1]

    @property
    def label_shape(self):
        raw = self._get_raw_labels()
        if raw.dtype == np.int64:
            return [int(np.max(raw)) + 1]
        return list(raw.shape[1:])

    @property
    def label_dim(self):
        return self.label_shape[0] if self.label_shape else 0

    @property
    def has_labels(self):
        return any(x != 0 for x in self.label_shape)

    def __len__(self):
        return self._raw_idx.size

    def get_label(self, idx):
        label = self._get_raw_labels()[self._raw_idx[idx]]
        if label.dtype == np.int64:
            onehot = np.zeros(self.label_shape, dtype=np.float32)
            onehot[label] = 1
            label = onehot
        return label.copy()

    def read_batch(self, idxs) -> Tuple[np.ndarray, np.ndarray]:
        """Decode a batch natively; returns (images [N,C,H,W] u8, labels)."""
        idxs = np.asarray(idxs, dtype=np.int64)
        raw = np.ascontiguousarray(self._raw_idx[idxs])
        flips = np.ascontiguousarray(self._xflip[idxs])
        c, h, w = self._shape
        out = np.empty((len(idxs), c, h, w), dtype=np.uint8)
        rc = self._lib.gl_read_batch(
            self._handle,
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            flips.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            len(idxs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc != 0:
            raise IOError("native batch decode failed")
        labels = np.stack([self.get_label(int(i)) for i in idxs])
        return out, labels

    def __getitem__(self, idx):
        imgs, labels = self.read_batch([idx])
        return imgs[0], labels[0]

    def close(self):
        if self._handle:
            self._lib.gl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_data_loader(dataset: NativeZipDataset, batch_size: int,
                       rank: int = 0, num_replicas: int = 1, seed: int = 0,
                       prefetch: int = 2):
    """Infinite batch iterator over the native dataset (sampler semantics of
    data.dataset.InfiniteSampler) with background prefetch."""
    import queue as queue_lib
    import threading

    from gagan_tpu.data.dataset import InfiniteSampler

    sampler = iter(InfiniteSampler(len(dataset), rank=rank,
                                   num_replicas=num_replicas, seed=seed))
    out_q: queue_lib.Queue = queue_lib.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        while not stop.is_set():
            idxs = [next(sampler) for _ in range(batch_size)]
            batch = dataset.read_batch(idxs)
            while not stop.is_set():
                try:
                    out_q.put(batch, timeout=1.0)
                    break
                except queue_lib.Full:
                    continue

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    class _Iter:
        def __iter__(self):
            return self

        def __next__(self):
            return out_q.get()

        def close(self):
            stop.set()

    return _Iter()
