"""ctypes bindings for the native (C++) clip-loading runtime.

The reference repo has no in-tree input pipeline (its forward contract,
README.md:92-127, starts from (B, C, T, H, W) tensors). Serving the TPU
path at >1.5k frames/s needs the decode/augment/normalise work off the
Python thread, so ``native/videoloader/videoloader.cc`` implements a
threaded prefetch loader (the torch-DataLoader-equivalent) as a C++17
library with a plain C ABI; this module builds it on demand with ``g++``
(no pybind11 in the image) and wraps it as a Python iterable.

Determinism: per-sample RNG is keyed on (seed, epoch, sample index), so a
given (seed, epoch) yields bit-identical batches regardless of thread
count or scheduling.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "videoloader" / "videoloader.cc"
_SO = _REPO_ROOT / "native" / "build" / "libvideoloader.so"

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_lib = None


def native_available() -> bool:
    """True when the shared library exists or can be built here."""
    try:
        _load_lib()
        return True
    except (OSError, RuntimeError, FileNotFoundError):
        return False


_SRCS = [_SRC, _SRC.parent / "jpeg.cc", _SRC.parent / "jpeg.h"]


def build_native(force: bool = False) -> Path:
    """Compile libvideoloader.so with g++ (cached on source mtimes)."""
    if not _SRC.exists():
        raise FileNotFoundError(f"native source missing: {_SRC}")
    newest = max(s.stat().st_mtime for s in _SRCS if s.exists())
    if _SO.exists() and not force and _SO.stat().st_mtime >= newest:
        return _SO
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-std=c++17", "-fPIC", "-shared",
        "-pthread", str(_SRC), str(_SRC.parent / "jpeg.cc"), "-o", str(_SO),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed:\n{proc.stderr}")
    return _SO


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = build_native()
    lib = ctypes.CDLL(str(so))
    lib.vml_create.restype = ctypes.c_void_p
    lib.vml_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.vml_start_epoch.restype = ctypes.c_int32
    lib.vml_start_epoch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64]
    lib.vml_next.restype = ctypes.c_int32
    lib.vml_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64)]
    lib.vml_batch_floats.restype = ctypes.c_int64
    lib.vml_batch_floats.argtypes = [ctypes.c_void_p]
    lib.vml_last_error.restype = ctypes.c_char_p
    lib.vml_last_error.argtypes = [ctypes.c_void_p]
    lib.vml_destroy.restype = None
    lib.vml_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_vraw(path, video: np.ndarray) -> None:
    """Write a (T, H, W, C) uint8 array in the VMRAW001 shard format."""
    video = np.ascontiguousarray(video, dtype=np.uint8)
    if video.ndim != 4:
        raise ValueError(f"expected (T, H, W, C), got {video.shape}")
    with open(path, "wb") as f:
        f.write(b"VMRAW001")
        f.write(struct.pack("<4I", *video.shape))
        f.write(video.tobytes())


def write_vmjpg(path, jpeg_frames: Sequence[bytes],
                height: int, width: int) -> None:
    """Write an MJPEG shard (VMJPG001): per-frame baseline JPEG payloads
    with an offset index, decoded natively by the loader's built-in
    baseline JPEG decoder. All frames must share (height, width)."""
    offsets = np.zeros(len(jpeg_frames) + 1, dtype=np.uint64)
    for i, fr in enumerate(jpeg_frames):
        offsets[i + 1] = offsets[i] + len(fr)
    with open(path, "wb") as f:
        f.write(b"VMJPG001")
        f.write(struct.pack("<4I", len(jpeg_frames), height, width, 3))
        f.write(offsets.tobytes())
        for fr in jpeg_frames:
            f.write(fr)


def encode_vmjpg(path, video: np.ndarray, quality: int = 90,
                 subsampling: int = 0) -> None:
    """Encode a (T, H, W, 3) uint8 array as a VMJPG001 shard via PIL
    (baseline JPEGs; subsampling=0 is 4:4:4). PIL is only needed for
    WRITING — decode is native."""
    import io

    from PIL import Image

    video = np.ascontiguousarray(video, dtype=np.uint8)
    frames = []
    for t in range(video.shape[0]):
        buf = io.BytesIO()
        Image.fromarray(video[t]).save(
            buf, format="JPEG", quality=quality, subsampling=subsampling)
        frames.append(buf.getvalue())
    write_vmjpg(path, frames, video.shape[1], video.shape[2])


class NativeClipLoader:
    """Threaded native clip loader yielding (B, C, T, S, S) float32 batches.

    Accepts ``.npy`` files (uint8, C-order, shape (T, H, W, C)) and
    ``VMRAW001`` shards (see :func:`write_vraw`). ``train=True`` enables
    random temporal start, random crop, and horizontal flip; otherwise
    center start / center crop. ``short_side > 0`` resizes the short side
    to that length (bilinear, align_corners=False — same convention as
    ``ops/resample.py``) before cropping.
    """

    def __init__(
        self,
        paths: Sequence[str],
        labels: Optional[Sequence[int]] = None,
        *,
        clip_len: int = 8,
        frame_stride: int = 1,
        short_side: int = 0,
        crop: int = 224,
        batch_size: int = 4,
        num_threads: int = 4,
        prefetch: int = 3,
        mean: Sequence[float] = IMAGENET_MEAN,
        std: Sequence[float] = IMAGENET_STD,
        train: bool = False,
    ):
        lib = _load_lib()
        self._lib = lib
        self.batch_size = batch_size
        self.clip_len = clip_len
        self.crop = crop
        self.n_samples = len(paths)

        c_paths = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths])
        if labels is None:
            labels = list(range(len(paths)))
        c_labels = (ctypes.c_int64 * len(paths))(*[int(l) for l in labels])
        c_mean = (ctypes.c_float * 3)(*[float(m) for m in mean])
        c_std = (ctypes.c_float * 3)(*[float(s) for s in std])
        err = ctypes.create_string_buffer(512)
        handle = lib.vml_create(
            c_paths, c_labels, len(paths), clip_len, frame_stride,
            short_side, crop, batch_size, num_threads, prefetch,
            c_mean, c_std, 1 if train else 0, err, len(err))
        if not handle:
            raise RuntimeError(f"vml_create failed: {err.value.decode()}")
        self._handle = ctypes.c_void_p(handle)
        self._batch_floats = lib.vml_batch_floats(self._handle)

    def epoch(
        self, seed: int = 0, shuffle: Optional[bool] = None,
        drop_last: bool = False, epoch: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Iterate one epoch; yields (clips, labels) with clips
        (count, C, clip_len, crop, crop) float32 (count < batch_size only
        on a non-dropped final partial batch).

        ``epoch`` pins the augmentation-RNG epoch index (making
        checkpoint-resume replays bit-exact); by default it auto-increments
        per call so repeated epochs draw fresh augmentations."""
        if shuffle is None:
            shuffle = False
        n_batches = self._lib.vml_start_epoch(
            self._handle, seed, 1 if shuffle else 0, 1 if drop_last else 0,
            -1 if epoch is None else int(epoch))
        buf = np.empty(self._batch_floats, dtype=np.float32)
        lbl = np.empty(self.batch_size, dtype=np.int64)
        for _ in range(n_batches):
            count = self._lib.vml_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            if count <= 0:
                break
            clips = buf.reshape(
                self.batch_size, 3, self.clip_len, self.crop, self.crop)
            yield clips[:count].copy(), lbl[:count].copy()
        err = self._lib.vml_last_error(self._handle)
        if err:
            msg = err.decode()
            if msg:
                raise RuntimeError(f"native loader error: {msg}")

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.vml_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
