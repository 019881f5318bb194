"""Image IO + preprocessing for the vision pipelines.

Parity: the reference decodes JPEG and does a PIL-style nearest resize to
640×640 then CHW /255 (/root/reference/examples/yolo26/src/image.rs:124-171).
We use PIL for decode; `preprocess` reproduces the nearest resize + /255,
returning NHWC (the TPU conv layout; the ONNX-compiled path keeps the
graph's own NCHW semantics internally).
"""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def nearest_resize(img: np.ndarray, size: int) -> np.ndarray:
    """PIL-style nearest resize (center-of-pixel mapping)."""
    h, w = img.shape[:2]
    ys = (np.arange(size) + 0.5) * h / size
    xs = (np.arange(size) + 0.5) * w / size
    yi = np.minimum(ys.astype(np.int64), h - 1)
    xi = np.minimum(xs.astype(np.int64), w - 1)
    return img[yi][:, xi]


def preprocess(img: np.ndarray, size: int = 640) -> np.ndarray:
    """uint8 HWC → f32 NHWC [1, size, size, 3] in [0,1]."""
    out = nearest_resize(img, size).astype(np.float32) / 255.0
    return out[None]


def preprocess_u8(img: np.ndarray, size: int = 640) -> np.ndarray:
    """uint8 HWC → uint8 NHWC [1, size, size, 3]; normalization happens on
    device (models.yolo26_forward) so the host→device transfer is 4× smaller
    than the f32 path."""
    return nearest_resize(img, size)[None]


def preprocess_chw(img: np.ndarray, size: int = 640) -> np.ndarray:
    """uint8 HWC → uint8 CHW [1, 3, size, size] — the TPU-preferred image
    layout: W is the minor (lane) dimension, so the device reads the image
    at its true byte size, where NHWC's C=3 minor dim lane-pads 3→128
    (~43× the bytes; ~0.3 ms of HBM waste at 640²). The model normalizes
    on device, so the transfer stays uint8 (4× smaller than f32) too."""
    return nearest_resize(img, size).transpose(2, 0, 1)[None].copy()


def preprocess_s2d(img: np.ndarray, size: int = 640) -> np.ndarray:
    """uint8 HWC → uint8 space-to-depth-packed [1, size/4, size/4, 48]
    (slot (u*4+v)*3 + c — models/s2d.py layout). Packing on the HOST
    (a 1.2 MB numpy transpose) sidesteps the device entirely: XLA's layout
    assignment for an in-program image transpose costs ~0.33 ms at 640²
    whichever input layout it starts from, while a pre-packed input param
    reads clean. The model normalizes on device, transfer stays uint8.

    Fast path: the C++ fused resize+pack (runtime/native pack_s2d_u8,
    one sequential byte-shuffle) when the native module is available;
    exact-parity numpy fallback otherwise (test_native gates equality)."""
    from ..runtime.native import get_native

    nat = get_native()
    if nat is not None and img.dtype == np.uint8 and img.ndim == 3 \
            and img.flags.c_contiguous:
        h0, w0, c = img.shape
        g = size // 4
        out = nat.pack_s2d_u8(img.data, h0, w0, c, size, 4)
        return np.frombuffer(out, np.uint8).reshape(1, g, g, 16 * c)
    x = nearest_resize(img, size)
    h = size // 4
    x = x.reshape(h, 4, h, 4, 3).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(x.reshape(1, h, h, 48))
