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
