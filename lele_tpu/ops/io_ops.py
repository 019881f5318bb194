"""ImageDecoder (opset 20): decode JPEG/PNG/BMP/... bytes to [H, W, C].

Decoding happens on the HOST via PIL at trace time — encoded images are
variable-length byte streams with data-dependent output shapes, which XLA
cannot express; a traced (runtime-dynamic) encoded input raises with the
preprocessing hint. This mirrors how the reference's examples handle
images too: decode on host, ship pixels (yolo26 main.rs loads via the
`image` crate before inference).
"""

from __future__ import annotations

import io

import numpy as np

from .registry import OpContext, op


@op("ImageDecoder")
def image_decoder(ctx: OpContext, encoded):
    if not ctx.is_fold:
        raise NotImplementedError(
            "ImageDecoder needs the encoded bytes at trace time: image "
            "decode is host-side (data-dependent output shape). Hint: "
            "decode in your input pipeline and feed pixel tensors."
        )
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "ImageDecoder requires Pillow on the host"
        ) from e
    fmt = ctx.attr("pixel_format", "RGB")
    if isinstance(fmt, bytes):
        fmt = fmt.decode()
    data = np.asarray(encoded, dtype=np.uint8).tobytes()
    img = Image.open(io.BytesIO(data))
    if fmt == "Grayscale":
        arr = np.asarray(img.convert("L"), dtype=np.uint8)[..., None]
    elif fmt in ("RGB", "BGR"):
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        if fmt == "BGR":
            arr = arr[..., ::-1].copy()
    else:
        raise ValueError(f"ImageDecoder: unknown pixel_format {fmt!r}")
    return arr
