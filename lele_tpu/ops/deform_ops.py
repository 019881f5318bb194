"""DeformConv (opset 19/22) — deformable convolution v2.

The sampling grid is data-dependent (offsets are an input), so this cannot
ride lax.conv; instead it lowers to the TPU-friendly form: one big gather
of all bilinear corner samples (im2col-sized, MXU-aligned) followed by a
grouped einsum against the kernel. The reference has no deformable conv at
all (its conv kernels are fixed-grid im2col — SURVEY §2.2).

Semantics follow the ONNX spec: offset channels laid out as
[offset_group, kH, kW, (dy, dx)], mask channels [offset_group, kH, kW],
zero padding outside the input, bilinear interpolation with per-corner
validity (a corner outside contributes zero, partial corners still blend).
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op


@op("DeformConv", foldable=False)
def deform_conv(ctx: OpContext, x, w, offset, b=None, mask=None):
    import jax.numpy as jnp

    if x.ndim != 4:
        raise NotImplementedError(
            "DeformConv: only 2-D spatial input [N,C,H,W] is supported "
            "(the ONNX spec itself is 2-D-only as of opset 22)"
        )
    n, c, h, w_in = x.shape
    oc, cpg, kh, kw = w.shape
    group = int(ctx.attr("group", 1))
    og = int(ctx.attr("offset_group", 1))
    strides = ctx.attr_ints("strides", [1, 1])
    pads = ctx.attr_ints("pads", [0, 0, 0, 0])
    dil = ctx.attr_ints("dilations", [1, 1])
    ks = ctx.attr_ints("kernel_shape", [kh, kw])
    if list(ks) != [kh, kw]:
        raise ValueError(
            f"DeformConv kernel_shape {ks} disagrees with W {[kh, kw]}"
        )
    oh, ow = offset.shape[-2], offset.shape[-1]

    # base sampling grid: [kH, oH] and [kW, oW]
    base_y = (jnp.arange(oh) * strides[0] - pads[0])[None, :] \
        + (jnp.arange(kh) * dil[0])[:, None]
    base_x = (jnp.arange(ow) * strides[1] - pads[1])[None, :] \
        + (jnp.arange(kw) * dil[1])[:, None]
    off = offset.reshape(n, og, kh, kw, 2, oh, ow)
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    # sample coords [N, og, kH, kW, oH, oW]
    sy = base_y[None, None, :, None, :, None].astype(f32) + \
        off[:, :, :, :, 0].astype(f32)
    sx = base_x[None, None, None, :, None, :].astype(f32) + \
        off[:, :, :, :, 1].astype(f32)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0  # weight of the y0+1 corner
    wx1 = sx - x0

    xf = x.reshape(n, c, h * w_in)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w_in)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w_in - 1).astype(jnp.int32)
        flat = (yc * w_in + xc).reshape(n, og, -1)  # [N, og, T]
        # each input channel uses its offset group's coordinates
        idx = jnp.repeat(flat, c // og, axis=1)  # [N, C, T]
        smp = jnp.take_along_axis(xf, idx, axis=2)
        vmask = jnp.repeat(
            valid.reshape(n, og, -1), c // og, axis=1
        )
        return jnp.where(vmask, smp, 0).reshape(n, c, kh, kw, oh, ow)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wy1e = jnp.repeat(wy1.reshape(n, og, kh, kw, oh, ow), c // og, axis=1) \
        .reshape(n, c, kh, kw, oh, ow)
    wx1e = jnp.repeat(wx1.reshape(n, og, kh, kw, oh, ow), c // og, axis=1) \
        .reshape(n, c, kh, kw, oh, ow)
    samples = (
        v00 * (1 - wy1e) * (1 - wx1e)
        + v01 * (1 - wy1e) * wx1e
        + v10 * wy1e * (1 - wx1e)
        + v11 * wy1e * wx1e
    )
    if mask is not None:
        m = mask.reshape(n, og, kh, kw, oh, ow)
        samples = samples * jnp.repeat(m, c // og, axis=1).reshape(
            n, c, kh, kw, oh, ow
        )

    # grouped contraction: [N, G, C/G, kH, kW, oH, oW] × [G, oC/G, C/G, kH, kW]
    sg = samples.reshape(n, group, c // group, kh, kw, oh, ow)
    wg = w.reshape(group, oc // group, cpg, kh, kw)
    out = jnp.einsum(
        "ngcklhw,gockl->ngohw", sg, wg,
        preferred_element_type=f32,
    ).reshape(n, oc, oh, ow).astype(x.dtype)
    if b is not None:
        out = out + b.reshape(1, oc, 1, 1)
    return out
