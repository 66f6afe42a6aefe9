"""Image-level primitives for the ORB front-end.

Replaces the reference's OpenVX built-in nodes (reference:
src/ORBextractor.cc:642-656 `vxGaussianPyramidNode`, :779-785 two
`vxConvolveNode` separable-Gaussian passes) and the CPU fallbacks
(`ComputePyramid` src/ORBextractor.cc:1817-1873, cv::GaussianBlur at
:1736-1761). Everything is plain jnp on static shapes so XLA can fuse the
whole per-level pipeline into a few kernels.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static (h, w) per level, mirroring the reference's per-level
    mvImagePyramid sizing (src/ORBextractor.cc:1817-1830: round(w/scale))."""
    shapes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor ** lvl)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def resize_bilinear(img, out_shape):
    """Bilinear resize (H,W) -> out_shape, matching cv::resize INTER_LINEAR
    pixel-center alignment (half-pixel offsets)."""
    h, w = img.shape
    oh, ow = out_shape
    if (oh, ow) == (h, w):
        return img
    sy = h / oh
    sx = w / ow
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    top = img[y0i][:, x0i] * (1 - wx)[None, :] + img[y0i][:, x1i] * wx[None, :]
    bot = img[y1i][:, x0i] * (1 - wx)[None, :] + img[y1i][:, x1i] * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def build_pyramid(img, n_levels: int, scale_factor: float):
    """List of per-level float32 images. Level l is resized from level l-1
    (cascaded, like the reference's ComputePyramid), which low-passes
    progressively and matches its effective filtering more closely than
    direct level-0 resampling."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel equivalent (the coefficients behind the
    reference's separable vxConvolveNode pair, src/ORBextractor.cc:719-744)."""
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def separable_gaussian(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with BORDER_REFLECT_101, as applied before
    descriptor sampling (reference: src/ORBextractor.cc:1739
    `GaussianBlur(..., Size(7,7), 2, 2, BORDER_REFLECT_101)`)."""
    k = gaussian_kernel_1d(ksize, sigma)  # host constants
    r = ksize // 2
    h, w = img.shape
    # Reflect-101 padding: edge pixel not duplicated.
    p = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # Static shifted-slice accumulation instead of conv_general_dilated:
    # a 1-channel conv has no MXU mapping on TPU and lowers poorly,
    # while 2x7 fused shifted adds are pure VPU work at memory speed.
    rows = jnp.zeros((h + 2 * r, w), p.dtype)
    for i in range(ksize):
        rows = rows + float(k[i]) * jax.lax.slice(p, (0, i), (h + 2 * r, i + w))
    out = jnp.zeros((h, w), p.dtype)
    for i in range(ksize):
        out = out + float(k[i]) * jax.lax.slice(rows, (i, 0), (i + h, w))
    return out
