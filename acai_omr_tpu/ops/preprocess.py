"""On-device fused image ingest: resize -> clamp -> patchify in one XLA program.

The BASELINE north star calls for the preprocessing path (resize/normalize/
patchify) to run as fused kernels feeding the encoder. Antialiased bicubic
resampling is a *linear* operator per axis, so on TPU the idiomatic form is
two MXU matmuls with precomputed interpolation matrices — XLA fuses the
clamp and the patchify reshape into the same program, the whole ingest is
one compiled call per shape bucket, and the MXU does the heavy lifting
(a hand-rolled gather kernel would be VPU-bound and slower).

The interpolation weights replicate PIL/torchvision "bicubic antialias=True"
(Keys kernel, a=-0.5, support scaled by the downsampling factor) exactly as
native/imgproc.cpp does (reference: acai_omr/utils/utils.py:356-361
DynamicResize), so host- and device-side ingest agree to float rounding.

Host-side packing (data/loader.py) remains the default for training input —
the device path serves inference ingest where the image is already on (or
headed to) the accelerator, and doubles as the single-call "preprocess on
TPU" entry point.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


def bicubic_axis_weights(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) antialiased bicubic resampling matrix.

    Mirrors native/imgproc.cpp axis_weights bit-for-bit in weight placement
    and normalization (PIL-style: Keys a=-0.5, support 2*max(scale,1)).
    """

    def kernel(x: float) -> float:
        a = -0.5
        x = abs(x)
        if x < 1.0:
            return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
        if x < 2.0:
            return (((x - 5.0) * x + 8.0) * x - 4.0) * a
        return 0.0

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = int(center - support + 0.5)
        xmin = max(xmin, 0)
        xmax = int(center + support + 0.5)
        xmax = min(xmax, in_size)
        ws = np.array([kernel((xmin + i - center + 0.5) / filterscale)
                       for i in range(xmax - xmin)], dtype=np.float64)
        s = ws.sum()
        if s != 0.0:
            ws = ws / s
        mat[o, xmin:xmax] = ws.astype(np.float32)
    return mat


@functools.lru_cache(maxsize=64)
def _weights_cached(in_size: int, out_size: int):
    return jnp.asarray(bicubic_axis_weights(in_size, out_size))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "patch_size"))
def _resize_clamp_patchify(img: jnp.ndarray, rh: jnp.ndarray, rw: jnp.ndarray,
                           out_h: int, out_w: int, patch_size: int):
    c = img.shape[0]
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,chw->cow", rh, x)     # rows:  (out_h, H) @ (C, H, W)
    x = jnp.einsum("ow,chw->cho", rw, x)     # cols:  (out_w, W)
    x = jnp.clip(x, 0.0, 1.0)                # DynamicResize clamp (utils.py:366)
    p = patch_size
    hp, wp = out_h // p, out_w // p
    x = x.reshape(c, hp, p, wp, p)
    x = jnp.transpose(x, (1, 3, 0, 2, 4))    # nn.Unfold order (ops/patchify.py)
    return x.reshape(hp * wp, c * p * p)


def resize_normalize_patchify(img, out_h: int, out_w: int, patch_size: int):
    """(C, H, W) float [0,1] image (host or device) -> (L, C*P*P) patches on
    device, antialiased-bicubic-resized to (out_h, out_w), in ONE compiled
    program per (in-shape, out-shape) pair."""
    img = jnp.asarray(img)
    rh = _weights_cached(img.shape[1], out_h)
    rw = _weights_cached(img.shape[2], out_w)
    return _resize_clamp_patchify(img, rh, rw, out_h, out_w, patch_size)


def dynamic_resize_patchify(img, patch_size: int, max_seq_len: int,
                            pe_max_height: int, pe_max_width: int):
    """Device-side DynamicResize + patchify: same target-size math as
    data/transforms.DynamicResize (reference: utils.py:334-370), resize and
    patchify fused on device. Returns (patches (L, C*P*P), (hp, wp))."""
    from ..data.transforms import DynamicResize
    dr = DynamicResize(patch_size, max_seq_len, pe_max_height, pe_max_width,
                       crop_imgs=False)
    h, w = int(img.shape[-2]), int(img.shape[-1])
    out_h, out_w = dr.target_size(h, w)
    patches = resize_normalize_patchify(img, out_h, out_w, patch_size)
    return patches, (out_h // patch_size, out_w // patch_size)
