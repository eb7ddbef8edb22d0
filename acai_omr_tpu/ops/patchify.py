"""Patchify / unpatchify.

The reference patchifies with ``nn.Unfold(P, stride=P)`` inside a per-image
Python loop and re-assembles with ``nn.Fold`` (reference:
acai_omr/models/models.py:23,48; acai_omr/utils/utils.py:395). On TPU the same
op is a reshape/transpose that XLA fuses for free; the ragged per-image loop is
replaced by host-side packing into static shape buckets (see
``acai_omr_tpu.models.vit_encoder.batchify``).

Patch order matches Unfold exactly: row-major over the patch grid, each patch
flattened row-major, so weight-transferred models see identical sequences.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def patchify(img, patch_size: int):
    """(C, H, W) or (H, W) image -> (L, C*P*P) patches, L = (H//P)*(W//P).

    Works on numpy or jnp arrays (host packing uses numpy; jitted code jnp).
    Channel-major within a patch to match nn.Unfold's (C*P*P) layout.
    """
    xp = jnp if isinstance(img, jnp.ndarray) else np
    if img.ndim == 2:
        img = img[None]
    c, h, w = img.shape
    p = patch_size
    hp, wp = h // p, w // p
    img = img[:, : hp * p, : wp * p]
    x = img.reshape(c, hp, p, wp, p)
    x = xp.transpose(x, (1, 3, 0, 2, 4))  # (hp, wp, C, P, P)
    return x.reshape(hp * wp, c * p * p)


def unpatchify(patches, hp: int, wp: int, patch_size: int, channels: int = 1):
    """(L, C*P*P) -> (C, hp*P, wp*P). Inverse of :func:`patchify`."""
    xp = jnp if isinstance(patches, jnp.ndarray) else np
    p = patch_size
    x = patches.reshape(hp, wp, channels, p, p)
    x = xp.transpose(x, (2, 0, 3, 1, 4))  # (C, hp, P, wp, P)
    return x.reshape(channels, hp * p, wp * p)


def batched_patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, L, C*P*P) for uniform-size batches (jit-safe)."""
    b, c, h, w = imgs.shape
    p = patch_size
    hp, wp = h // p, w // p
    x = imgs.reshape(b, c, hp, p, wp, p)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b, hp * wp, c * p * p)
