"""ViT encoder over ragged multi-resolution sheet-music images, TPU-style.

Capability parity with the reference's ``Encoder`` / ``OMREncoder`` /
``MAEEncoder`` / ``FineTuneOMREncoder`` family (reference:
acai_omr/models/models.py:14-180, 290-376), redesigned for XLA:

* The per-image Python loop (unfold -> PE slice -> nested-tensor pad) becomes a
  **host-side packer** (:func:`batchify`) that emits fixed-shape arrays padded
  to a shape bucket, plus gather indices for the 2-D PE grid. One compiled
  program serves every batch in the same bucket.
* PE slice *and* bilinear interpolation are the same device gather
  (:mod:`acai_omr_tpu.ops.pe`), so a batch can mix in-grid and oversize images.
* MAE shuffle/mask runs fully vectorized on device with static shapes
  (:func:`mae_mask`): padding positions get +inf noise so the per-example
  argsort keeps valid patches first — no ragged index juggling.
* The frozen/fine-tune split of ``FineTuneOMREncoder`` (models.py:334-376) is
  expressed by running the stacked layers in two scans split at
  ``fine_tune_depth``; parameters stay in one stack, and freezing is an
  optimizer-mask concern (see parallel/trainer.py), not a module-structure one.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn, transformer
from ..ops import patchify as patch_ops
from ..ops import pe as pe_ops

Params = dict


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    patch_size: int = 16
    pe_max_height: int = 60
    pe_max_width: int = 200
    num_layers: int = 12
    hidden_dim: int = 768
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    num_channels: int = 1
    # ViT layers [0, num_layers - fine_tune_depth) are frozen during seq2seq
    # fine-tuning; 0 disables the split (reference: models.py:334-360)
    fine_tune_depth: int = 0

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2


def init_encoder_params(key, cfg: EncoderConfig, dtype=jnp.float32) -> Params:
    kp, kproj, kblocks = jax.random.split(key, 3)
    return {
        "pos_embedding": nn.trunc_normal(kp, (cfg.pe_max_height, cfg.pe_max_width, cfg.hidden_dim), std=0.1, dtype=dtype),
        "projection": nn.dense_init(kproj, cfg.patch_dim, cfg.hidden_dim, dtype),
        "blocks": transformer.stack_init(transformer.encoder_layer_init, kblocks,
                                         cfg.num_layers, cfg.hidden_dim, cfg.mlp_dim, dtype),
        "final_norm": nn.layernorm_init(cfg.hidden_dim, dtype),
    }


# ---------------------------------------------------------------------------
# host-side ragged packing
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PatchBatch:
    """Fixed-shape device-ready view of a ragged image batch."""
    patches: np.ndarray      # (B, L, P*P*C) float32
    pe_idx: np.ndarray       # (B, L, 4) int32 gather indices into pe grid
    pe_w: np.ndarray         # (B, L, 4) float32 gather weights
    valid: np.ndarray        # (B, L) bool, True = real patch
    lengths: np.ndarray      # (B,) int32 true sequence lengths
    dims: list               # [(hp, wp)] per image, for unpatchify/decoder PE


def bucket_len(n: int, multiple: int = 128, minimum: int | None = None) -> int:
    if minimum is None:
        minimum = multiple
    return max(minimum, -(-n // multiple) * multiple)


def batchify(imgs, cfg: EncoderConfig, bucket_multiple: int = 128,
             allow_interpolation: bool = True) -> PatchBatch:
    """Pack a list of (C, H, W) float arrays into one static-shape batch.

    ``allow_interpolation=False`` reproduces the strict ``Encoder.batchify``
    that rejects images beyond the PE grid (reference: models.py:45-46);
    True gives ``OMREncoder`` semantics (bilinear PE for oversize images,
    models.py:304-332).
    """
    p = cfg.patch_size
    per_img = []
    for img in imgs:
        img = np.asarray(img, dtype=np.float32)
        if img.ndim == 2:
            img = img[None]
        hp, wp = img.shape[-2] // p, img.shape[-1] // p
        if (hp > cfg.pe_max_height or wp > cfg.pe_max_width) and not allow_interpolation:
            raise ValueError(
                f"{hp} x {wp} image is too large for max positional embedding "
                f"grid of shape {cfg.pe_max_height} x {cfg.pe_max_width}")
        patches = patch_ops.patchify(img, p)
        idx, w = pe_ops.pe_indices(hp, wp, cfg.pe_max_height, cfg.pe_max_width)
        per_img.append((patches, idx, w, (hp, wp)))

    b = len(per_img)
    lmax = bucket_len(max(x[0].shape[0] for x in per_img), bucket_multiple)
    patch_dim = cfg.patch_dim
    patches = np.zeros((b, lmax, patch_dim), dtype=np.float32)
    pe_idx = np.zeros((b, lmax, 4), dtype=np.int32)
    pe_w = np.zeros((b, lmax, 4), dtype=np.float32)
    valid = np.zeros((b, lmax), dtype=bool)
    lengths = np.zeros((b,), dtype=np.int32)
    dims = []
    for i, (pt, idx, w, hw) in enumerate(per_img):
        l = pt.shape[0]
        patches[i, :l] = pt
        pe_idx[i, :l] = idx
        pe_w[i, :l] = w
        valid[i, :l] = True
        lengths[i] = l
        dims.append(hw)
    return PatchBatch(patches, pe_idx, pe_w, valid, lengths, dims)


# ---------------------------------------------------------------------------
# device-side forward
# ---------------------------------------------------------------------------

def embed_patches(params: Params, patches: jnp.ndarray, pe_idx: jnp.ndarray,
                  pe_w: jnp.ndarray, valid: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Project patches to the hidden dim and add gathered 2-D PEs."""
    x = nn.dense(params["projection"], patches.astype(compute_dtype))
    pe = pe_ops.gather_pe(params["pos_embedding"].astype(compute_dtype), pe_idx, pe_w)
    x = x + pe
    # zero padded rows so downstream ops see deterministic values
    return jnp.where(valid[..., None], x, 0.0).astype(compute_dtype)


def encode(params: Params, cfg: EncoderConfig, patches, pe_idx, pe_w, valid,
           compute_dtype=jnp.float32, rng=None, deterministic: bool = True,
           remat=False, frozen_stop_gradient: bool = False):
    """Full encoder forward on a packed batch.

    Returns (latent (B, L, E), valid (B, L)). When
    ``frozen_stop_gradient=True`` and ``cfg.fine_tune_depth > 0``, gradients
    are cut after the frozen prefix of layers, mirroring the reference's
    frozen_blocks (models.py:362-367) without duplicating parameters.
    """
    x = embed_patches(params, patches, pe_idx, pe_w, valid, compute_dtype)
    bias = nn.MaskSpec(key_valid=valid)
    blocks = params["blocks"]
    # fine_tune_depth=0 is overloaded: as the EncoderConfig default it means
    # "no fine-tune split" (MAE pretraining trains the whole stack), but under
    # frozen_stop_gradient=True it means "whole encoder frozen" — matching
    # encoder_llrd_scales (parallel/trainer.py:98) and GRPO's frozen-encoder
    # rollouts. Without this, a caller relying on frozen_stop_gradient alone
    # would silently train (and pay the backward for) a nominally frozen
    # encoder (round-4 advisor finding).
    n_frozen = cfg.num_layers - cfg.fine_tune_depth \
        if (cfg.fine_tune_depth or frozen_stop_gradient) else 0
    if frozen_stop_gradient and n_frozen >= cfg.num_layers:
        x = transformer.encoder_stack(blocks, x, bias, cfg.num_heads,
                                      0.0, None, True, remat)
        x = jax.lax.stop_gradient(x)
    elif 0 < n_frozen < cfg.num_layers:
        frozen = transformer.stack_slice(blocks, 0, n_frozen)
        tune = transformer.stack_slice(blocks, n_frozen, cfg.num_layers)
        x = transformer.encoder_stack(frozen, x, bias, cfg.num_heads,
                                      0.0, None, True, remat)
        if frozen_stop_gradient:
            x = jax.lax.stop_gradient(x)
        x = transformer.encoder_stack(tune, x, bias, cfg.num_heads,
                                      cfg.dropout, rng, deterministic, remat)
    else:
        x = transformer.encoder_stack(blocks, x, bias, cfg.num_heads,
                                      cfg.dropout, rng, deterministic, remat)
    x = nn.layernorm(params["final_norm"], x, eps=1e-6)
    return x, valid


# ---------------------------------------------------------------------------
# MAE masking (device-side, static shapes)
# ---------------------------------------------------------------------------

def mae_keep_len(length: int | np.ndarray, mask_ratio: float):
    """len_keep = int(L * (1 - mask_ratio)) — exact reference rounding
    (models.py:109)."""
    return (np.asarray(length) * (1.0 - mask_ratio)).astype(np.int32)


@dataclasses.dataclass
class MaeMask:
    """Device tensors describing one batch's random masking."""
    ids_keep: jnp.ndarray      # (B, K) indices of kept patches (into 0..L)
    kept_valid: jnp.ndarray    # (B, K) True where a real kept patch
    ids_restore: jnp.ndarray   # (B, L) inverse shuffle permutation
    seq_mask: jnp.ndarray      # (B, L) True = patch was masked out (in orig order)
    keep_lengths: jnp.ndarray  # (B,) number of kept patches per example


def mae_mask(rng, valid: jnp.ndarray, lengths: jnp.ndarray,
             mask_ratio: float, keep_bucket: int,
             noise: jnp.ndarray | None = None) -> MaeMask:
    """Vectorized per-example shuffle/mask (reference: models.py:106-125).

    valid: (B, L) patch validity; lengths: (B,) true lengths. ``keep_bucket``
    is the static K dimension (>= max keep length in the batch). Padding
    positions receive +inf noise so each example's argsort orders its real
    patches (randomly) first; the first ``keep_len[i]`` shuffled slots are the
    kept patches, exactly the reference's semantics with static shapes.

    ``noise``: optional (B, L) shuffle noise overriding the rng draw — used
    by the reference-identity proof (tools/reference_identity.py) to drive
    this and the reference's ``torch.rand``-based ``mask_sequence``
    (models.py:106-125) with the same permutation.
    """
    b, l = valid.shape
    if noise is None:
        noise = jax.random.uniform(rng, (b, l))
    noise = jnp.asarray(noise, jnp.float32)
    noise = jnp.where(valid, noise, jnp.inf)
    ids_shuffle = jnp.argsort(noise, axis=-1)           # (B, L) valid-first random order
    ids_restore = jnp.argsort(ids_shuffle, axis=-1)     # inverse permutation

    # keep length via a host-built float64 table (mae_keep_len = the
    # reference's int(L * (1 - mask_ratio)) rounding, models.py:109): fp32
    # on-device floor can round UP across an integer boundary for
    # mask_ratios that aren't exactly representable — e.g. L=1000, r=0.9:
    # reference keeps 99, fp32 floor(1000 * 0.100000001) keeps 100
    # (round-5 review; the default 0.75 is exact, which hid it)
    keep_table = jnp.asarray(mae_keep_len(np.arange(l + 1), mask_ratio))
    keep_lengths = keep_table[lengths]
    ids_keep = ids_shuffle[:, :keep_bucket]
    col = jnp.arange(keep_bucket)[None, :]
    kept_valid = col < keep_lengths[:, None]

    # seq_mask in original order: True where the patch was masked (valid but
    # not kept). Shuffled-order mask: slot j is kept iff j < keep_len.
    shuf_col = jnp.arange(l)[None, :]
    shuffled_masked = shuf_col >= keep_lengths[:, None]  # True = masked-or-padding slot
    seq_mask = jnp.take_along_axis(shuffled_masked, ids_restore, axis=-1)
    seq_mask = seq_mask & valid
    return MaeMask(ids_keep, kept_valid, ids_restore, seq_mask, keep_lengths)


def gather_kept(x: jnp.ndarray, mask: MaeMask) -> jnp.ndarray:
    """Select kept patches: (B, L, D) -> (B, K, D), padded slots zeroed."""
    out = jnp.take_along_axis(x, mask.ids_keep[..., None], axis=1)
    return jnp.where(mask.kept_valid[..., None], out, 0.0)
