"""Masked Autoencoder pretraining model.

Capability parity with the reference ``MAE`` / ``MAEDecoder`` / ``MAELoss``
(reference: acai_omr/models/models.py:182-288), TPU-first: the whole
mask -> encode(visible) -> unshuffle(+mask tokens) -> decode -> pixel loss
pipeline is a single jittable function over static-shape packed batches; the
per-image unpad/append/unshuffle Python loop of ``prepare_for_decoder``
(models.py:219-241) becomes two vectorized gathers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import nn, transformer
from ..ops import pe as pe_ops
from . import vit_encoder
from .vit_encoder import EncoderConfig

Params = dict


@dataclasses.dataclass(frozen=True)
class MaeConfig:
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    mask_ratio: float = 0.75
    decoder_num_layers: int = 8
    decoder_hidden_dim: int = 512
    decoder_num_heads: int = 16
    decoder_mlp_dim: int = 3072

    @property
    def patch_size(self) -> int:
        return self.encoder.patch_size


def init_mae_params(key, cfg: MaeConfig, dtype=jnp.float32) -> Params:
    kenc, kemb, kdec, kun, kmask, kdpe = jax.random.split(key, 6)
    e_enc = cfg.encoder.hidden_dim
    e_dec = cfg.decoder_hidden_dim
    return {
        "encoder": vit_encoder.init_encoder_params(kenc, cfg.encoder, dtype),
        "decoder_embed": nn.dense_init(kemb, e_enc, e_dec, dtype),
        "decoder_blocks": transformer.stack_init(
            transformer.encoder_layer_init, kdec, cfg.decoder_num_layers,
            e_dec, cfg.decoder_mlp_dim, dtype),
        "decoder_norm": nn.layernorm_init(e_dec, dtype),
        "decoder_unembed": nn.dense_init(kun, e_dec, cfg.encoder.patch_dim, dtype),
        "mask_token": nn.trunc_normal(kmask, (e_dec,), std=0.1, dtype=dtype),
        "decoder_pos_embedding": nn.trunc_normal(
            kdpe, (cfg.encoder.pe_max_height, cfg.encoder.pe_max_width, e_dec),
            std=0.1, dtype=dtype),
    }


def keep_bucket_len(seq_bucket: int, mask_ratio: float, multiple: int = 128) -> int:
    """Static K dimension for the kept-patch sequence of a given L bucket."""
    import math
    k = math.ceil(seq_bucket * (1.0 - mask_ratio))
    return max(multiple, -(-k // multiple) * multiple)


def forward(params: Params, cfg: MaeConfig, rng, patches, pe_idx, pe_w, valid,
            lengths, target_patches, *, compute_dtype=jnp.float32,
            deterministic: bool = True, dropout_rng=None, remat: bool = False,
            mask_noise=None):
    """Full MAE forward on a packed batch.

    patches/pe_idx/pe_w/valid/lengths come from ``vit_encoder.batchify``;
    target_patches is the independently patchified (possibly un-augmented)
    target image batch (reference forward: models.py:249-269).

    Returns (pred (B, L, P*P), loss_mask (B, L) bool, normalized target ready
    for :func:`mae_loss`).
    """
    enc_cfg = cfg.encoder
    l = patches.shape[1]
    kb = min(l, keep_bucket_len(l, cfg.mask_ratio))

    # --- mask + encode visible patches ------------------------------------
    mask = vit_encoder.mae_mask(rng, valid, lengths, cfg.mask_ratio, kb,
                                noise=mask_noise)
    x = vit_encoder.embed_patches(params["encoder"], patches, pe_idx, pe_w,
                                  valid, compute_dtype)
    x_kept = vit_encoder.gather_kept(x, mask)                       # (B, K, E)
    bias = nn.MaskSpec(key_valid=mask.kept_valid)
    latent = transformer.encoder_stack(
        params["encoder"]["blocks"], x_kept, bias, enc_cfg.num_heads,
        enc_cfg.dropout, dropout_rng, deterministic, remat=remat)
    latent = nn.layernorm(params["encoder"]["final_norm"], latent, eps=1e-6)

    # --- project to decoder space, unshuffle with mask tokens -------------
    latent = nn.dense(params["decoder_embed"], latent)              # (B, K, Ed)
    b = latent.shape[0]
    ed = cfg.decoder_hidden_dim
    # shuffled-order full sequence: slot j < keep_len -> encoded latent j,
    # else mask token. Padded slots beyond each image's length are junk but
    # masked out of attention and loss.
    latent_padded = jnp.zeros((b, l, ed), latent.dtype).at[:, :kb, :].set(latent)
    shuf_col = jnp.arange(l)[None, :, None]
    keep_len = mask.keep_lengths[:, None, None]
    mask_tok = params["mask_token"].astype(latent.dtype)
    full_shuffled = jnp.where(shuf_col < keep_len, latent_padded,
                              mask_tok[None, None, :])
    x_full = jnp.take_along_axis(full_shuffled, mask.ids_restore[..., None], axis=1)

    # decoder PE: same grid addressing as the encoder, decoder-width grid
    dpe = pe_ops.gather_pe(params["decoder_pos_embedding"].astype(x_full.dtype),
                           pe_idx, pe_w)
    x_full = x_full + dpe

    # --- decode over the full (unshuffled) sequence -----------------------
    dec_bias = nn.MaskSpec(key_valid=valid)
    hidden = transformer.encoder_stack(
        params["decoder_blocks"], x_full, dec_bias, cfg.decoder_num_heads,
        0.0, None, True, remat=remat)
    hidden = nn.layernorm(params["decoder_norm"], hidden, eps=1e-6)
    pred = nn.dense(params["decoder_unembed"], hidden)              # (B, L, P*P)

    # mae_mask already intersects seq_mask with validity (vit_encoder.py)
    loss_mask = mask.seq_mask
    return pred.astype(jnp.float32), loss_mask, target_patches


def mae_loss(pred: jnp.ndarray, loss_mask: jnp.ndarray,
             target: jnp.ndarray, reduction: str = "mean"):
    """Per-patch-normalized masked pixel MSE, exact reference formula
    including the ``var + 1e-6`` (not std) normalizer and unbiased variance
    (reference: models.py:271-288 — kept bit-for-bit for loss parity, 0.159).

    ``reduction="sum"`` returns ``(loss_sum, patch_count)`` for exact
    data-parallel reduction (psum both across shards, then divide).
    """
    target = target.astype(jnp.float32)
    mean = jnp.mean(target, axis=-1, keepdims=True)
    n = target.shape[-1]
    var = jnp.sum(jnp.square(target - mean), axis=-1, keepdims=True) / (n - 1)
    target = (target - mean) / jnp.sqrt(var + 1.0e-6)

    loss = jnp.mean(jnp.square(pred - target), axis=-1)  # (B, L)
    loss_mask = loss_mask.astype(jnp.float32)
    if reduction == "sum":
        return jnp.sum(loss * loss_mask), jnp.sum(loss_mask)
    # zero-masked batches (tiny images / mask_ratio~0) contribute 0, not
    # 0/0 = NaN (same guard omr_ce_loss carries)
    return jnp.sum(loss * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)
