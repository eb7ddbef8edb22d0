"""ViTOMR: ViT encoder -> transition head -> LMX decoder.

Capability parity with the reference's ``ViTOMR`` family —
``TeacherForcedViTOMR``, ``ScheduledSamplingViTOMR``, ``GRPOViTOMR``
(reference: acai_omr/models/models.py:542-1049) — as one parameter pytree and
a set of pure forward functions. The torch subclass tower collapses into
config flags + optimizer masks:

* MAE -> encoder weight transfer is plain pytree surgery
  (:func:`vitomr_params_from_mae`) instead of regex state-dict renumbering
  (models.py:679-713): stacked layers make the frozen/fine-tune split a slice.
* freezing policies (frozen blocks, GRPO's frozen encoder+head,
  models.py:668-677, 850-859) are optax masks built from
  :func:`trainable_mask` in parallel/trainer.py.
* greedy / sampled generation delegates to :mod:`acai_omr_tpu.models.decode`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import nn
from . import decode as decode_lib
from . import omr_decoder, vit_encoder
from .omr_decoder import DecoderConfig
from .vit_encoder import EncoderConfig

Params = dict


@dataclasses.dataclass(frozen=True)
class ViTOMRConfig:
    encoder: EncoderConfig = dataclasses.field(
        default_factory=lambda: EncoderConfig(dropout=0.05, fine_tune_depth=12))
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    transition_head_dim: int = 4096
    transition_head_dropout: float = 0.05


def init_vitomr_params(key, cfg: ViTOMRConfig, dtype=jnp.float32) -> Params:
    kenc, kh1, kh2, kdec = jax.random.split(key, 4)
    return {
        "encoder": vit_encoder.init_encoder_params(kenc, cfg.encoder, dtype),
        "transition_head": {
            "linear1": nn.dense_init(kh1, cfg.encoder.hidden_dim,
                                     cfg.transition_head_dim, dtype),
            "linear2": nn.dense_init(kh2, cfg.transition_head_dim,
                                     cfg.decoder.hidden_dim, dtype),
        },
        "decoder": omr_decoder.init_decoder_params(kdec, cfg.decoder, dtype),
    }


def vitomr_params_from_mae(vitomr_params: Params, mae_params: Params) -> Params:
    """Transplant a pretrained MAE encoder into a ViTOMR param tree.

    Pytree analogue of ``create_omr_encoder_state_dict_from_mae``
    (reference: models.py:679-713): the encoder subtree is shared verbatim —
    frozen/fine-tune layer splitting needs no renaming because layers are a
    stacked array sliced at runtime.
    """
    out = dict(vitomr_params)
    out["encoder"] = mae_params["encoder"]  # shared verbatim (arrays immutable)
    return out


def transition_head(params: Params, x: jnp.ndarray, dropout_rate: float = 0.0,
                    rng=None, deterministic: bool = True) -> jnp.ndarray:
    """Linear(768->4096) -> GELU -> Dropout -> Linear(4096->1024)
    (reference: models.py:655-660)."""
    h = nn.gelu(nn.dense(params["linear1"], x))
    h = nn.dropout(rng, h, dropout_rate, deterministic)
    return nn.dense(params["linear2"], h)


def encode_image(params: Params, cfg: ViTOMRConfig, patches, pe_idx, pe_w,
                 valid, *, compute_dtype=jnp.float32, rng=None,
                 deterministic: bool = True, frozen_stop_gradient: bool = False,
                 remat=False):
    """Encoder + transition head -> (img_latent (B, L, E_dec), latent_valid)."""
    enc_rng = head_rng = None
    if rng is not None:
        enc_rng, head_rng = jax.random.split(rng)
    latent, latent_valid = vit_encoder.encode(
        params["encoder"], cfg.encoder, patches, pe_idx, pe_w, valid,
        compute_dtype=compute_dtype, rng=enc_rng, deterministic=deterministic,
        frozen_stop_gradient=frozen_stop_gradient, remat=remat)
    latent = transition_head(params["transition_head"], latent,
                             cfg.transition_head_dropout, head_rng, deterministic)
    return latent, latent_valid


# Jitted entry for EAGER call sites (inference drivers, GRPO rollout
# encoding). Inside already-jitted losses call encode_image directly; called
# eagerly, the unjitted version dispatches hundreds of individual ops — ~37 s
# per 16-image batch through the axon tunnel vs ~0.1 s compiled.
encode_image_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "deterministic",
                              "frozen_stop_gradient", "remat"))(encode_image)


def forward_teacher_forced(params: Params, cfg: ViTOMRConfig, patches, pe_idx,
                           pe_w, valid, input_seqs, lmx_valid, *,
                           compute_dtype=jnp.float32, rng=None,
                           deterministic: bool = True,
                           frozen_stop_gradient: bool = False,
                           remat=False) -> jnp.ndarray:
    """Image batch + right-shifted LMX -> (B, T, V) logits
    (reference: TeacherForcedViTOMR.forward, models.py:722-736)."""
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    img_latent, latent_valid = encode_image(
        params, cfg, patches, pe_idx, pe_w, valid, compute_dtype=compute_dtype,
        rng=enc_rng, deterministic=deterministic,
        frozen_stop_gradient=frozen_stop_gradient, remat=remat)
    # precompute the per-layer cross K/V like the scheduled-sampling path:
    # the fused Pallas decoder stack keys its fast path on mem_kv being
    # present, so without this the TF forward (and every eval pass) ran the
    # ~1.5x-slower XLA scan stack on qualifying shapes (round-5 review)
    from ..ops import transformer
    mem_kv = transformer.precompute_memory_kv(
        params["decoder"]["blocks"], img_latent.astype(compute_dtype))
    return omr_decoder.forward(
        params["decoder"], cfg.decoder, input_seqs, img_latent, lmx_valid,
        latent_valid, compute_dtype=compute_dtype, rng=dec_rng,
        deterministic=deterministic, remat=remat, mem_kv=mem_kv)


# ---------------------------------------------------------------------------
# scheduled sampling (reference: ScheduledSamplingViTOMR, models.py:798-838)
# ---------------------------------------------------------------------------

def gumbel_softmax(rng, logits: jnp.ndarray, tau: float, hard: bool) -> jnp.ndarray:
    """F.gumbel_softmax equivalent (straight-through when hard=True)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    y = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        # torch's straight-through op order: y_hard - y.detach() + y
        y = y_hard - jax.lax.stop_gradient(y) + y
    return y


def sample_and_mix_seqs(params: Params, rng, tf_input_seqs: jnp.ndarray,
                        tf_pred_logits: jnp.ndarray, teacher_forcing_prob: float,
                        sample_tau: float, use_hard_sampling: bool,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """Mix gold embeddings with gumbel-softmax expected embeddings of the
    first pass' predictions (reference: models.py:801-817)."""
    mix_rng, gumbel_rng = jax.random.split(rng)
    sampling_ratio = 1.0 - teacher_forcing_prob
    sample_mask = jax.random.uniform(mix_rng, tf_input_seqs.shape) < sampling_ratio

    table = params["decoder"]["vocab_embedding"]["table"].astype(compute_dtype)
    gold = nn.embed(params["decoder"]["vocab_embedding"], tf_input_seqs,
                    dtype=compute_dtype)                            # (B, T, E)

    distr = gumbel_softmax(gumbel_rng, tf_pred_logits, sample_tau, use_hard_sampling)
    expected = jnp.einsum("btv,ve->bte", distr.astype(compute_dtype), table)

    # right-shift predictions to align with right-shifted inputs: prepend the
    # <bos> embedding stem, drop the last step (models.py:811-814)
    bos_stem = gold[:, :1, :]
    expected = jnp.concatenate([bos_stem, expected[:, :-1, :]], axis=1)
    return jnp.where(sample_mask[..., None], expected, gold)


def forward_scheduled_sampling(params: Params, cfg: ViTOMRConfig, patches,
                               pe_idx, pe_w, valid, input_seqs, lmx_valid,
                               teacher_forcing_prob, sample_tau,
                               use_hard_sampling: bool, rng, *,
                               compute_dtype=jnp.float32,
                               deterministic: bool = False,
                               frozen_stop_gradient: bool = True,
                               remat=False) -> jnp.ndarray:
    """Two-pass scheduled-sampling forward (models.py:819-834):
    teacher-forced logits -> gumbel-mixed embeddings -> second decoder pass."""
    enc_rng, dec1_rng, mix_rng, dec2_rng = jax.random.split(rng, 4)
    img_latent, latent_valid = encode_image(
        params, cfg, patches, pe_idx, pe_w, valid, compute_dtype=compute_dtype,
        rng=enc_rng, deterministic=deterministic,
        frozen_stop_gradient=frozen_stop_gradient, remat=remat)
    # both decoder passes cross-attend to the same memory with the same
    # weights: project the per-layer cross K/V once and share (saves a full
    # set of memory projections, ~1.2 TFLOP/step fwd+bwd at flagship shapes)
    from ..ops import transformer
    mem_kv = transformer.precompute_memory_kv(
        params["decoder"]["blocks"], img_latent.astype(compute_dtype))
    tf_logits = omr_decoder.forward(
        params["decoder"], cfg.decoder, input_seqs, img_latent, lmx_valid,
        latent_valid, compute_dtype=compute_dtype, rng=dec1_rng,
        deterministic=deterministic, remat=remat, mem_kv=mem_kv)
    mixed = sample_and_mix_seqs(params, mix_rng, input_seqs, tf_logits,
                                teacher_forcing_prob, sample_tau,
                                use_hard_sampling, compute_dtype)
    return omr_decoder.forward(
        params["decoder"], cfg.decoder, mixed, img_latent, lmx_valid,
        latent_valid, token_idxs_input=False, compute_dtype=compute_dtype,
        rng=dec2_rng, deterministic=deterministic, remat=remat, mem_kv=mem_kv)


def omr_ce_loss(logits: jnp.ndarray, target_seqs: jnp.ndarray, pad_idx: int,
                label_smoothing: float = 0.0, reduction: str = "mean"):
    """Cross entropy with ignore_index=pad (reference: models.py:784-796).

    ``reduction="sum"`` returns ``(nll_sum, token_count)`` — the building
    block for exact data-parallel loss: shards psum both and divide, which
    equals the single-device masked mean regardless of per-shard token
    counts (per-shard means averaged would not).
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_seqs[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = (target_seqs != pad_idx).astype(jnp.float32)
    if reduction == "sum":
        return jnp.sum(nll * mask), jnp.sum(mask)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# generation entry points
# ---------------------------------------------------------------------------

def generate_next_token_distr(params: Params, cfg: ViTOMRConfig,
                              img_latent: jnp.ndarray, seqs: jnp.ndarray,
                              compute_dtype=jnp.float32,
                              latent_valid: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Beam-search-ready next-token distribution (reference:
    TeacherForcedViTOMR.generate, models.py:749-757): expand a single image
    latent across ``seqs.shape[0]`` candidate sequences and return log probs
    of the next token for each.

    ``latent_valid``: (1, M) latent validity — REQUIRED when the latent
    comes from a padded batchify (bucket-pad rows carry nonzero
    post-encoder values; without the mask the decoder cross-attends them
    and the distribution is contaminated — round-5 review). The reference
    equivalent operated on unpadded per-image latents, so it had no such
    parameter."""
    num_seqs = seqs.shape[0]
    latent = jnp.broadcast_to(img_latent,
                              (num_seqs,) + img_latent.shape[1:])
    if latent_valid is not None:
        latent_valid = jnp.broadcast_to(
            latent_valid, (num_seqs,) + latent_valid.shape[1:])
    logits = omr_decoder.forward(params["decoder"], cfg.decoder, seqs, latent,
                                 None, latent_valid,
                                 compute_dtype=compute_dtype)
    return jax.nn.log_softmax(logits[:, -1, :], axis=-1)


def cached_greedy_generate(params: Params, cfg: ViTOMRConfig, img_latent,
                           latent_valid=None, max_len: int = 1536, **kwargs):
    """(seqs, log_probs, seq_mask) — reference models.py:600-615."""
    return decode_lib.generate(params["decoder"], cfg.decoder, img_latent,
                               latent_valid, max_len=max_len, **kwargs)


def cached_beam_generate(params: Params, cfg: ViTOMRConfig, img_latent,
                         latent_valid=None, beam_size: int = 4,
                         max_len: int = 1536, **kwargs):
    """Beam-search decode (capability extension; the reference is greedy-only
    with a beam-ready uncached ``generate``, models.py:749-757). Returns
    (seqs, log_probs, seq_mask) of the best length-normalized beam."""
    return decode_lib.beam_generate(params["decoder"], cfg.decoder, img_latent,
                                    latent_valid, beam_size=beam_size,
                                    max_len=max_len, **kwargs)


def expand_img_latent_for_rollout(img_latent, latent_valid, group_size: int):
    """(B, T, E) -> (B*G, T, E) rollout expansion (models.py:883-891)."""
    latent = jnp.repeat(img_latent, group_size, axis=0)
    valid = jnp.repeat(latent_valid, group_size, axis=0)
    return latent, valid


def forward_rollout_policy(params: Params, cfg: ViTOMRConfig, img_latent,
                           latent_valid, rng, max_actions: int = 768,
                           top_k: int = 50, temperature: float = 1.1,
                           group_size: int = 1, mesh=None, **kwargs):
    """Sampled rollouts with KV caching (models.py:988-1049).

    ``group_size=G > 1`` decodes G rollouts per image from the UNEXPANDED
    latent via grouped cross-attention (decode ``mem_group``): identical
    output order to ``expand_img_latent_for_rollout`` + G-times-replicated
    decode, but the cross K/V are projected and streamed once per unique
    image instead of once per rollout. ``mesh``: shard the images over the
    mesh's data axis and run per-device decode loops
    (:func:`decode.sharded_generate` — keeps the monolith kernel per chip).
    """
    sampling = decode_lib.SamplingConfig(top_k=top_k, temperature=temperature)
    if mesh is not None:
        return decode_lib.sharded_generate(
            params["decoder"], cfg.decoder, img_latent, latent_valid, mesh,
            max_len=max_actions, sampling=sampling, rng=rng,
            mem_group=group_size, **kwargs)
    return decode_lib.generate(params["decoder"], cfg.decoder, img_latent,
                               latent_valid, max_len=max_actions,
                               sampling=sampling, rng=rng,
                               mem_group=group_size, **kwargs)


def batch_policy_inference(params: Params, cfg: ViTOMRConfig, imgs, rng,
                           max_actions: int = 768, top_k: int = 50,
                           temperature: float = 1.1,
                           compute_dtype=jnp.bfloat16, **kwargs):
    """Encode a ragged image list and run one sampled rollout per example
    (reference: GRPOViTOMR.batch_policy_inference, models.py:962-965)."""
    pb = vit_encoder.batchify(imgs, cfg.encoder)
    latent, latent_valid = encode_image_jit(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), compute_dtype=compute_dtype)
    return forward_rollout_policy(params, cfg, latent, latent_valid, rng,
                                  max_actions, top_k, temperature,
                                  compute_dtype=compute_dtype, **kwargs)
