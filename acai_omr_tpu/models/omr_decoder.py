"""LMX transformer decoder (teacher-forced / full-sequence paths).

Capability parity with the reference ``OMRDecoder`` (reference:
acai_omr/models/models.py:378-528): learned token + 1-D positional embeddings,
12 post-norm decoder layers (1024 dim, 16 heads, 4096 MLP), cross-attention to
the encoder latent, tied to the 227-token LMX vocabulary. The KV-cached
autoregressive path lives in :mod:`acai_omr_tpu.models.decode`; this module
covers the dense full-sequence forward used by training and by
parity tests (scan-decode ≡ full forward).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import nn, transformer
from ..data.tokenizer import LmxTokenizer

Params = dict


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    max_lmx_seq_len: int = 1536
    vocab_size: int = 227
    num_layers: int = 12
    hidden_dim: int = 1024
    num_heads: int = 16
    mlp_dim: int = 4096
    dropout: float = 0.1
    pad_idx: int = 1
    bos_idx: int = 0
    eos_idx: int = 2

    @classmethod
    def from_tokenizer(cls, tok: LmxTokenizer, **kwargs) -> "DecoderConfig":
        return cls(vocab_size=tok.vocab_size, pad_idx=tok.pad_idx,
                   bos_idx=tok.bos_idx, eos_idx=tok.eos_idx, **kwargs)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


def init_decoder_params(key, cfg: DecoderConfig, dtype=jnp.float32) -> Params:
    kv, kp, kb, ku = jax.random.split(key, 4)
    return {
        "vocab_embedding": nn.embedding_init(kv, cfg.vocab_size, cfg.hidden_dim,
                                             pad_idx=cfg.pad_idx, dtype=dtype),
        "pos_embedding": nn.trunc_normal(kp, (cfg.max_lmx_seq_len, cfg.hidden_dim),
                                         std=0.1, dtype=dtype),
        "blocks": transformer.stack_init(transformer.decoder_layer_init, kb,
                                         cfg.num_layers, cfg.hidden_dim,
                                         cfg.mlp_dim, dtype),
        "final_norm": nn.layernorm_init(cfg.hidden_dim, dtype),
        "unembed": nn.dense_init(ku, cfg.hidden_dim, cfg.vocab_size, dtype),
    }


def embed_tokens(params: Params, seqs: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) token ids -> (B, T, E) embeddings + positional slice."""
    t = seqs.shape[1]
    x = nn.embed(params["vocab_embedding"], seqs, dtype=compute_dtype)
    return x + params["pos_embedding"][:t].astype(compute_dtype)[None]


def forward(params: Params, cfg: DecoderConfig, input_seqs: jnp.ndarray,
            img_latent: jnp.ndarray, lmx_valid: jnp.ndarray | None,
            latent_valid: jnp.ndarray | None, *, token_idxs_input: bool = True,
            compute_dtype=jnp.float32, rng=None, deterministic: bool = True,
            remat=False, mem_kv: jnp.ndarray | None = None,
            cross_group: int = 1) -> jnp.ndarray:
    """Teacher-forced forward -> (B, T, V) logits.

    input_seqs: (B, T) int32 right-shifted token ids, or (B, T, E) mixed
    embeddings when ``token_idxs_input=False`` (scheduled sampling feeds
    expected embeddings, reference: models.py:459-462). Masks are *validity*
    (True = attend), the complement of the reference's padding masks.
    ``mem_kv``: optional (L, B, Tm, 2E) precomputed cross K/V
    (transformer.precompute_memory_kv) — scheduled sampling computes it once
    and shares it across its two decoder passes.
    ``cross_group``: G > 1 for GRPO's group-expanded rollouts — input_seqs
    has B rows but img_latent/latent_valid/mem_kv carry only the B/G unique
    memory rows (rollouts of one image are contiguous); cross-attention
    folds the group into the query axis (transformer.decoder_layer).
    """
    if input_seqs.ndim == 2 and input_seqs.shape[1] > cfg.max_lmx_seq_len:
        raise ValueError(
            f"{input_seqs.shape[1]} long lmx sequence length is too long for "
            f"max sequence length of {cfg.max_lmx_seq_len}")

    if token_idxs_input:
        x = embed_tokens(params, input_seqs, compute_dtype)
    else:
        t = input_seqs.shape[1]
        x = input_seqs.astype(compute_dtype) + params["pos_embedding"][:t].astype(compute_dtype)[None]

    t = x.shape[1]
    self_bias = nn.MaskSpec(key_valid=lmx_valid, causal=True)
    cross_bias = (nn.MaskSpec(key_valid=latent_valid)
                  if latent_valid is not None else None)

    mem = img_latent.astype(compute_dtype)
    x = transformer.decoder_stack(params["blocks"], x, mem, self_bias, cross_bias,
                                  cfg.num_heads, cfg.dropout, rng, deterministic,
                                  remat, mem_kv=mem_kv, cross_group=cross_group)
    x = nn.layernorm(params["final_norm"], x, eps=1e-6)
    logits = nn.dense(params["unembed"], x)
    return logits.astype(jnp.float32)


def batchify_and_split_lmx_seqs(lmx_seqs, pad_idx: int, bucket_multiple: int = 128,
                                max_len: int | None = None):
    """Pad ragged LMX id sequences and split into (input, target, valid).

    Host-side analogue of the reference's nested-tensor pad + right/left shift
    (reference: models.py:531-540): input = seq[:-1], target = seq[1:],
    valid True where the *input* token is not padding. Pads to a static shape
    bucket so one program serves similar batches.
    """
    import numpy as np
    from .vit_encoder import bucket_len

    lens = [len(s) for s in lmx_seqs]
    tmax = bucket_len(max(lens) - 1, bucket_multiple)
    if max_len is not None:
        # never bucket past the decoder's PE table; real sequences longer than
        # max_len still raise downstream, matching the reference guard
        # (models.py:457-458)
        tmax = min(tmax, max(max_len, max(lens) - 1))
    b = len(lmx_seqs)
    inputs = np.full((b, tmax), pad_idx, dtype=np.int32)
    targets = np.full((b, tmax), pad_idx, dtype=np.int32)
    valid = np.zeros((b, tmax), dtype=bool)
    for i, s in enumerate(lmx_seqs):
        s = np.asarray(s, dtype=np.int32)
        n = len(s) - 1
        inputs[i, :n] = s[:-1]
        targets[i, :n] = s[1:]
        valid[i, :n] = True
    return inputs, targets, valid
