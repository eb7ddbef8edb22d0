"""Numerical parity vs PyTorch modules built from the *public* torch API.

The reference's entire model family is assembled from nn.TransformerEncoder /
nn.TransformerDecoder / nn.Unfold / F.interpolate. These tests build such
modules directly (never importing the reference), transfer the weights into
our pytrees via models.torch_compat, and assert fp32 forward agreement — the
weight-transfer parity gate of SURVEY.md §7 step 3.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from acai_omr_tpu.models import torch_compat
from acai_omr_tpu.ops import nn as jnn
from acai_omr_tpu.ops import patchify as patch_ops
from acai_omr_tpu.ops import pe as pe_ops
from acai_omr_tpu.ops import transformer as tfm

ATOL, RTOL = 2e-5, 2e-5


def torch_encoder(num_layers=2, dim=32, heads=4, mlp=64):
    torch.manual_seed(0)
    return tnn.TransformerEncoder(
        tnn.TransformerEncoderLayer(d_model=dim, nhead=heads, dim_feedforward=mlp,
                                    dropout=0.0, activation="gelu", batch_first=True),
        num_layers=num_layers,
        norm=tnn.LayerNorm(dim, eps=1e-6),
    )


def torch_decoder(num_layers=2, dim=32, heads=4, mlp=64):
    torch.manual_seed(1)
    return tnn.TransformerDecoder(
        tnn.TransformerDecoderLayer(d_model=dim, nhead=heads, dim_feedforward=mlp,
                                    dropout=0.0, activation="gelu", batch_first=True),
        num_layers=num_layers,
        norm=tnn.LayerNorm(dim, eps=1e-6),
    )


def test_patchify_matches_unfold(rng):
    img = rng.random((1, 48, 64), dtype=np.float32)
    p = 16
    unfold = tnn.Unfold(kernel_size=p, stride=p)
    ref = unfold(torch.from_numpy(img)[None])  # (1, P*P, L)
    ref = ref[0].T.numpy()                     # (L, P*P)
    ours = patch_ops.patchify(img, p)
    np.testing.assert_allclose(ours, ref, atol=1e-7)

    # unpatchify inverts
    back = patch_ops.unpatchify(ours, 3, 4, p)
    np.testing.assert_allclose(back, img, atol=1e-7)


def test_pe_bilinear_matches_torch_interpolate(rng):
    pe = rng.random((6, 9, 8), dtype=np.float32)
    hp, wp = 11, 5  # oversize height, undersize width -> full-grid resize
    ref = F.interpolate(torch.from_numpy(pe).permute(2, 0, 1)[None],
                        size=(hp, wp), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).reshape(-1, 8).numpy()
    idx, w = pe_ops.bilinear_indices(hp, wp, 6, 9)
    ours = np.asarray(pe_ops.gather_pe(jnp.asarray(pe), jnp.asarray(idx), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pe_slice(rng):
    pe = rng.random((6, 9, 8), dtype=np.float32)
    idx, w = pe_ops.slice_indices(4, 3, 9)
    ours = np.asarray(pe_ops.gather_pe(jnp.asarray(pe), jnp.asarray(idx), jnp.asarray(w)))
    np.testing.assert_allclose(ours, pe[:4, :3].reshape(-1, 8), atol=1e-7)


def test_encoder_stack_matches_torch(rng):
    enc = torch_encoder().eval()
    sd = enc.state_dict()
    layers = [torch_compat.encoder_layer_from_torch(sd, f"layers.{i}") for i in range(2)]
    stacked = torch_compat._stack(layers)
    final_norm = torch_compat._norm(sd, "norm")

    b, t, d = 3, 10, 32
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([10, 7, 4])
    pad_mask = np.arange(t)[None, :] >= lens[:, None]  # torch: True = pad

    with torch.no_grad():
        ref = enc(torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(pad_mask)).numpy()

    valid = jnp.asarray(~pad_mask)
    out = tfm.encoder_stack(stacked, jnp.asarray(x), jnn.valid_to_bias(valid), 4)
    out = jnn.layernorm(final_norm, out, eps=1e-6)
    out = np.asarray(out)
    # padded query rows diverge (torch fills them with garbage too); compare valid rows
    for i in range(b):
        np.testing.assert_allclose(out[i, :lens[i]], ref[i, :lens[i]], atol=ATOL, rtol=RTOL)


def test_decoder_stack_matches_torch(rng):
    dec = torch_decoder().eval()
    sd = dec.state_dict()
    layers = [torch_compat.decoder_layer_from_torch(sd, f"layers.{i}") for i in range(2)]
    stacked = torch_compat._stack(layers)
    final_norm = torch_compat._norm(sd, "norm")

    b, t, m, d = 2, 6, 9, 32
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    mem = rng.standard_normal((b, m, d)).astype(np.float32)
    tgt_lens = np.array([6, 4])
    mem_lens = np.array([9, 5])
    tgt_pad = np.arange(t)[None, :] >= tgt_lens[:, None]
    mem_pad = np.arange(m)[None, :] >= mem_lens[:, None]
    causal = torch.triu(torch.ones(t, t), diagonal=1).bool()

    with torch.no_grad():
        ref = dec(torch.from_numpy(x), memory=torch.from_numpy(mem),
                  tgt_mask=causal,
                  tgt_key_padding_mask=torch.from_numpy(tgt_pad),
                  memory_key_padding_mask=torch.from_numpy(mem_pad)).numpy()

    self_bias = jnn.combine_bias(jnn.causal_bias(t), jnn.valid_to_bias(jnp.asarray(~tgt_pad)))
    cross_bias = jnn.valid_to_bias(jnp.asarray(~mem_pad))
    out = tfm.decoder_stack(stacked, jnp.asarray(x), jnp.asarray(mem),
                            self_bias, cross_bias, 4)
    out = np.asarray(jnn.layernorm(final_norm, out, eps=1e-6))
    for i in range(b):
        np.testing.assert_allclose(out[i, :tgt_lens[i]], ref[i, :tgt_lens[i]],
                                   atol=ATOL, rtol=RTOL)


def test_mha_cross_attention_matches_torch(rng):
    torch.manual_seed(2)
    mha_t = tnn.MultiheadAttention(32, 4, dropout=0.0, batch_first=True).eval()
    params = {
        "in_kernel": mha_t.in_proj_weight.detach().numpy().T,
        "in_bias": mha_t.in_proj_bias.detach().numpy(),
        "out": {"kernel": mha_t.out_proj.weight.detach().numpy().T,
                "bias": mha_t.out_proj.bias.detach().numpy()},
    }
    q = rng.standard_normal((2, 5, 32)).astype(np.float32)
    kv = rng.standard_normal((2, 7, 32)).astype(np.float32)
    kp = np.zeros((2, 7), dtype=bool)
    kp[1, 5:] = True
    with torch.no_grad():
        ref, _ = mha_t(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
                       key_padding_mask=torch.from_numpy(kp))
    bias = jnn.valid_to_bias(jnp.asarray(~kp))
    out = jnn.mha(params, jnp.asarray(q), jnp.asarray(kv), 4, bias)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=ATOL, rtol=RTOL)
