"""Weight-transfer parity against the reference's real debug MAE checkpoint.

Loads /root/reference/debug_pretrained_mae.pth (tiny 2-layer/dim-10 MAE the
reference uses for deterministic tests, reference: config.py:10,
tests/test_pre_train.py:12-15), converts it with models.torch_compat, and
checks our forward math against torch modules loaded with the same weights
(public torch API only). Skipped when the reference snapshot isn't mounted.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_PTH = Path("/root/reference/debug_pretrained_mae.pth")
pytestmark = pytest.mark.skipif(not REF_PTH.exists(),
                                reason="reference checkpoint not available")


@pytest.fixture(scope="module")
def converted():
    import torch
    from acai_omr_tpu.models import torch_compat
    sd = torch.load(REF_PTH, map_location="cpu")
    params = torch_compat.mae_params_from_torch(sd)
    return sd, params


def test_conversion_complete(converted):
    sd, params = converted
    n_torch = sum(v.numel() for v in sd.values())
    n_ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n_ours == n_torch


def test_encoder_forward_parity_real_weights(converted, rng):
    """Our packed-batch encoder ≡ torch TransformerEncoder on the transferred
    debug weights, full (unmasked) patch sequences, ragged batch."""
    import torch
    from torch import nn as tnn
    from acai_omr_tpu.models import vit_encoder
    from acai_omr_tpu.models.vit_encoder import EncoderConfig

    sd, params = converted
    cfg = EncoderConfig(patch_size=16, pe_max_height=60, pe_max_width=200,
                        num_layers=2, hidden_dim=10, num_heads=1, mlp_dim=1)

    # torch encoder from the same weights (public modules only)
    enc = tnn.TransformerEncoder(
        tnn.TransformerEncoderLayer(d_model=10, nhead=1, dim_feedforward=1,
                                    dropout=0.0, activation="gelu",
                                    batch_first=True),
        num_layers=2, norm=tnn.LayerNorm(10, eps=1e-6))
    enc_sd = {k[len("encoder.encoder_blocks."):]: v for k, v in sd.items()
              if k.startswith("encoder.encoder_blocks.")}
    enc.load_state_dict(enc_sd)
    enc.eval()
    proj_w = sd["encoder.projection.weight"]
    proj_b = sd["encoder.projection.bias"]
    pos = sd["encoder.pos_embedding"]

    imgs = [rng.random((1, 48, 64), dtype=np.float32),
            rng.random((1, 32, 32), dtype=np.float32)]
    pb = vit_encoder.batchify(imgs, cfg, bucket_multiple=4)

    # torch path: per-image patchify -> project -> +PE slice -> encoder
    import torch.nn.functional as F
    refs = []
    for img in imgs:
        t = torch.from_numpy(img)[None]
        u = F.unfold(t, kernel_size=16, stride=16)[0].T  # (L, 256)
        hp, wp = img.shape[-2] // 16, img.shape[-1] // 16
        x = u @ proj_w.T + proj_b
        x = x + pos[:hp, :wp].reshape(-1, 10)
        with torch.no_grad():
            refs.append(enc(x[None]).numpy()[0])

    latent, valid = vit_encoder.encode(
        params["encoder"], cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid))
    latent = np.asarray(latent)
    for i, ref in enumerate(refs):
        n = ref.shape[0]
        np.testing.assert_allclose(latent[i, :n], ref, atol=3e-5, rtol=3e-5)


def test_mae_forward_runs_on_real_weights(converted, rng):
    """Full MAE forward + loss on the converted checkpoint is finite and the
    loss responds to masking (sanity for BASELINE config 1)."""
    from acai_omr_tpu.models import mae as mae_lib, vit_encoder
    from acai_omr_tpu.models.mae import MaeConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig

    _, params = converted
    cfg = MaeConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=60, pe_max_width=200,
                              num_layers=2, hidden_dim=10, num_heads=1, mlp_dim=1),
        mask_ratio=0.75, decoder_num_layers=2, decoder_hidden_dim=10,
        decoder_num_heads=1, decoder_mlp_dim=1)
    imgs = [rng.random((1, 64, 96), dtype=np.float32)]
    pb = vit_encoder.batchify(imgs, cfg.encoder, bucket_multiple=8)
    pred, loss_mask, target = mae_lib.forward(
        params, cfg, jax.random.PRNGKey(0), jnp.asarray(pb.patches),
        jnp.asarray(pb.pe_idx), jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        jnp.asarray(pb.lengths), jnp.asarray(pb.patches))
    loss = mae_lib.mae_loss(pred, loss_mask, target)
    assert np.isfinite(float(loss))
    assert int(np.asarray(loss_mask).sum()) == int(24 - int(24 * 0.25))
