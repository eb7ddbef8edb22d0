"""MAE masking invariants, forward shapes, and loss-formula parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from acai_omr_tpu.models import mae as mae_lib
from acai_omr_tpu.models import vit_encoder
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig

TINY_ENC = EncoderConfig(patch_size=4, pe_max_height=8, pe_max_width=8,
                         num_layers=2, hidden_dim=16, num_heads=2, mlp_dim=24)
TINY_MAE = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                     decoder_hidden_dim=8, decoder_num_heads=2, decoder_mlp_dim=16)


def make_batch(rng, sizes):
    imgs = [rng.random((1, h, w), dtype=np.float32) for h, w in sizes]
    return vit_encoder.batchify(imgs, TINY_ENC, bucket_multiple=8)


def test_mae_mask_invariants(rng):
    pb = make_batch(rng, [(16, 32), (8, 16), (32, 32)])
    valid = jnp.asarray(pb.valid)
    lengths = jnp.asarray(pb.lengths)
    kb = mae_lib.keep_bucket_len(pb.valid.shape[1], 0.75, multiple=8)
    m = vit_encoder.mae_mask(jax.random.PRNGKey(0), valid, lengths, 0.75, kb)

    ids_shuffle = np.asarray(jnp.argsort(jnp.argsort(m.ids_restore, axis=-1), axis=-1))
    for i, l in enumerate(np.asarray(lengths)):
        keep = int(l * 0.25)
        assert int(m.keep_lengths[i]) == keep
        # kept ids are valid patch positions, no duplicates
        kept = np.asarray(m.ids_keep[i][np.asarray(m.kept_valid[i])])
        assert len(set(kept.tolist())) == keep
        assert (kept < l).all()
        # seq_mask marks exactly l - keep masked patches, all within the image
        sm = np.asarray(m.seq_mask[i])
        assert sm.sum() == l - keep
        assert not sm[l:].any()
        # restore round-trip: shuffle then restore is identity on 0..L
        restore = np.asarray(m.ids_restore[i])
        shuffled = np.argsort(restore)
        assert (np.sort(shuffled) == np.arange(len(shuffled))).all()


def test_mae_forward_and_loss(rng):
    key = jax.random.PRNGKey(0)
    params = mae_lib.init_mae_params(key, TINY_MAE)
    pb = make_batch(rng, [(16, 32), (8, 16)])
    # target = same images (pretrain wrapper may differ; shape contract equal)
    targets = pb.patches.copy()
    pred, loss_mask, tgt = mae_lib.forward(
        params, TINY_MAE, jax.random.PRNGKey(1), jnp.asarray(pb.patches),
        jnp.asarray(pb.pe_idx), jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        jnp.asarray(pb.lengths), jnp.asarray(targets))
    assert pred.shape == pb.patches.shape
    assert loss_mask.shape == pb.valid.shape
    loss = mae_lib.mae_loss(pred, loss_mask, tgt)
    assert np.isfinite(float(loss))

    # gradients flow through every parameter group
    def loss_fn(p):
        pr, lm, tg = mae_lib.forward(
            p, TINY_MAE, jax.random.PRNGKey(1), jnp.asarray(pb.patches),
            jnp.asarray(pb.pe_idx), jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
            jnp.asarray(pb.lengths), jnp.asarray(targets))
        return mae_lib.mae_loss(pr, lm, tg)

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path


def test_mae_loss_matches_torch_formula(rng):
    """Exact parity with the reference MAELoss math (models.py:271-288),
    recomputed here with torch ops as an independent oracle."""
    pred = rng.standard_normal((2, 6, 16)).astype(np.float32)
    target = rng.random((2, 6, 16)).astype(np.float32)
    mask = rng.random((2, 6)) > 0.4

    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    mean = tt.mean(dim=-1, keepdim=True)
    var = tt.var(dim=-1, keepdim=True)
    tt_n = (tt - mean) / (var + 1.e-6) ** 0.5
    tl = ((tp - tt_n) ** 2).mean(dim=-1)
    tm = torch.from_numpy(mask.astype(np.float32))
    ref = ((tl * tm).sum() / tm.sum()).item()

    ours = float(mae_lib.mae_loss(jnp.asarray(pred), jnp.asarray(mask),
                                  jnp.asarray(target)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_encoder_pe_untouched_rows_zero_grad(rng):
    """PE rows beyond every image in the batch must receive zero gradient
    (reference test pattern: test_mae.py gradient-flow checks)."""
    pb = make_batch(rng, [(8, 8)])  # 2x2 patches only
    key = jax.random.PRNGKey(0)
    params = vit_encoder.init_encoder_params(key, TINY_ENC)

    def loss_fn(p):
        latent, _ = vit_encoder.encode(p, TINY_ENC, jnp.asarray(pb.patches),
                                       jnp.asarray(pb.pe_idx), jnp.asarray(pb.pe_w),
                                       jnp.asarray(pb.valid))
        return jnp.sum(latent ** 2)

    g = jax.grad(loss_fn)(params)["pos_embedding"]
    g = np.asarray(g)
    assert np.abs(g[:2, :2]).sum() > 0          # used rows get gradient
    assert np.abs(g[2:, :]).sum() == 0          # untouched rows don't
    assert np.abs(g[:2, 2:]).sum() == 0
