"""ViTOMR composition: param-count parity, scheduled sampling, CE loss."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from acai_omr_tpu.models import mae as mae_lib
from acai_omr_tpu.models import omr_decoder, vit_encoder, vitomr
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig

TINY_ENC = EncoderConfig(patch_size=4, pe_max_height=8, pe_max_width=8,
                         num_layers=2, hidden_dim=16, num_heads=2, mlp_dim=24,
                         fine_tune_depth=1)
TINY_DEC = DecoderConfig(max_lmx_seq_len=32, vocab_size=11, num_layers=2,
                         hidden_dim=16, num_heads=2, mlp_dim=24, dropout=0.0,
                         pad_idx=1, bos_idx=0, eos_idx=2)
TINY = ViTOMRConfig(encoder=TINY_ENC, decoder=TINY_DEC, transition_head_dim=20,
                    transition_head_dropout=0.0)


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_param_counts_match_reference():
    """Full-size models must hit the reference's published parameter counts
    exactly (BASELINE.md: MAE 134,755,840; ViTOMR 305,414,627 with
    enc 94,469,376 / head 7,345,152 / dec 203,600,099)."""
    # constructed lazily with jax.eval_shape so no giant buffers materialize
    enc_cfg = EncoderConfig()  # ViT-B/16, 60x200 PE grid
    dec_cfg = DecoderConfig()  # 12 x 1024, vocab 227, max len 1536
    cfg = ViTOMRConfig(encoder=enc_cfg, decoder=dec_cfg)

    shapes = jax.eval_shape(lambda k: vitomr.init_vitomr_params(k, cfg),
                            jax.random.PRNGKey(0))
    enc = count_params(shapes["encoder"])
    head = count_params(shapes["transition_head"])
    dec = count_params(shapes["decoder"])
    assert enc == 94_469_376
    assert head == 7_345_152
    assert dec == 203_600_099
    assert enc + head + dec == 305_414_627

    mae_shapes = jax.eval_shape(
        lambda k: mae_lib.init_mae_params(k, MaeConfig()), jax.random.PRNGKey(0))
    assert count_params(mae_shapes) == 134_755_840


def make_inputs(rng, sizes, seq_lens):
    imgs = [rng.random((1, h, w), dtype=np.float32) for h, w in sizes]
    pb = vit_encoder.batchify(imgs, TINY_ENC, bucket_multiple=8)
    seqs = [np.concatenate([[TINY_DEC.bos_idx],
                            rng.integers(3, 11, size=n),
                            [TINY_DEC.eos_idx]]).astype(np.int32)
            for n in seq_lens]
    inputs, targets, lmx_valid = omr_decoder.batchify_and_split_lmx_seqs(
        seqs, TINY_DEC.pad_idx, bucket_multiple=8)
    return pb, inputs, targets, lmx_valid


def test_teacher_forced_forward_and_loss(rng):
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), TINY)
    pb, inputs, targets, lmx_valid = make_inputs(rng, [(16, 16), (8, 12)], [5, 3])
    logits = vitomr.forward_teacher_forced(
        params, TINY, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(inputs),
        jnp.asarray(lmx_valid))
    assert logits.shape == (2, inputs.shape[1], TINY_DEC.vocab_size)
    loss = vitomr.omr_ce_loss(logits, jnp.asarray(targets), TINY_DEC.pad_idx)
    assert np.isfinite(float(loss))


def test_ce_loss_matches_torch(rng):
    logits = rng.standard_normal((2, 7, 11)).astype(np.float32)
    targets = rng.integers(0, 11, size=(2, 7)).astype(np.int64)
    targets[1, 4:] = 1  # pad
    ref = torch.nn.CrossEntropyLoss(ignore_index=1)(
        torch.from_numpy(logits).reshape(-1, 11), torch.from_numpy(targets).reshape(-1))
    ours = vitomr.omr_ce_loss(jnp.asarray(logits), jnp.asarray(targets), pad_idx=1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    ref_s = torch.nn.CrossEntropyLoss(ignore_index=1, label_smoothing=0.1)(
        torch.from_numpy(logits).reshape(-1, 11), torch.from_numpy(targets).reshape(-1))
    ours_s = vitomr.omr_ce_loss(jnp.asarray(logits), jnp.asarray(targets),
                                pad_idx=1, label_smoothing=0.1)
    np.testing.assert_allclose(float(ours_s), float(ref_s), rtol=1e-4)


def test_scheduled_sampling_two_pass(rng):
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), TINY)
    pb, inputs, targets, lmx_valid = make_inputs(rng, [(16, 16), (8, 12)], [5, 3])
    args = (jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx), jnp.asarray(pb.pe_w),
            jnp.asarray(pb.valid), jnp.asarray(inputs), jnp.asarray(lmx_valid))
    logits = vitomr.forward_scheduled_sampling(
        params, TINY, *args, teacher_forcing_prob=0.5, sample_tau=2.0,
        use_hard_sampling=False, rng=jax.random.PRNGKey(2))
    assert logits.shape == (2, inputs.shape[1], TINY_DEC.vocab_size)

    # tf_prob=1.0 -> pure teacher forcing -> identical to plain forward
    logits_tf = vitomr.forward_scheduled_sampling(
        params, TINY, *args, teacher_forcing_prob=1.0, sample_tau=2.0,
        use_hard_sampling=False, rng=jax.random.PRNGKey(2))
    plain = vitomr.forward_teacher_forced(params, TINY, *args)
    np.testing.assert_allclose(np.asarray(logits_tf), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)


def test_gumbel_softmax_hard_straight_through(rng):
    logits = jnp.asarray(rng.standard_normal((3, 4, 7)).astype(np.float32))
    y = vitomr.gumbel_softmax(jax.random.PRNGKey(0), logits, tau=1.0, hard=True)
    y = np.asarray(y)
    # one-hot rows (up to straight-through fp cancellation, as in torch)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
    one_hot = np.zeros_like(y)
    np.put_along_axis(one_hot, y.argmax(-1)[..., None], 1.0, axis=-1)
    np.testing.assert_allclose(y, one_hot, atol=1e-6)

    # gradient flows despite hard sampling (straight-through)
    def f(lg):
        return jnp.sum(vitomr.gumbel_softmax(jax.random.PRNGKey(0), lg, 1.0, True) ** 2)
    g = jax.grad(f)(logits)
    assert np.abs(np.asarray(g)).sum() > 0


def test_frozen_stop_gradient_blocks_frozen_layers(rng):
    """With fine_tune_depth=1 of 2 layers, frozen layer 0 gets zero grads when
    frozen_stop_gradient=True (reference freezing: models.py:668-673)."""
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), TINY)
    pb, inputs, targets, lmx_valid = make_inputs(rng, [(16, 16)], [4])

    def loss_fn(p):
        logits = vitomr.forward_teacher_forced(
            p, TINY, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
            jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(inputs),
            jnp.asarray(lmx_valid), frozen_stop_gradient=True)
        return vitomr.omr_ce_loss(logits, jnp.asarray(targets), TINY_DEC.pad_idx)

    g = jax.grad(loss_fn)(params)
    blocks_g = g["encoder"]["blocks"]
    l0 = np.abs(np.asarray(blocks_g["self_attn"]["in_kernel"][0])).sum()
    l1 = np.abs(np.asarray(blocks_g["self_attn"]["in_kernel"][1])).sum()
    assert l0 == 0.0 and l1 > 0.0


def test_frozen_stop_gradient_whole_encoder(rng):
    """fine_tune_depth=0 + frozen_stop_gradient=True freezes the ENTIRE
    encoder stack (round-4 advisor finding: encode() used to map depth 0 to
    n_frozen=0, silently training — and paying the backward for — a
    nominally frozen encoder; encoder_llrd_scales already treated it as
    fully frozen)."""
    import dataclasses
    enc0 = dataclasses.replace(TINY_ENC, fine_tune_depth=0)
    cfg0 = dataclasses.replace(TINY, encoder=enc0)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), cfg0)
    pb, inputs, targets, lmx_valid = make_inputs(rng, [(16, 16)], [4])

    def loss_fn(p):
        logits = vitomr.forward_teacher_forced(
            p, cfg0, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
            jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(inputs),
            jnp.asarray(lmx_valid), frozen_stop_gradient=True)
        return vitomr.omr_ce_loss(logits, jnp.asarray(targets), TINY_DEC.pad_idx)

    def total_abs(tree):
        return sum(float(np.abs(np.asarray(x)).sum())
                   for x in jax.tree.leaves(tree))

    g = jax.grad(loss_fn)(params)
    assert total_abs(g["encoder"]["blocks"]) == 0.0
    # decoder still trains
    assert total_abs(g["decoder"]) > 0.0
    # and the MAE-pretraining meaning of depth 0 (no split, no freeze
    # requested) is unchanged: without frozen_stop_gradient all blocks train
    def loss_unfrozen(p):
        logits = vitomr.forward_teacher_forced(
            p, cfg0, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
            jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(inputs),
            jnp.asarray(lmx_valid), frozen_stop_gradient=False)
        return vitomr.omr_ce_loss(logits, jnp.asarray(targets), TINY_DEC.pad_idx)
    g2 = jax.grad(loss_unfrozen)(params)
    assert total_abs(g2["encoder"]["blocks"]) > 0.0


def test_mae_to_vitomr_transfer():
    mae_cfg = MaeConfig(encoder=TINY_ENC, decoder_num_layers=2,
                        decoder_hidden_dim=8, decoder_num_heads=2,
                        decoder_mlp_dim=16)
    mae_params = mae_lib.init_mae_params(jax.random.PRNGKey(0), mae_cfg)
    vp = vitomr.init_vitomr_params(jax.random.PRNGKey(1), TINY)
    vp2 = vitomr.vitomr_params_from_mae(vp, mae_params)
    for a, b in zip(jax.tree.leaves(vp2["encoder"]),
                    jax.tree.leaves(mae_params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decoder untouched
    for a, b in zip(jax.tree.leaves(vp2["decoder"]), jax.tree.leaves(vp["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_precomputed_memory_kv_matches_inlayer_projection(rng):
    """transformer.precompute_memory_kv + mem_kv= path == in-layer cross
    projection (the scheduled-sampling sharing optimization), all remat
    modes, and gradients flow into the cross in_proj weights."""
    from acai_omr_tpu.ops import transformer

    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(3), TINY_DEC)
    seqs = jnp.asarray(rng.integers(3, 11, (2, 8)), jnp.int32)
    mem = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    lmx_valid = jnp.asarray(rng.random((2, 8)) > 0.2)
    lat_valid = jnp.asarray(rng.random((2, 12)) > 0.2)

    base = omr_decoder.forward(params, TINY_DEC, seqs, mem, lmx_valid, lat_valid)
    mkv = transformer.precompute_memory_kv(params["blocks"], mem)
    assert mkv.shape == (TINY_DEC.num_layers, 2, 12, 2 * TINY_DEC.hidden_dim)
    for remat in (False, "dots", True):
        shared = omr_decoder.forward(params, TINY_DEC, seqs, mem, lmx_valid,
                                     lat_valid, mem_kv=mkv, remat=remat)
        np.testing.assert_allclose(np.asarray(base), np.asarray(shared),
                                   atol=2e-5, rtol=1e-5)

    def loss(p):
        kv = transformer.precompute_memory_kv(p["blocks"], mem)
        out = omr_decoder.forward(p, TINY_DEC, seqs, mem, lmx_valid, lat_valid,
                                  mem_kv=kv, remat="dots")
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.linalg.norm(g["blocks"]["cross_attn"]["in_kernel"])) > 0
