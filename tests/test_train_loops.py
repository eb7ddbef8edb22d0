"""Full training-loop smoke tests on fake data (reference pattern:
tests/test_pre_train.py / test_omr_teacher_force_train.py run the complete
loops on DebugDatasets including checkpointing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acai_omr_tpu.data.datasets import DebugDataset
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.models import vitomr as vitomr_lib
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig
from acai_omr_tpu.train import omr_teacher_force_train as tf_train
from acai_omr_tpu.train import pre_train

TINY_ENC = EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                         num_layers=2, hidden_dim=16, num_heads=2, mlp_dim=24,
                         fine_tune_depth=1)


def test_pre_train_loop_runs(tmp_path):
    cfg = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                    decoder_hidden_dim=8, decoder_num_heads=2,
                    decoder_mlp_dim=16)
    train_ds = DebugDataset(n=6, sizes=((64, 96), (48, 64)), kind="mae")
    val_ds = DebugDataset(n=4, sizes=((64, 96),), kind="mae", seed=1)
    params, stats = pre_train.pre_train(
        cfg, train_ds, val_ds, epochs=2, batch_size=3, warmup_epochs=1,
        checkpoint_freq=1, model_dir=tmp_path / "mae", num_workers=2,
        bucket_boundaries=[(64, 96)], compute_dtype=jnp.float32)
    assert len(stats["train_losses"]) == 2
    assert all(np.isfinite(stats["train_losses"]))
    assert (tmp_path / "mae" / "pretrained_mae").exists()
    assert (tmp_path / "mae" / "checkpoints" / "epoch_2").exists()

    # checkpointed params restore and match
    from acai_omr_tpu.utils import checkpoint as ckpt_lib
    restored = ckpt_lib.load_params(tmp_path / "mae" / "pretrained_mae")
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_force_loop_runs(tmp_path):
    tokenizer = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=TINY_ENC,
        decoder=DecoderConfig.from_tokenizer(tokenizer, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    train_ds = DebugDataset(n=6, sizes=((64, 96), (48, 64)), seq_len=10,
                            vocab=tokenizer.vocab_size, kind="omr")
    val_ds = DebugDataset(n=2, sizes=((64, 96),), seq_len=10,
                          vocab=tokenizer.vocab_size, kind="omr", seed=1)
    new_params, stats = tf_train.omr_teacher_force_train(
        cfg, params, train_ds, val_ds, tokenizer, epochs=2, batch_size=3,
        warmup_epochs=1, checkpoint_freq=2, model_dir=tmp_path / "tf",
        num_workers=2, tf_anneal_epochs=1, soft_epochs=1,
        bucket_boundaries=[(64, 96)], compute_dtype=jnp.float32)
    assert len(stats["train_losses"]) == 2
    assert all(np.isfinite(stats["train_losses"]))
    assert (tmp_path / "tf" / "vitomr").exists()

    # frozen encoder prefix must not have moved (fine_tune_depth=1 of 2)
    old_blk = np.asarray(params["encoder"]["blocks"]["self_attn"]["in_kernel"])
    new_blk = np.asarray(new_params["encoder"]["blocks"]["self_attn"]["in_kernel"])
    np.testing.assert_array_equal(new_blk[0], old_blk[0])
    assert np.abs(new_blk[1] - old_blk[1]).max() > 0


def test_pre_train_data_parallel_8dev(tmp_path):
    """batch_size divisible by the 8 virtual devices -> the DP path engages
    (replicated params, batch-sharded packed batches incl. padded remainders)."""
    cfg = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                    decoder_hidden_dim=8, decoder_num_heads=2,
                    decoder_mlp_dim=16)
    train_ds = DebugDataset(n=11, sizes=((64, 96),), kind="mae")  # 11 -> padded last batch
    val_ds = DebugDataset(n=3, sizes=((64, 96),), kind="mae", seed=1)
    params, stats = pre_train.pre_train(
        cfg, train_ds, val_ds, epochs=1, batch_size=8, warmup_epochs=1,
        checkpoint_freq=5, model_dir=tmp_path / "mae_dp", num_workers=2,
        bucket_boundaries=[(64, 96)], compute_dtype=jnp.float32)
    assert np.isfinite(stats["train_losses"][0])


def test_teacher_force_data_parallel_8dev(tmp_path):
    """batch_size divisible by the 8 virtual devices -> the TF/SS loop's DP
    path engages (replicated params, batch-sharded packed batches, padded
    remainder batches; fused Pallas kernels gated off under GSPMD)."""
    tokenizer = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=TINY_ENC,
        decoder=DecoderConfig.from_tokenizer(tokenizer, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    train_ds = DebugDataset(n=11, sizes=((64, 96),), seq_len=10,
                            vocab=tokenizer.vocab_size, kind="omr")
    val_ds = DebugDataset(n=2, sizes=((64, 96),), seq_len=10,
                          vocab=tokenizer.vocab_size, kind="omr", seed=1)
    new_params, stats = tf_train.omr_teacher_force_train(
        cfg, params, train_ds, val_ds, tokenizer, epochs=1, batch_size=8,
        warmup_epochs=1, checkpoint_freq=2, model_dir=tmp_path / "tf_dp",
        num_workers=2, tf_anneal_epochs=1, soft_epochs=1,
        bucket_boundaries=[(64, 96)], compute_dtype=jnp.float32)
    assert np.isfinite(stats["train_losses"][0])


def test_pre_train_resume(tmp_path):
    """Crash/interrupt resume: continue from a train-state checkpoint
    (capability absent upstream)."""
    cfg = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                    decoder_hidden_dim=8, decoder_num_heads=2,
                    decoder_mlp_dim=16)
    train_ds = DebugDataset(n=4, sizes=((64, 96),), kind="mae")
    val_ds = DebugDataset(n=2, sizes=((64, 96),), kind="mae", seed=1)
    kwargs = dict(batch_size=2, warmup_epochs=1, checkpoint_freq=1,
                  model_dir=tmp_path / "mae", num_workers=2,
                  bucket_boundaries=[(64, 96)], compute_dtype=jnp.float32)
    p1, _ = pre_train.pre_train(cfg, train_ds, val_ds, epochs=1, **kwargs)
    p2, stats = pre_train.pre_train(
        cfg, train_ds, val_ds, epochs=2,
        resume_from=tmp_path / "mae" / "checkpoints" / "epoch_1", **kwargs)
    # resumed run trains only the remaining epoch
    assert len(stats["train_losses"]) == 1
    # and starts from the checkpointed params (so p2 != fresh init progression)
    assert np.isfinite(stats["train_losses"][0])
