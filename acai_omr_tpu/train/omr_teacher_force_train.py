"""Teacher-forced / scheduled-sampling seq2seq training (stage 2 of 3).

Capability parity with the reference script (reference:
acai_omr/train/omr_teacher_force_train.py:1-353): MAE-initialized
FineTune encoder (last 12 layers tunable), 12-layer LMX decoder, scheduled
sampling with annealed tf-prob/tau and hard-sampling switch, LLRD optimizer
(base 1e-4 / fine-tune 1e-5, decay 0.9), 8x gradient accumulation, bf16
compute, per-optimizer-step cosine schedule — as one jitted accumulation step.
Run as ``python -m acai_omr_tpu.train.omr_teacher_force_train``.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (GRAND_STAFF_ROOT_DIR, LMX_VOCAB_PATH, MAX_LMX_SEQ_LEN,
                      OLIMPIC_SCANNED_ROOT_DIR, OLIMPIC_SYNTHETIC_ROOT_DIR,
                      OMR_MAX_IMG_SEQ_LEN, PATCH_SIZE, PE_MAX_HEIGHT,
                      PE_MAX_WIDTH)
from ..data import datasets as ds_lib
from ..data import transforms as tf_lib
from ..data.bucketing import BucketBatchSampler, default_bucket_boundaries
from ..data.loader import PrefetchLoader, pack_omr_batch
from ..data.tokenizer import LmxTokenizer
from ..models import vitomr as vitomr_lib
from ..models.omr_decoder import DecoderConfig
from ..models.vit_encoder import EncoderConfig
from ..models.vitomr import ViTOMRConfig
from ..parallel import mesh as mesh_lib
from ..parallel import trainer
from ..utils import checkpoint as ckpt_lib
from ..utils.metrics import MetricsWriter
from .schedules import TFSchedule, cosine_anneal_with_warmup

MODEL_DIR_PATH = Path("tf_omr_train")
PRETRAINED_MAE_PATH = "mae_pre_train/pretrained_mae"

# training settings (reference: omr_teacher_force_train.py:17-56)
ENCODER_FINE_TUNE_DEPTH = 12
NUM_DECODER_LAYERS = 12
EPOCHS = 40
CHECKPOINT_FREQ = 10
FINE_TUNE_BASE_LR = 1e-5
FINE_TUNE_DECAY_FACTOR = 0.9
BASE_LR = 1e-4
MIN_LR = 1e-6
ADAMW_BETAS = (0.9, 0.95)
ADAMW_WEIGHT_DECAY = 0.01
WARMUP_EPOCHS = 2
BATCH_SIZE = 8
GRAD_ACCUMULATION_STEPS = 8
NUM_WORKERS = 26
AUGMENTATION_P = 0.5
ENCODER_DROPOUT = 0.05
TRANSITION_HEAD_DROPOUT = 0.05
DECODER_DROPOUT = 0.1
LABEL_SMOOTHING = 0.0
INITIAL_TEACHER_FORCING_PROB = 1.0
MIN_TEACHER_FORCING_PROB = 0.0
INITIAL_TAU = 5.0
MIN_TAU = 0.1
TF_ANNEAL_EPOCHS = 35
SOFT_EPOCHS = EPOCHS // 2


def set_up_vitomr(tokenizer: LmxTokenizer | None = None,
                  fine_tune_depth: int = ENCODER_FINE_TUNE_DEPTH) -> ViTOMRConfig:
    tokenizer = tokenizer or LmxTokenizer(LMX_VOCAB_PATH)
    return ViTOMRConfig(
        encoder=EncoderConfig(patch_size=PATCH_SIZE, pe_max_height=PE_MAX_HEIGHT,
                              pe_max_width=PE_MAX_WIDTH,
                              dropout=ENCODER_DROPOUT,
                              fine_tune_depth=fine_tune_depth),
        decoder=DecoderConfig.from_tokenizer(
            tokenizer, max_lmx_seq_len=MAX_LMX_SEQ_LEN,
            num_layers=NUM_DECODER_LAYERS, dropout=DECODER_DROPOUT),
        transition_head_dropout=TRANSITION_HEAD_DROPOUT)


def make_loss_fn(cfg: ViTOMRConfig, tf_state: dict,
                 compute_dtype=jnp.bfloat16, label_smoothing=LABEL_SMOOTHING,
                 remat="dots", reduction="mean"):
    """Scheduled-sampling loss. ``tf_state`` holds mutable curriculum values
    read at trace time; pass tf_prob/tau/hard via batch to avoid retraces.
    ``remat``: per-layer rematerialization policy (ops/transformer._remat_wrap)
    — "dots" saves matmul outputs (default; measured fastest at B=8),
    False trades memory for no recompute, True is full recompute.
    ``reduction="mean"`` returns (loss, {}); ``"sum"`` returns
    (nll_sum, token_count) for exact DP reduction."""
    def loss_fn(params, batch, rng):
        logits = vitomr_lib.forward_scheduled_sampling(
            params, cfg, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["inputs"], batch["lmx_valid"],
            teacher_forcing_prob=batch["tf_prob"], sample_tau=batch["tau"],
            use_hard_sampling=tf_state["use_hard_sampling"], rng=rng,
            compute_dtype=compute_dtype, deterministic=False,
            frozen_stop_gradient=True, remat=remat)
        out = vitomr_lib.omr_ce_loss(logits, batch["targets"],
                                     cfg.decoder.pad_idx, label_smoothing,
                                     reduction=reduction)
        return (out, {}) if reduction == "mean" else out
    return loss_fn


def make_sum_loss_fn(cfg: ViTOMRConfig, tf_state: dict,
                     compute_dtype=jnp.bfloat16,
                     label_smoothing=LABEL_SMOOTHING, remat="dots"):
    """(nll_sum, token_count) variant of :func:`make_loss_fn` for exact DP
    reduction (trainer.make_sharded_grad_fn)."""
    return make_loss_fn(cfg, tf_state, compute_dtype, label_smoothing,
                        remat, reduction="sum")


def make_eval_fn(cfg: ViTOMRConfig, compute_dtype=jnp.bfloat16,
                 label_smoothing=LABEL_SMOOTHING, mesh=None):
    def eval_sum(params, batch, rng=None):
        logits = vitomr_lib.forward_teacher_forced(
            params, cfg, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["inputs"], batch["lmx_valid"],
            compute_dtype=compute_dtype, deterministic=True)
        return vitomr_lib.omr_ce_loss(logits, batch["targets"],
                                      cfg.decoder.pad_idx, label_smoothing,
                                      reduction="sum")

    if mesh is not None:
        sharded = trainer.make_sharded_eval_fn(eval_sum, mesh)
        return lambda params, batch: sharded(params, batch)

    @jax.jit
    def eval_fn(params, batch):
        s, n = eval_sum(params, batch)
        return s / jnp.maximum(n, 1.0)
    return eval_fn


def _device_batch(batch, extra=None, sharding=None):
    # one transfer: device_put straight from numpy with the DP sharding —
    # jnp.asarray-then-device_put committed each array to device 0 and paid
    # a second resharding copy per microbatch (round-5 review; pre_train's
    # sibling helper already had the single-transfer form)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if sharding is None:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    else:
        arrays = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
    if extra:  # scalar hyperparams stay replicated
        arrays.update(extra)
    return arrays


def omr_teacher_force_train(*args, **kwargs):
    """Full stage-2 loop; returns (params, stats).

    Thin wrapper scoping the stage-2-only ``ACAI_FLASH_ATTENTION``
    default to THIS call: the setdefault used to leak to the rest of the
    process (round-5 review — a same-process later stage with different
    shapes, e.g. tools/e2e_pipeline_run.py's GRPO, silently inherited a
    tuning default validated only on stage-2 shapes). An explicit env
    setting still wins, exactly as before.
    """
    flash_unset = "ACAI_FLASH_ATTENTION" not in os.environ
    try:
        return _omr_teacher_force_train(*args, **kwargs)
    finally:
        if flash_unset:
            os.environ.pop("ACAI_FLASH_ATTENTION", None)


def _omr_teacher_force_train(cfg: ViTOMRConfig, params, train_dataset,
                            validation_dataset, tokenizer: LmxTokenizer, *,
                            epochs: int = EPOCHS, batch_size: int = BATCH_SIZE,
                            grad_accumulation_steps: int = GRAD_ACCUMULATION_STEPS,
                            base_lr: float = BASE_LR,
                            fine_tune_base_lr: float = FINE_TUNE_BASE_LR,
                            fine_tune_decay: float = FINE_TUNE_DECAY_FACTOR,
                            warmup_epochs: int = WARMUP_EPOCHS,
                            min_lr: float = MIN_LR,
                            checkpoint_freq: int = CHECKPOINT_FREQ,
                            model_dir: Path = MODEL_DIR_PATH,
                            num_workers: int = NUM_WORKERS,
                            tf_anneal_epochs: int = TF_ANNEAL_EPOCHS,
                            soft_epochs: int = SOFT_EPOCHS,
                            bucket_boundaries=None, seed: int = 0,
                            compute_dtype=jnp.bfloat16):
    """Full stage-2 loop; returns (params, stats)."""
    # data-parallel over all attached devices when the batch shards evenly
    # (SURVEY §2.5(a): batch-sharded TF step; grad all-reduce via GSPMD)
    n_dev = len(jax.devices())
    use_dp = n_dev > 1 and batch_size % n_dev == 0
    # Pallas flash attention is a measured +3.5% on THIS step's shapes
    # (tools/flash_ab.py ss: 31.1 -> 32.2 img/s on v5e) but a -5% regression
    # on MAE pretrain shapes — default it on for this stage only; explicit
    # ACAI_FLASH_ATTENTION=0/1 still wins. (Under DP the grad/eval steps run
    # per shard via shard_map, so Pallas kernels stay usable.)
    os.environ.setdefault("ACAI_FLASH_ATTENTION", "1")
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=False)
    (model_dir / "checkpoints").mkdir()

    data_sh = mesh = None
    if use_dp:
        mesh = mesh_lib.make_mesh()
        data_sh = mesh_lib.data_sharding(mesh)
        params = jax.tree.map(
            lambda x: jax.device_put(x, mesh_lib.replicated(mesh)), params)

    boundaries = bucket_boundaries or default_bucket_boundaries(cfg.encoder.patch_size)
    sampler = BucketBatchSampler(train_dataset, list(boundaries), batch_size, seed=seed)
    val_sampler = BucketBatchSampler(validation_dataset, list(boundaries),
                                     batch_size, shuffle=False, seed=seed)
    pack = lambda ex: pack_omr_batch(ex, cfg.encoder, tokenizer,
                                     max_lmx_seq_len=cfg.decoder.max_lmx_seq_len,
                                     pad_to_batch=batch_size if use_dp else None)
    train_loader = PrefetchLoader(train_dataset, sampler, pack, num_workers)
    val_loader = PrefetchLoader(validation_dataset, val_sampler, pack, num_workers)

    # optimizer steps per epoch after accumulation (reference: :209-210)
    opt_steps_per_epoch = max(-(len(sampler) // -max(grad_accumulation_steps, 1)), 1)
    schedule = cosine_anneal_with_warmup(
        base_lr, warmup_epochs * opt_steps_per_epoch,
        epochs * opt_steps_per_epoch, min_lr)
    tx = trainer.adamw(
        schedule, betas=ADAMW_BETAS, weight_decay=ADAMW_WEIGHT_DECAY,
        scale_tree_fn=lambda p: trainer.encoder_llrd_scales(
            p, cfg, fine_tune_base_lr / base_lr, fine_tune_decay))
    # own the buffers: the jitted step donates train state, which must not
    # invalidate the caller's params
    params = jax.tree.map(jnp.array, params)
    state = trainer.create_train_state(params, tx)

    tf_schedule = TFSchedule(INITIAL_TEACHER_FORCING_PROB,
                             MIN_TEACHER_FORCING_PROB, INITIAL_TAU, MIN_TAU,
                             soft_steps=soft_epochs * opt_steps_per_epoch,
                             anneal_steps=tf_anneal_epochs * opt_steps_per_epoch)
    # host-driven gradient accumulation (reference: 8x, effective batch 64,
    # omr_teacher_force_train.py:40,126): per-microbatch jitted grad evals
    # (bucket shapes may differ within a window) summed on device, one
    # optimizer application per window
    if use_dp:
        # shard_map DP: each device runs the single-chip grad step (incl. the
        # fused Pallas training kernels / flash attention, which GSPMD can't
        # partition) on its batch shard; loss/grads reduce as exact global
        # masked means, so accumulation semantics match single-device runs
        grad_fns = {
            hard: trainer.make_sharded_grad_fn(
                make_sum_loss_fn(cfg, {"use_hard_sampling": hard},
                                 compute_dtype), mesh)
            for hard in (False, True)
        }
        grad_acc_fns = {
            hard: trainer.make_sharded_grad_acc_fn(
                make_sum_loss_fn(cfg, {"use_hard_sampling": hard},
                                 compute_dtype), mesh)
            for hard in (False, True)
        }
    else:
        grad_fns = {
            hard: trainer.make_grad_fn(
                make_loss_fn(cfg, {"use_hard_sampling": hard}, compute_dtype))
            for hard in (False, True)
        }
        grad_acc_fns = {
            hard: trainer.make_grad_acc_fn(
                make_loss_fn(cfg, {"use_hard_sampling": hard}, compute_dtype))
            for hard in (False, True)
        }
    apply_fn = trainer.make_apply_fn(tx)
    eval_fn = make_eval_fn(cfg, compute_dtype, mesh=mesh)

    writer = MetricsWriter(str(model_dir / "tb"), str(model_dir / "stats.csv"))
    rng = jax.random.PRNGKey(seed + 1)
    stats = {"train_losses": [], "val_losses": []}
    opt_step = 0

    def emergency_checkpoint():
        # crash-resilient save (capability the reference lacks)
        try:
            ckpt_lib.save_train_state(model_dir / "checkpoints" / "emergency", state)
            print(f"Saved emergency checkpoint to {model_dir}/checkpoints/emergency")
        except Exception:
            pass

    accum = max(grad_accumulation_steps, 1)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        epoch_loss, n_micro = 0.0, 0
        grads_acc, window_losses = None, []
        try:
            for batch in train_loader:
                tf_prob, tau, use_hard = tf_schedule.at(opt_step)
                rng, step_rng = jax.random.split(rng)
                db = _device_batch(batch, {"tf_prob": jnp.float32(tf_prob),
                                           "tau": jnp.float32(tau)}, data_sh)
                if grads_acc is None:
                    loss_dev, grads_acc = grad_fns[use_hard](
                        state.params, db, step_rng)
                else:  # fused device-side accumulate into the donated acc
                    loss_dev, grads_acc = grad_acc_fns[use_hard](
                        state.params, db, step_rng, grads_acc)
                # keep the loss on device: a host pull per micro-step blocks
                # async dispatch (and costs a ~29 ms round trip through the
                # axon tunnel) — pull once per optimizer step for logging
                window_losses.append(loss_dev)
                n_micro += 1
                if len(window_losses) >= accum:
                    # reference parity: step on the SUM of window gradients
                    # (no 1/accum rescale; omr_teacher_force_train.py:118-127)
                    state = apply_fn(state, grads_acc, jnp.float32(1.0))
                    window_mean = float(sum(window_losses)) / len(window_losses)
                    epoch_loss += window_mean * len(window_losses)
                    writer.scalar("train/loss", window_mean, opt_step)
                    writer.scalar("train/hyperparams/tf_prob", tf_prob, opt_step)
                    writer.scalar("train/hyperparams/tau", tau, opt_step)
                    grads_acc, window_losses = None, []
                    opt_step += 1
            if window_losses:  # epoch-final partial window (reference: :126)
                state = apply_fn(state, grads_acc, jnp.float32(1.0))
                window_mean = float(sum(window_losses)) / len(window_losses)
                epoch_loss += window_mean * len(window_losses)
                # log like full windows: skipping left a hole at this
                # opt_step in every ragged-tail epoch's TB/CSV series
                writer.scalar("train/loss", window_mean, opt_step)
                writer.scalar("train/hyperparams/tf_prob", tf_prob, opt_step)
                writer.scalar("train/hyperparams/tau", tau, opt_step)
                grads_acc, window_losses = None, []
                opt_step += 1
        except (KeyboardInterrupt, Exception):
            emergency_checkpoint()
            raise

        train_loss = epoch_loss / max(n_micro, 1)
        val_losses, n_val = [], 0
        for batch in val_loader:
            val_losses.append(eval_fn(state.params,
                                      _device_batch(batch, sharding=data_sh)))
            n_val += 1
        val_loss = float(sum(val_losses)) / max(n_val, 1)  # one pull

        dt = time.perf_counter() - t0
        print(f"Epoch {epoch + 1}: train {train_loss:.5f} val {val_loss:.5f} ({dt:.1f}s)")
        writer.scalars("epoch", {"train_loss": train_loss, "val_loss": val_loss}, epoch)
        writer.flush()
        stats["train_losses"].append(train_loss)
        stats["val_losses"].append(val_loss)

        if (epoch + 1) % checkpoint_freq == 0:
            ckpt_lib.save_train_state(model_dir / "checkpoints" / f"epoch_{epoch + 1}", state)

    ckpt_lib.save_pytree(model_dir / "vitomr", state.params)
    return state.params, stats


def set_up_omr_teacher_force_train(pretrained_mae_path: str = PRETRAINED_MAE_PATH):
    """Model + MAE-weight transfer + base transforms (reference: :288-314)."""
    tokenizer = LmxTokenizer(LMX_VOCAB_PATH)
    cfg = set_up_vitomr(tokenizer)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    mae_params = ckpt_lib.load_params(pretrained_mae_path)
    params = vitomr_lib.vitomr_params_from_mae(params, mae_params)

    base_img_transform = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, OMR_MAX_IMG_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=False),
    ])
    return cfg, params, tokenizer, base_img_transform


def build_datasets(base_img_transform):
    """The reference's stage-2 dataset mix (reference: :316-351)."""
    camera = tf_lib.default_camera_augment(1.0)
    grandstaff_camera = tf_lib.Compose([
        tf_lib.RandomPerspective(0.2, 1.0),
        tf_lib.ColorJitter(0.15, 0.2, 0.2, 0),
    ])
    olimpic_tf = tf_lib.Compose([base_img_transform,
                                 tf_lib.RandomApply([camera], p=AUGMENTATION_P)])

    grand_staff = ds_lib.GrandStaffLMXDataset(
        GRAND_STAFF_ROOT_DIR, "samples.train.txt", img_transform=base_img_transform)
    olimpic = ds_lib.OlimpicDataset(
        OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.train.txt", img_transform=olimpic_tf)
    train = ds_lib.ConcatDataset([
        ds_lib.GrandStaffOMRTrainWrapper(grand_staff, AUGMENTATION_P,
                                         transform=grandstaff_camera),
        olimpic,
    ])

    val_sets = [
        ds_lib.GrandStaffOMRTrainWrapper(ds_lib.GrandStaffLMXDataset(
            GRAND_STAFF_ROOT_DIR, "samples.dev.txt", img_transform=base_img_transform)),
        ds_lib.OlimpicDataset(OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.dev.txt",
                              img_transform=base_img_transform),
        ds_lib.OlimpicDataset(OLIMPIC_SCANNED_ROOT_DIR, "samples.dev.txt",
                              img_transform=base_img_transform),
    ]
    return train, ds_lib.ConcatDataset(val_sets)


if __name__ == "__main__":
    from ..utils import fast_prng
    fast_prng.enable()  # hardware PRNG: ~28% faster steps (utils/fast_prng.py)
    cfg, params, tokenizer, base_img_transform = set_up_omr_teacher_force_train()
    train_ds, val_ds = build_datasets(base_img_transform)
    omr_teacher_force_train(cfg, params, train_ds, val_ds, tokenizer)
