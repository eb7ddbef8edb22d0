"""MAE pretraining loop (stage 1 of 3).

Capability parity with the reference pretraining script (reference:
acai_omr/train/pre_train.py:1-211): same model shape, hyperparameters,
augmentation policy, 4-dataset mix, per-epoch cosine schedule and checkpoint
cadence — rebuilt as a jitted, mesh-sharded train step fed by the threaded
bucket loader. Run as ``python -m acai_omr_tpu.train.pre_train``.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (DOREMI_PREPARED_ROOT_DIR, GRAND_STAFF_ROOT_DIR,
                      MAE_MAX_SEQ_LEN, OLIMPIC_SYNTHETIC_ROOT_DIR, PATCH_SIZE, PE_MAX_HEIGHT,
                      PE_MAX_WIDTH, PRIMUS_PREPARED_ROOT_DIR)
from ..data import datasets as ds_lib
from ..data import transforms as tf_lib
from ..data.bucketing import BucketBatchSampler, default_bucket_boundaries
from ..data.loader import PrefetchLoader, pack_mae_batch
from ..models import mae as mae_lib
from ..models.mae import MaeConfig
from ..models.vit_encoder import EncoderConfig
from ..parallel import mesh as mesh_lib
from ..parallel import trainer
from ..utils import checkpoint as ckpt_lib
from ..utils.metrics import MetricsWriter
from .schedules import cosine_anneal_with_warmup

MODEL_DIR_PATH = Path("mae_pre_train")

# MAE constants (reference: pre_train.py:15-37)
MASK_RATIO = 0.75
AUGMENTATION_P = 0.2
EPOCHS = 500
CHECKPOINT_FREQ = 50
BASE_LR = 1.5e-4
MIN_LR = 1e-6
ADAMW_BETAS = (0.9, 0.95)
ADAMW_WEIGHT_DECAY = 0.05
WARMUP_EPOCHS = 50
BATCH_SIZE = 64
NUM_WORKERS = 24


def set_up_mae() -> MaeConfig:
    """ViT-B/16 MAE, 60x200 PE grid, mask 0.75 (reference: pre_train.py:156-159)."""
    return MaeConfig(
        encoder=EncoderConfig(patch_size=PATCH_SIZE, pe_max_height=PE_MAX_HEIGHT,
                              pe_max_width=PE_MAX_WIDTH),
        mask_ratio=MASK_RATIO)


def make_loss_fn(cfg: MaeConfig, compute_dtype=jnp.bfloat16,
                 reduction="mean"):
    """``reduction="mean"`` returns (loss, {}); ``"sum"`` returns
    (loss_sum, patch_count) for exact DP reduction."""
    def loss_fn(params, batch, rng):
        # remat: recompute per-layer activations in backward — without it the
        # layer scan keeps every layer's (B, H, T, T) attention residuals and
        # the full-size step overflows HBM
        pred, loss_mask, target = mae_lib.forward(
            params, cfg, rng, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["lengths"], batch["target_patches"],
            compute_dtype=compute_dtype, remat=True)
        out = mae_lib.mae_loss(pred, loss_mask, target, reduction=reduction)
        return (out, {}) if reduction == "mean" else out
    return loss_fn


def make_sum_loss_fn(cfg: MaeConfig, compute_dtype=jnp.bfloat16):
    """(loss_sum, patch_count) variant for exact DP reduction
    (trainer.make_sharded_train_step)."""
    return make_loss_fn(cfg, compute_dtype, reduction="sum")


def make_eval_fn(cfg: MaeConfig, compute_dtype=jnp.bfloat16, mesh=None):
    def eval_sum(params, batch, rng):
        pred, loss_mask, target = mae_lib.forward(
            params, cfg, rng, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["lengths"], batch["target_patches"],
            compute_dtype=compute_dtype)
        return mae_lib.mae_loss(pred, loss_mask, target, reduction="sum")

    if mesh is not None:
        return trainer.make_sharded_eval_fn(eval_sum, mesh)

    @jax.jit
    def eval_fn(params, batch, rng):
        s, n = eval_sum(params, batch, rng)
        return s / jnp.maximum(n, 1.0)
    return eval_fn


def _device_batch(batch, sharding=None):
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if sharding is None:
        return jax.tree.map(jnp.asarray, arrays)
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}


def pre_train(mae_cfg: MaeConfig, train_dataset, validation_dataset, *,
              params=None, epochs: int = EPOCHS, batch_size: int = BATCH_SIZE,
              warmup_epochs: int = WARMUP_EPOCHS, base_lr: float = BASE_LR,
              min_lr: float = MIN_LR, checkpoint_freq: int = CHECKPOINT_FREQ,
              model_dir: Path = MODEL_DIR_PATH, num_workers: int = NUM_WORKERS,
              bucket_boundaries=None, seed: int = 0,
              compute_dtype=jnp.bfloat16, resume_from: str | None = None):
    """Full pretraining loop; returns (params, stats). Testable with tiny
    datasets/configs (reference test pattern: full-loop smoke test).
    ``resume_from``: a train-state checkpoint to continue from (a capability
    the reference lacks, SURVEY.md §5)."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=resume_from is not None)
    (model_dir / "checkpoints").mkdir(exist_ok=resume_from is not None)

    if params is None:
        params = mae_lib.init_mae_params(jax.random.PRNGKey(seed), mae_cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"Trainable parameters count: {n_params}")

    n_dev = len(jax.devices())
    use_dp = n_dev > 1 and batch_size % n_dev == 0
    data_sh = None
    mesh = None
    if use_dp:
        mesh = mesh_lib.make_mesh()
        data_sh = mesh_lib.data_sharding(mesh)
        params = jax.tree.map(
            lambda x: jax.device_put(x, mesh_lib.replicated(mesh)), params)

    boundaries = bucket_boundaries or default_bucket_boundaries(mae_cfg.patch_size)
    train_sampler = BucketBatchSampler(train_dataset, list(boundaries), batch_size, seed=seed)
    val_sampler = BucketBatchSampler(validation_dataset, list(boundaries), batch_size,
                                     shuffle=False, seed=seed)
    pack = lambda ex: pack_mae_batch(ex, mae_cfg.encoder,
                                     pad_to_batch=batch_size if use_dp else None)
    train_loader = PrefetchLoader(train_dataset, train_sampler, pack, num_workers)
    val_loader = PrefetchLoader(validation_dataset, val_sampler, pack, num_workers)

    # per-epoch schedule, stepped per optimizer step (reference steps the
    # scheduler once per epoch; we evaluate the same curve at epoch granularity)
    steps_per_epoch = max(len(train_sampler), 1)
    schedule = lambda step: cosine_anneal_with_warmup(
        base_lr, warmup_epochs, epochs, min_lr)(step // steps_per_epoch)
    tx = trainer.adamw(schedule, betas=ADAMW_BETAS,
                       weight_decay=ADAMW_WEIGHT_DECAY)
    # own the buffers (the jitted step donates the train state)
    params = jax.tree.map(jnp.array, params)
    state = trainer.create_train_state(params, tx)
    start_epoch = 0
    if resume_from:
        state = ckpt_lib.load_train_state(resume_from, state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        print(f"Resumed from {resume_from} at step {int(state.step)} "
              f"(epoch {start_epoch})")
    if use_dp:
        # shard_map DP: each device runs the full single-chip step (incl. the
        # fused Pallas training kernels, which GSPMD can't partition) on its
        # batch shard; loss/grads reduce as exact global masked means
        step_fn = trainer.make_sharded_train_step(
            make_sum_loss_fn(mae_cfg, compute_dtype), tx, mesh)
    else:
        step_fn = trainer.make_train_step(make_loss_fn(mae_cfg, compute_dtype), tx)
    eval_fn = make_eval_fn(mae_cfg, compute_dtype, mesh=mesh)

    writer = MetricsWriter(str(model_dir / "tb"), str(model_dir / "stats.csv"))
    rng = jax.random.PRNGKey(seed + 1)
    if start_epoch:
        # a resumed run must not replay the original run's early-epoch MAE
        # mask / eval randomness (round-5 review) — fold the resume point
        # into the stream so epochs start_epoch.. draw fresh masks
        rng = jax.random.fold_in(rng, start_epoch)
    train_losses, val_losses = [], []

    def emergency_checkpoint():
        # crash-resilient save (capability the reference lacks): any uncaught
        # error or interrupt leaves a resumable train state behind
        try:
            ckpt_lib.save_train_state(model_dir / "checkpoints" / "emergency", state)
            print(f"Saved emergency checkpoint to {model_dir}/checkpoints/emergency")
        except Exception:
            pass

    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        loss_acc, n_batches = None, 0
        try:
            for batch in train_loader:
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, _device_batch(batch, data_sh), step_rng)
                # accumulate on device: a per-step float() pull would block
                # async dispatch (and costs ~29 ms/step through the axon
                # tunnel); one pull per epoch
                loss_acc = metrics["loss"] if loss_acc is None \
                    else loss_acc + metrics["loss"]
                n_batches += 1
        except (KeyboardInterrupt, Exception):
            emergency_checkpoint()
            raise
        train_loss = float(loss_acc) / max(n_batches, 1) if n_batches else 0.0

        val_acc, n_val = None, 0
        for batch in val_loader:
            rng, step_rng = jax.random.split(rng)
            v = eval_fn(state.params, _device_batch(batch, data_sh), step_rng)
            val_acc = v if val_acc is None else val_acc + v
            n_val += 1
        val_loss = float(val_acc) / max(n_val, 1) if n_val else 0.0

        dt = time.perf_counter() - t0
        print(f"Epoch {epoch + 1}: train {train_loss:.5f} val {val_loss:.5f} "
              f"({dt:.1f}s, {n_batches} batches)")
        writer.scalars("epoch", {"train_loss": train_loss, "val_loss": val_loss,
                                 "seconds": dt}, epoch)
        writer.flush()
        train_losses.append(train_loss)
        val_losses.append(val_loss)

        if (epoch + 1) % checkpoint_freq == 0:
            ckpt_lib.save_train_state(
                model_dir / "checkpoints" / f"epoch_{epoch + 1}", state)

    ckpt_lib.save_pytree(model_dir / "pretrained_mae", state.params)
    return state.params, {"train_losses": train_losses, "val_losses": val_losses}


def build_datasets():
    """The reference's 4-dataset pretraining mix (pre_train.py:178-198)."""
    base = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, MAE_MAX_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=True),
    ])
    # the PRETRAIN camera stack — weaker than stage 2's (reference
    # pre_train.py:177-183: fixed sigma-1 blur, +/-1 degree, perspective
    # 0.06, brightness 0.2); the port used the stage-2 parameters for both
    # stages until the round-5 review caught the divergence
    camera = tf_lib.RandomApply([
        tf_lib.GaussianBlur(15, (1.0, 1.0)),
        tf_lib.GaussianNoise(0.03),
        tf_lib.RandomRotation((-1, 1)),
        tf_lib.RandomPerspective(0.06, 1.0),
        tf_lib.ColorJitter(0.2, 0.2, 0.2, 0),
    ], p=AUGMENTATION_P)
    # grandstaff-specific stack: the dataset ships partially-augmented
    # variants already, so only perspective + jitter, ALWAYS applied to the
    # distorted branch (reference pre_train.py:186-189; the augment_p gate
    # lives in the wrapper)
    grandstaff_camera = tf_lib.Compose([
        tf_lib.RandomPerspective(0.08, 1.0),
        tf_lib.ColorJitter(0.2, 0.2, 0.2, 0),
    ])

    grand_staff = ds_lib.GrandStaffLMXDataset(
        GRAND_STAFF_ROOT_DIR, "samples.train.txt", img_transform=base)
    primus = ds_lib.PreparedDataset(PRIMUS_PREPARED_ROOT_DIR, transform=base)
    doremi = ds_lib.PreparedDataset(DOREMI_PREPARED_ROOT_DIR, transform=base)
    olimpic = ds_lib.OlimpicDataset(
        OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.train.txt", img_transform=base)

    train = ds_lib.ConcatDataset([
        ds_lib.GrandStaffPreTrainWrapper(grand_staff, AUGMENTATION_P,
                                         grandstaff_camera),
        ds_lib.PreTrainWrapper(primus, transform=camera),
        ds_lib.PreTrainWrapper(doremi, transform=camera),
        ds_lib.OlimpicPreTrainWrapper(olimpic, transform=camera),
    ])

    gs_val = ds_lib.GrandStaffLMXDataset(GRAND_STAFF_ROOT_DIR, "samples.dev.txt",
                                         img_transform=base)
    ol_val = ds_lib.OlimpicDataset(OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.dev.txt",
                                   img_transform=base)
    val = ds_lib.ConcatDataset([
        ds_lib.GrandStaffPreTrainWrapper(gs_val),
        ds_lib.OlimpicPreTrainWrapper(ol_val),
    ])
    return train, val


if __name__ == "__main__":
    from ..utils import fast_prng
    fast_prng.enable()  # hardware PRNG: dropout/mask draws off the hot path
    cfg = set_up_mae()
    train_ds, val_ds = build_datasets()
    pre_train(cfg, train_ds, val_ds)
