"""Evaluation CLI: test-set loss + sample prediction dumps.

Parity with the reference eval harness (reference:
acai_omr/models/eval_model.py:18-166): ``python -m acai_omr_tpu.eval_model
{mae|vitomr} CHECKPOINT [-c] [-d DIR -p N]`` computes the average test loss
over the held-out ConcatDatasets (MAE normalized masked-pixel MSE 0.159-class /
ViTOMR teacher-forced CE 0.056-class, BASELINE.md) and optionally dumps sample
predictions.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from .config import (GRAND_STAFF_ROOT_DIR, MAE_MAX_SEQ_LEN,
                     OLIMPIC_SCANNED_ROOT_DIR, OLIMPIC_SYNTHETIC_ROOT_DIR,
                     OMR_MAX_IMG_SEQ_LEN, PATCH_SIZE, PE_MAX_HEIGHT,
                     PE_MAX_WIDTH)
from .data import datasets as ds_lib
from .data import transforms as tf_lib
from .data.bucketing import BucketBatchSampler, default_bucket_boundaries
from .data.loader import PrefetchLoader, pack_mae_batch, pack_omr_batch
from .data.tokenizer import LmxTokenizer
from .utils import checkpoint as ckpt_lib


def build_mae_test_sets():
    base = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, MAE_MAX_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=True)])
    sets = [
        ds_lib.GrandStaffPreTrainWrapper(ds_lib.GrandStaffLMXDataset(
            GRAND_STAFF_ROOT_DIR, "samples.test.txt", img_transform=base)),
        ds_lib.OlimpicPreTrainWrapper(ds_lib.OlimpicDataset(
            OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.test.txt", img_transform=base)),
        ds_lib.OlimpicPreTrainWrapper(ds_lib.OlimpicDataset(
            OLIMPIC_SCANNED_ROOT_DIR, "samples.test.txt", img_transform=base)),
    ]
    return ds_lib.ConcatDataset(sets)


def build_vitomr_test_sets(tokenizer):
    base = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, OMR_MAX_IMG_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=False)])
    sets = [
        ds_lib.GrandStaffOMRTrainWrapper(ds_lib.GrandStaffLMXDataset(
            GRAND_STAFF_ROOT_DIR, "samples.test.txt", img_transform=base)),
        ds_lib.OlimpicDataset(OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.test.txt",
                              img_transform=base),
        ds_lib.OlimpicDataset(OLIMPIC_SCANNED_ROOT_DIR, "samples.test.txt",
                              img_transform=base),
    ]
    return ds_lib.ConcatDataset(sets)


def eval_mae(weights: str, batch_size: int = 64, num_workers: int = 16,
             cfg=None):
    """``cfg`` overrides the flagship config (tiny-config CI smoke tests);
    ``weights`` is always loaded through the checkpoint layer."""
    from .train.pre_train import _device_batch, make_eval_fn, set_up_mae

    cfg = cfg or set_up_mae()
    params = jax.tree.map(jnp.asarray, ckpt_lib.load_params(weights))
    test_ds = build_mae_test_sets()
    sampler = BucketBatchSampler(test_ds, default_bucket_boundaries(),
                                 batch_size, shuffle=False)
    loader = PrefetchLoader(test_ds, sampler,
                            lambda ex: pack_mae_batch(ex, cfg.encoder),
                            num_workers)
    eval_fn = make_eval_fn(cfg)
    rng = jax.random.PRNGKey(0)
    total, n = 0.0, 0
    for batch in loader:
        rng, r = jax.random.split(rng)
        total += float(eval_fn(params, _device_batch(batch), r))
        n += 1
    loss = total / max(n, 1)
    print(f"Average MAE test loss: {loss}")
    return loss


def eval_vitomr(weights: str, batch_size: int = 64, num_workers: int = 16,
                cfg=None):
    """``cfg`` overrides the flagship config (tiny-config CI smoke tests)."""
    from .train.omr_teacher_force_train import (make_eval_fn, set_up_vitomr,
                                                _device_batch)
    tokenizer = LmxTokenizer()
    cfg = cfg or set_up_vitomr(tokenizer)
    params = jax.tree.map(jnp.asarray, ckpt_lib.load_params(weights))
    test_ds = build_vitomr_test_sets(tokenizer)
    sampler = BucketBatchSampler(test_ds, default_bucket_boundaries(),
                                 batch_size, shuffle=False)
    loader = PrefetchLoader(
        test_ds, sampler,
        lambda ex: pack_omr_batch(ex, cfg.encoder, tokenizer,
                                  max_lmx_seq_len=cfg.decoder.max_lmx_seq_len),
        num_workers)
    eval_fn = make_eval_fn(cfg)
    total, n = 0.0, 0
    for batch in loader:
        total += float(eval_fn(params, _device_batch(batch)))
        n += 1
    loss = total / max(n, 1)
    print(f"Average ViTOMR test loss: {loss}")
    return loss


def dump_samples(model: str, weights: str, out_dir: str, num: int):
    """Qualitative sample dumps (reference: eval_model.py -d/-p flags,
    show_{mae,vitomr}_prediction)."""
    from pathlib import Path
    from .utils import visualize

    params = jax.tree.map(jnp.asarray, ckpt_lib.load_params(weights))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if model == "mae":
        from .train.pre_train import set_up_mae
        cfg = set_up_mae()
        ds = build_mae_test_sets()
        for i in range(min(num, len(ds))):
            inp, tgt = ds[i]
            visualize.show_mae_prediction(params, cfg, inp, tgt,
                                          str(out / f"sample_{i}.png"))
    else:
        from .train.omr_teacher_force_train import set_up_vitomr
        tokenizer = LmxTokenizer()
        cfg = set_up_vitomr(tokenizer)
        ds = build_vitomr_test_sets(tokenizer)
        for i in range(min(num, len(ds))):
            img, lmx = ds[i][:2]  # one __getitem__: each call re-decodes
            ids = tokenizer.encode(lmx) if isinstance(lmx, str) else lmx
            visualize.show_vitomr_prediction(params, cfg, tokenizer, img, ids,
                                             str(out / f"sample_{i}"))
    print(f"Wrote {min(num, len(ds))} sample dumps to {out}")


def main():
    ap = argparse.ArgumentParser(description="Evaluate MAE or ViTOMR checkpoints")
    ap.add_argument("model", choices=["mae", "vitomr"])
    ap.add_argument("weights", help="orbax checkpoint path")
    ap.add_argument("-c", "--from-checkpoint", action="store_true",
                    help="accepted for reference-CLI compatibility; the "
                         "checkpoint form (train state vs bare params) is "
                         "auto-detected by checkpoint.load_params either way")
    ap.add_argument("-b", "--batch-size", type=int, default=64)
    ap.add_argument("-d", "--sample-dir", default=None,
                    help="also dump sample predictions to this directory")
    ap.add_argument("-p", "--num-samples", type=int, default=5)
    args = ap.parse_args()
    if args.model == "mae":
        eval_mae(args.weights, args.batch_size)
    else:
        eval_vitomr(args.weights, args.batch_size)
    if args.sample_dir:
        dump_samples(args.model, args.weights, args.sample_dir, args.num_samples)


if __name__ == "__main__":
    main()
