"""Verify reference-loss parity when datasets/weights are available.

BASELINE.json asks for 0.159 masked-pixel MSE (MAE) and 0.056 teacher-forced
CE (ViTOMR) on the held-out test mix. Neither the datasets nor the trained
reference weights ship with this snapshot, so the check can't run in CI; this
tool packages it for any machine that has them:

    python tools/verify_reference_losses.py mae \
        --torch-weights pretrained_mae.pth          # reference .pth, converted
    python tools/verify_reference_losses.py vitomr \
        --torch-weights vitomr.pth

Expects the reference's data/ layout (acai_omr_tpu/config.py paths; override
via env vars). With --torch-weights, the reference PyTorch state dict is
converted through models.torch_compat (weight-transfer parity is separately
tested against the shipped debug MAE checkpoint in
tests/test_debug_mae_weights.py); with --weights an orbax checkpoint is used.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EXPECTED = {"mae": 0.1589139682982496, "vitomr": 0.05576839766459551}


def load_params(model: str, torch_weights: str | None, weights: str | None):
    import jax.numpy as jnp
    import jax
    if torch_weights:
        import torch
        from acai_omr_tpu.models import torch_compat
        sd = torch.load(torch_weights, map_location="cpu")
        if isinstance(sd, dict) and "vitomr_state_dict" in sd:
            sd = sd["vitomr_state_dict"]
        if isinstance(sd, dict) and "mae_state_dict" in sd:
            sd = sd["mae_state_dict"]
        conv = (torch_compat.mae_params_from_torch if model == "mae"
                else torch_compat.vitomr_params_from_torch)
        return jax.tree.map(jnp.asarray, conv(sd))
    from acai_omr_tpu.utils import checkpoint as ckpt_lib
    return jax.tree.map(jnp.asarray, ckpt_lib.load_params(weights))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["mae", "vitomr"])
    ap.add_argument("--torch-weights", default=None,
                    help="reference .pth state dict (converted on the fly)")
    ap.add_argument("--weights", default=None, help="orbax checkpoint")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--tolerance", type=float, default=0.005)
    args = ap.parse_args()
    if not (args.torch_weights or args.weights):
        ap.error("one of --torch-weights / --weights required")

    from acai_omr_tpu import eval_model

    params = load_params(args.model, args.torch_weights, args.weights)
    loss = _eval_with_params(eval_model, args.model, params, args.batch_size)

    expected = EXPECTED[args.model]
    delta = abs(loss - expected)
    ok = delta <= args.tolerance
    print(f"{args.model}: loss={loss:.6f} expected={expected:.6f} "
          f"delta={delta:.6f} -> {'PARITY OK' if ok else 'MISMATCH'}")
    raise SystemExit(0 if ok else 1)


def _eval_with_params(eval_model, model: str, params, batch_size: int,
                      cfg=None, num_workers: int = 16):
    """Run the eval loops with pre-loaded params (bypassing checkpoint IO).
    ``cfg`` overrides the flagship config (tiny-config CI smoke tests)."""
    import jax
    from acai_omr_tpu.data.bucketing import (BucketBatchSampler,
                                             default_bucket_boundaries)
    from acai_omr_tpu.data.loader import (PrefetchLoader, pack_mae_batch,
                                          pack_omr_batch)
    from acai_omr_tpu.data.tokenizer import LmxTokenizer

    if model == "mae":
        from acai_omr_tpu.train.pre_train import (_device_batch, make_eval_fn,
                                                  set_up_mae)
        cfg = cfg or set_up_mae()
        ds = eval_model.build_mae_test_sets()
        pack = lambda ex: pack_mae_batch(ex, cfg.encoder)
        eval_fn = make_eval_fn(cfg)
        rng = jax.random.PRNGKey(0)
        run = lambda b: float(eval_fn(params, _device_batch(b), rng))
    else:
        from acai_omr_tpu.train.omr_teacher_force_train import (
            _device_batch, make_eval_fn, set_up_vitomr)
        tok = LmxTokenizer()
        cfg = cfg or set_up_vitomr(tok)
        ds = eval_model.build_vitomr_test_sets(tok)
        pack = lambda ex: pack_omr_batch(ex, cfg.encoder, tok,
                                         max_lmx_seq_len=cfg.decoder.max_lmx_seq_len)
        eval_fn = make_eval_fn(cfg)
        run = lambda b: float(eval_fn(params, _device_batch(b)))

    sampler = BucketBatchSampler(ds, default_bucket_boundaries(), batch_size,
                                 shuffle=False)
    loader = PrefetchLoader(ds, sampler, pack, num_workers=num_workers)
    total, n = 0.0, 0
    for batch in loader:
        total += run(batch)
        n += 1
    return total / max(n, 1)


if __name__ == "__main__":
    main()
