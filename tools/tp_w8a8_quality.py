"""TP-W8A8 decode-quality validation on TRAINED weights (VERDICT r4 item 4).

``ACAI_TP_W8A8=1`` (per-shard W8A8 under the tp=2 monolith — the B=1 latency
winner, docs/PERF.md) quantizes weights per SHARD row-max over half
contractions, i.e. a *different* quantization than single-chip W8A8 (which is
e2e-validated at token agreement 1.0000 on trained weights). This tool closes
the same gate for the TP composition: load a stage-2 checkpoint trained on
the synthetic OMR task (tools/grpo_evidence_run.py workdir/tf/vitomr — its
decoder is tp-monolith-shaped: e=256, h=4, mlp=1024), decode the validation
split through every int8 arm on the 8-virtual-device CPU mesh (monolith
kernels in interpret mode), and report token agreement vs the bf16 decode
plus decode accuracy vs gold for each arm.

Reference numerics anchor: vitomr_inference.py:64-69 (the reference decodes
bf16 only; every quantized arm here is an extension held to its numerics).

Usage:
  python tools/tp_w8a8_quality.py --ckpt <workdir>/tf/vitomr [--out out.json]

Runs on CPU (forces the platform itself; safe to launch from the axon
profile).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def decode_arm(params, cfg, latent, latent_valid, *, mesh=None,
               cache_dtype=jnp.bfloat16, max_len=48):
    # fp32 compute: CPU has no native bf16 (emulation is ~50x slower and
    # was the tool's first-version hang); quantization (the thing under
    # test) is orthogonal to the compute dtype, and fp32-on-CPU is the
    # repo-wide interpret-mode convention (tests/test_tp_monolith.py).
    # clear_caches: the W8A8/TP flags are module globals read at TRACE
    # time — the module-level decode_segment jit would otherwise silently
    # reuse the previous arm's program (the "0s arm" A/B-rot tell)
    import time
    jax.clear_caches()
    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.parallel import mesh as mesh_lib

    t0 = time.perf_counter()
    if mesh is None:
        seqs, _, mask = decode_lib.generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            max_len=max_len, initial_segment=max_len,
            compute_dtype=jnp.float32, cache_dtype=cache_dtype)
    else:
        seqs, _, mask = decode_lib.sharded_generate(
            params["decoder"], cfg.decoder, latent, latent_valid, mesh,
            axis=mesh_lib.DATA_AXIS, model_axis=mesh_lib.MODEL_AXIS,
            max_len=max_len, initial_segment=max_len,
            compute_dtype=jnp.float32, cache_dtype=cache_dtype)
    print(f"[arm done in {time.perf_counter() - t0:.0f}s: mesh={mesh is not None} "
          f"cache={cache_dtype.__name__}]", flush=True)
    return np.asarray(seqs), np.asarray(mask)


def token_agreement(ref, ref_mask, out, out_mask):
    """Mean per-row token agreement over the union length (disagreeing
    lengths count the tail as mismatch) + exact-sequence fraction."""
    hits = total = exact = 0
    for r in range(ref.shape[0]):
        a, b = ref[r][ref_mask[r]], out[r][out_mask[r]]
        n = min(len(a), len(b))
        hits += int((a[:n] == b[:n]).sum())
        total += max(len(a), len(b))
        exact += int(len(a) == len(b) and (a == b).all())
    return hits / max(total, 1), exact / ref.shape[0]


def gold_token_acc(seqs, mask, refs):
    hits = total = 0
    for r, ref in enumerate(refs):
        out = seqs[r][mask[r]]
        n = min(len(out), len(ref))
        hits += int((out[:n] == np.asarray(ref[:n])).sum())
        total += max(len(out), len(ref))
    return hits / max(total, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="stage-2 vitomr pytree (grpo_evidence_run workdir/tf/vitomr)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-len", type=int, default=48)
    ap.add_argument("--limit", type=int, default=16)
    args = ap.parse_args()

    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import vit_encoder
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.ops import pallas_monolith
    from acai_omr_tpu.parallel import mesh as mesh_lib
    from acai_omr_tpu.utils import checkpoint as ckpt_lib
    from tools.e2e_pipeline_run import SyntheticOmrDataset

    tok = LmxTokenizer()
    enc = EncoderConfig(patch_size=16, pe_max_height=4, pe_max_width=32,
                        num_layers=4, hidden_dim=128, num_heads=4,
                        mlp_dim=256, dropout=0.0, fine_tune_depth=4)
    cfg = ViTOMRConfig(
        encoder=enc,
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=128,
                                             num_layers=4, hidden_dim=256,
                                             num_heads=4, mlp_dim=1024,
                                             dropout=0.0),
        transition_head_dim=256, transition_head_dropout=0.0)
    params = jax.tree.map(jnp.asarray, ckpt_lib.load_params(args.ckpt))

    ds = SyntheticOmrDataset(tok, args.limit, "omr", seed=1)
    imgs = [ds[i][0] for i in range(len(ds))]
    refs = [ds[i][1] for i in range(len(ds))]
    pb = vit_encoder.batchify(imgs, cfg.encoder, bucket_multiple=32)
    latent, latent_valid = vitomr_lib.encode_image(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        compute_dtype=jnp.float32)
    print(f"[encoded {latent.shape}]", flush=True)

    # (1 data x 2 model): the interpret-mode emulation executes the mesh's
    # devices serially, so extra data shards multiply wall-clock without
    # changing what the TP arms validate (per-shard W8A8 numerics)
    mesh = mesh_lib.make_mesh(1, 2, devices=jax.devices()[:2])
    results = {"ckpt": args.ckpt, "n_examples": len(imgs),
               "max_len": args.max_len}

    # fp32 reference arm (per-op path on CPU; the quality baseline every
    # quantized arm is held to)
    pallas_monolith.set_test_mode(force=False, interpret=True)
    print("[ref arm...]", flush=True)
    ref_seqs, ref_mask = decode_arm(params, cfg, latent, latent_valid,
                                    max_len=args.max_len)
    results["bf16_gold_token_acc"] = gold_token_acc(ref_seqs, ref_mask, refs)

    # kernel arms in interpret mode on the virtual mesh
    pallas_monolith.set_test_mode(force=True, interpret=True)
    arms = {}
    try:
        orig_w8a8, orig_tp = pallas_monolith._W8A8, pallas_monolith._TP_W8A8

        pallas_monolith._W8A8 = False
        arms["int8_single"] = decode_arm(params, cfg, latent, latent_valid,
                                         cache_dtype=jnp.int8,
                                         max_len=args.max_len)
        pallas_monolith._W8A8 = True
        arms["w8a8_single"] = decode_arm(params, cfg, latent, latent_valid,
                                         cache_dtype=jnp.int8,
                                         max_len=args.max_len)
        pallas_monolith._W8A8 = False
        pallas_monolith._TP_W8A8 = False
        arms["int8_tp2"] = decode_arm(params, cfg, latent, latent_valid,
                                      mesh=mesh, cache_dtype=jnp.int8,
                                      max_len=args.max_len)
        pallas_monolith._W8A8 = True
        pallas_monolith._TP_W8A8 = True
        arms["tp_w8a8_tp2"] = decode_arm(params, cfg, latent, latent_valid,
                                         mesh=mesh, cache_dtype=jnp.int8,
                                         max_len=args.max_len)
    finally:
        pallas_monolith._W8A8, pallas_monolith._TP_W8A8 = orig_w8a8, orig_tp
        pallas_monolith.set_test_mode(force=False, interpret=False)

    for name, (seqs, mask) in arms.items():
        agree, exact = token_agreement(ref_seqs, ref_mask, seqs, mask)
        results[f"{name}_token_agreement_vs_bf16"] = round(agree, 4)
        results[f"{name}_exact_seq_vs_bf16"] = round(exact, 4)
        results[f"{name}_gold_token_acc"] = round(
            gold_token_acc(seqs, mask, refs), 4)

    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
