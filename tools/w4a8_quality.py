"""int4 weight-quantization quality study + W4A8 arm validation (VERDICT r4 #1).

Stage 1 (``--sweep``): pure weight-granularity sweep — quantize the decoder's
six per-layer weight matrices to int4 symmetric at several scale
granularities, dequantize back to fp32, and decode the synthetic-task
validation split through the normal per-op path. Isolates the W4 quality
question (how many per-input-group scales does int4 need?) from any kernel
numerics, on trained weights (tools/grpo_evidence_run.py stage-2 checkpoint,
same pattern as tools/tp_w8a8_quality.py).

Stage 2 (default): run the actual W4A8 monolith kernel arm (interpret mode)
against the bf16 reference decode and report token agreement + gold accuracy
— the same bar W8A8 cleared (docs/tp_w8a8_quality_r4.json: 1.0000).

Reference anchor: the decode subsystem this extends,
/root/reference/acai_omr/models/kv_caching.py:258-302 (the reference decodes
bf16 only; every quantized arm is an extension held to its numerics).

Usage:
  python tools/w4a8_quality.py --ckpt .evidence/grpo_r4/tf/vitomr --sweep
  python tools/w4a8_quality.py --ckpt .evidence/grpo_r4/tf/vitomr \
      [--out docs/w4a8_quality_r5.json]
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

from tools.tp_w8a8_quality import decode_arm, gold_token_acc, token_agreement

INT4_QMAX = 7.0

DEC_MATS = (("blocks", "self_attn", "in_kernel"),
            ("blocks", "self_attn", "out", "kernel"),
            ("blocks", "cross_attn", "in_kernel"),
            ("blocks", "cross_attn", "out", "kernel"),
            ("blocks", "linear1", "kernel"),
            ("blocks", "linear2", "kernel"))


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, val):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = val


def quant_int4_groups(w, n_groups: int, qmax: float = INT4_QMAX):
    """Fake-quantize (L, IN, OUT) fp32 to int4 symmetric with ``n_groups``
    per-input-group x per-output-column scales (groups = contiguous equal
    row ranges). Returns the dequantized array (what the MXU dot + dequant
    would reconstruct exactly)."""
    w = np.asarray(w, np.float32)
    l, cin, cout = w.shape
    assert cin % n_groups == 0
    g = cin // n_groups
    wg = w.reshape(l, n_groups, g, cout)
    amax = np.abs(wg).max(axis=2, keepdims=True)
    # scales round to bf16 like the kernel's stored scale operand
    s = (np.maximum(amax, 1e-8) / qmax).astype(jnp.bfloat16).astype(np.float32)
    q = np.clip(np.round(wg / s), -qmax, qmax)
    return (q * s).reshape(l, cin, cout)


def fake_quant_decoder(params, n_groups: int, qmax: float = INT4_QMAX):
    import copy
    p = copy.deepcopy(jax.tree.map(np.asarray, params))
    for path in DEC_MATS:
        w = _get(p["decoder"], path)
        _set(p["decoder"], path, quant_int4_groups(w, n_groups, qmax))
    return jax.tree.map(jnp.asarray, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=".evidence/grpo_r4/tf/vitomr")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sweep", action="store_true",
                    help="granularity sweep only (no kernel arm)")
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

    results = {"ckpt": args.ckpt, "n_examples": len(imgs),
               "max_len": args.max_len}

    pallas_monolith.set_test_mode(force=False, interpret=True)
    print("[fp32 reference arm...]", flush=True)
    ref_seqs, ref_mask = decode_arm(params, cfg, latent, latent_valid,
                                    max_len=args.max_len)
    results["ref_gold_token_acc"] = round(
        gold_token_acc(ref_seqs, ref_mask, refs), 4)

    if args.sweep:
        # per-input-group granularities: 1 = per-column only, 2 = the nibble
        # halves (free in the packed-dot structure), then finer; int8
        # per-column as the known-good upper bar
        for label, (ng, qmax) in {
            "int8_col": (1, 127.0), "int4_col": (1, INT4_QMAX),
            "int4_g2": (2, INT4_QMAX), "int4_g4": (4, INT4_QMAX),
            "int4_g8": (8, INT4_QMAX),
        }.items():
            qp = fake_quant_decoder(params, ng, qmax)
            print(f"[{label} arm...]", flush=True)
            seqs, mask = decode_arm(qp, cfg, latent, latent_valid,
                                    max_len=args.max_len)
            agree, exact = token_agreement(ref_seqs, ref_mask, seqs, mask)
            results[f"{label}_token_agreement"] = round(agree, 4)
            results[f"{label}_exact_seq"] = round(exact, 4)
            results[f"{label}_gold_token_acc"] = round(
                gold_token_acc(seqs, mask, refs), 4)
            print(json.dumps({k: v for k, v in results.items()
                              if k.startswith(label)}), flush=True)
    else:
        # the real W4A8 kernel arm (interpret mode), vs the W8A8 bar
        pallas_monolith.set_test_mode(force=True, interpret=True)
        try:
            orig_w8a8, orig_w4a8 = pallas_monolith._W8A8, pallas_monolith._W4A8
            pallas_monolith._W8A8 = True
            pallas_monolith._W4A8 = False
            arms = {"w8a8": decode_arm(params, cfg, latent, latent_valid,
                                       cache_dtype=jnp.int8,
                                       max_len=args.max_len)}
            pallas_monolith._W4A8 = True
            arms["w4a8"] = decode_arm(params, cfg, latent, latent_valid,
                                      cache_dtype=jnp.int8,
                                      max_len=args.max_len)
        finally:
            pallas_monolith._W8A8 = orig_w8a8
            pallas_monolith._W4A8 = orig_w4a8
            pallas_monolith.set_test_mode(force=False, interpret=False)
        for name, (seqs, mask) in arms.items():
            agree, exact = token_agreement(ref_seqs, ref_mask, seqs, mask)
            results[f"{name}_token_agreement_vs_ref"] = round(agree, 4)
            results[f"{name}_exact_seq_vs_ref"] = round(exact, 4)
            results[f"{name}_gold_token_acc"] = round(
                gold_token_acc(seqs, mask, refs), 4)

    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
