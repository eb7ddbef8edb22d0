"""End-to-end three-stage pipeline exercise on a synthetic OMR task.

Generates a fully synthetic but *learnable* optical-music-recognition task:
random valid LMX sequences (delinearizable to MusicXML by our own
delinearizer) rendered as images where each token is a deterministic 64x16
glyph column. Then drives the REAL training stack end to end, exactly as the
reference pipeline does (SURVEY.md §3):

  1. MAE pretraining             (train/pre_train.py)
  2. teacher-forced / scheduled-sampling seq2seq  (train/omr_teacher_force_train.py)
     with the MAE->encoder weight transfer (vitomr_params_from_mae)
  3. GRPO fine-tuning            (train/omr_grpo_train.py, TEDn rewards)

and finally evaluates the trained model through the inference stack:
greedy KV-cached decode accuracy, beam-search accuracy, and int8-vs-bf16
token agreement on *trained* weights (the number docs/PERF.md defers to).

Run: python tools/e2e_pipeline_run.py [--fast]
"""

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.lmx.delinearizer import delinearize
from acai_omr_tpu.models import omr_decoder, vit_encoder, vitomr as vitomr_lib
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig
from acai_omr_tpu.models import decode as decode_lib

PITCHES = ["C4", "D4", "E4", "F4", "G4", "A4", "B4"]
DURS = ["eighth", "quarter", "half"]
PREFIX = "measure time beats:4 beat-type:4 clef:G2"
GLYPH_H, GLYPH_W = 64, 16


def make_lmx(rng: np.random.Generator, n_notes: int) -> str:
    notes = " ".join(
        f"{rng.choice(PITCHES)} voice:1 {rng.choice(DURS)}"
        for _ in range(n_notes))
    return f"{PREFIX} {notes}"


def _glyphs(vocab_size: int) -> np.ndarray:
    """Deterministic distinguishable glyph per token id: (V, 64, 16)."""
    y = np.arange(GLYPH_H)[:, None]
    x = np.arange(GLYPH_W)[None, :]
    ids = np.arange(vocab_size)[:, None, None]
    g = (np.sin((ids % 13 + 1) * 0.37 * y + ids * 0.61)
         * np.cos((ids % 7 + 1) * 0.53 * x + ids * 0.17))
    return (g * 0.5 + 0.5).astype(np.float32)


class SyntheticOmrDataset:
    """Items per ``kind``: "mae" -> (img, img); "omr" -> (img, ids);
    "grpo" -> (img, ids, musicxml)."""

    def __init__(self, tokenizer: LmxTokenizer, n: int, kind: str,
                 seed: int = 0, note_range=(2, 5)):
        self.tok = tokenizer
        self.kind = kind
        self.glyphs = _glyphs(tokenizer.vocab_size)
        rng = np.random.default_rng(seed)
        self.lmx = [make_lmx(rng, int(rng.integers(*note_range))) for _ in range(n)]
        self.ids = [tokenizer.encode(s) for s in self.lmx]
        self.xml = None
        if kind == "grpo":
            self.xml = [delinearize(s)[0] for s in self.lmx]

    def render(self, ids) -> np.ndarray:
        content = ids[1:-1]  # strip <bos>/<eos>
        img = np.concatenate([self.glyphs[i] for i in content], axis=1)
        return img[None, :, :]  # (1, 64, 16*n)

    def __len__(self):
        return len(self.lmx)

    def __getitem__(self, idx):
        img = self.render(self.ids[idx])
        if self.kind == "mae":
            return img, img
        if self.kind == "grpo":
            return img, self.ids[idx], self.xml[idx]
        return img, self.ids[idx]


def decode_eval(params, cfg, dataset, tokenizer, *, beam_size=0,
                cache_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                max_len=48, limit=32):
    """Greedy (or beam) decode over dataset items -> (token_acc, seq_acc, seqs)."""
    imgs = [dataset[i][0] for i in range(min(limit, len(dataset)))]
    refs = [dataset[i][1] for i in range(min(limit, len(dataset)))]
    pb = vit_encoder.batchify(imgs, cfg.encoder, bucket_multiple=32)
    latent, latent_valid = vitomr_lib.encode_image(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), compute_dtype=compute_dtype)
    if beam_size > 1:
        seqs, _, mask = decode_lib.beam_generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            beam_size=beam_size, max_len=max_len, compute_dtype=compute_dtype)
    else:
        seqs, _, mask = decode_lib.generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            max_len=max_len, compute_dtype=compute_dtype,
            cache_dtype=cache_dtype)
    seqs, mask = np.asarray(seqs), np.asarray(mask)
    tok_hits = tok_total = seq_hits = 0
    for row, ref in enumerate(refs):
        out = seqs[row][mask[row]]
        n = min(len(out), len(ref))
        tok_hits += int((out[:n] == ref[:n]).sum())
        tok_total += max(len(out), len(ref))
        seq_hits += int(len(out) == len(ref) and (out == ref).all())
    return tok_hits / max(tok_total, 1), seq_hits / len(refs), seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="minimal epochs (pipeline smoke, not convergence)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from acai_omr_tpu.utils import fast_prng
    fast_prng.enable()
    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="acai_e2e_"))
    print(f"workdir: {workdir}  device: {jax.devices()[0]}", flush=True)
    t_start = time.perf_counter()

    tok = LmxTokenizer()
    enc = EncoderConfig(patch_size=16, pe_max_height=4, pe_max_width=32,
                        num_layers=4, hidden_dim=128, num_heads=4, mlp_dim=256,
                        dropout=0.0, fine_tune_depth=4)  # tiny run: train all
    bucket_boundaries = [(64, 256), (64, 352), (64, 464)]

    # --- stage 1: MAE pretraining -----------------------------------------
    from acai_omr_tpu.train import pre_train
    mae_cfg = MaeConfig(encoder=enc, mask_ratio=0.75, decoder_num_layers=2,
                        decoder_hidden_dim=64, decoder_num_heads=4,
                        decoder_mlp_dim=128)
    mae_train = SyntheticOmrDataset(tok, 48 if args.fast else 384, "mae")
    mae_val = SyntheticOmrDataset(tok, 16, "mae", seed=1)
    mae_epochs = 2 if args.fast else 20
    mae_params, mae_stats = pre_train.pre_train(
        mae_cfg, mae_train, mae_val, epochs=mae_epochs, batch_size=16,
        warmup_epochs=1, checkpoint_freq=max(mae_epochs // 2, 1),
        model_dir=workdir / "mae", num_workers=2,
        bucket_boundaries=bucket_boundaries, compute_dtype=jnp.bfloat16)
    print(f"[stage 1] MAE loss {mae_stats['train_losses'][0]:.4f} -> "
          f"{mae_stats['train_losses'][-1]:.4f}", flush=True)
    assert mae_stats["train_losses"][-1] < mae_stats["train_losses"][0], \
        "MAE pretraining did not reduce loss"

    # --- stage 2: teacher-forced / scheduled-sampling seq2seq --------------
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    cfg = ViTOMRConfig(
        encoder=enc,
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=128,
                                             num_layers=4, hidden_dim=128,
                                             num_heads=4, mlp_dim=256,
                                             dropout=0.0),
        transition_head_dim=256, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = vitomr_lib.vitomr_params_from_mae(params, mae_params)  # transfer

    omr_train = SyntheticOmrDataset(tok, 48 if args.fast else 384, "omr")
    omr_val = SyntheticOmrDataset(tok, 16, "omr", seed=1)
    tf_epochs = 2 if args.fast else 160
    params, tf_stats = tf_train.omr_teacher_force_train(
        cfg, params, omr_train, omr_val, tok, epochs=tf_epochs, batch_size=16,
        warmup_epochs=2, checkpoint_freq=tf_epochs, model_dir=workdir / "tf",
        num_workers=2, base_lr=3e-4, fine_tune_base_lr=3e-4,
        # tiny run: keep mostly teacher-forced (anneal span 4x the run),
        # soft sampling throughout (no hard-switch recompile)
        tf_anneal_epochs=tf_epochs * 4, soft_epochs=tf_epochs,
        bucket_boundaries=bucket_boundaries, compute_dtype=jnp.bfloat16)
    print(f"[stage 2] CE loss {tf_stats['train_losses'][0]:.4f} -> "
          f"{tf_stats['train_losses'][-1]:.4f} "
          f"(val {tf_stats['val_losses'][-1]:.4f})", flush=True)

    # --- decode evaluation on trained weights ------------------------------
    train_tok_acc, train_seq_acc, greedy_seqs = decode_eval(
        params, cfg, omr_train, tok)
    val_tok_acc, val_seq_acc, _ = decode_eval(params, cfg, omr_val, tok)
    print(f"[eval] greedy token acc: train {train_tok_acc:.3f} "
          f"(seq {train_seq_acc:.3f}), val {val_tok_acc:.3f} "
          f"(seq {val_seq_acc:.3f})", flush=True)

    beam_tok_acc, beam_seq_acc, _ = decode_eval(params, cfg, omr_val, tok,
                                                beam_size=4)
    print(f"[eval] beam-4  token acc: val {beam_tok_acc:.3f} "
          f"(seq {beam_seq_acc:.3f})", flush=True)

    int8_tok_acc, int8_seq_acc, int8_seqs = decode_eval(
        params, cfg, omr_train, tok, cache_dtype=jnp.int8)
    n = min(greedy_seqs.shape[1], int8_seqs.shape[1])
    agree = float((greedy_seqs[:, :n] == int8_seqs[:, :n]).mean())
    print(f"[eval] int8-vs-bf16 on trained weights: token agreement "
          f"{agree:.4f}, int8 token acc {int8_tok_acc:.3f}", flush=True)

    # --- stage 3: GRPO ------------------------------------------------------
    from acai_omr_tpu.train import omr_grpo_train as grpo
    from acai_omr_tpu.train.grpo_rewards import (GRPOConfig, LossConfig,
                                                 RolloutConfig, UpdateConfig)
    import copy
    gcfg, gparams = grpo.set_up_grpo(cfg, params)
    grpo_config = GRPOConfig(
        rollout_config=RolloutConfig(group_size=4, max_actions=48, top_k=10,
                                     temperature=1.0),
        reward_config=copy.deepcopy(grpo.INITIAL_REWARD_CONFIG),
        loss_config=LossConfig(entropy_beta=0.02, lambda_ce=0.1),
        update_config=UpdateConfig(epsilon=0.2, update_epochs=2,
                                   max_grad_norm=1.0),
        mini_validation_freq=1000, checkpoint_freq=1000)
    grpo_ds = SyntheticOmrDataset(tok, 16, "grpo", seed=2)
    gparams2_state = grpo.grpo_train(
        gcfg, gparams, grpo_ds, tok, grpo_config=grpo_config,
        epochs=1, batch_size=4, lr=5e-6, model_dir=workdir / "grpo",
        compute_dtype=jnp.bfloat16, reward_workers=8,
        exploration_steps=10 ** 6)  # tiny run: keep exploration configs
    # grpo_train returns (params, stats)
    gparams2, gstats = gparams2_state
    rewards = [s["reward"] for s in gstats if "reward" in s]
    print(f"[stage 3] GRPO ran {len(gstats)} outer steps; "
          f"rewards {['%.3f' % r for r in rewards]}", flush=True)
    assert all(np.isfinite(r) for r in rewards)

    if not args.fast:
        # integration bar, not a convergence benchmark (measured on v5e:
        # token acc 0.78 train/0.77 val, seq acc 0.41 greedy / 0.44 beam-4,
        # int8-vs-bf16 agreement 1.0000, GRPO rewards ~10; ~28 min)
        assert train_tok_acc > 0.7, f"train decode acc too low: {train_tok_acc}"
    print(f"TOTAL {time.perf_counter() - t_start:.1f}s — E2E PIPELINE OK",
          flush=True)
    if args.workdir is None:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
