"""Code-level end-to-end identity proof against the reference implementation.

The north-star parity claims (BASELINE configs 1-3) need the reference's
trained artifacts, which don't ship here — but the reference's *code* does
(read-only at /root/reference). This module closes the code-level half of the
proof: it initializes OUR flagship-config parameters, loads them into the
reference's own torch modules via the reverse converter
(models/torch_compat.vitomr_state_dict_from_params, strict=True), runs both
implementations end to end on CPU, and asserts:

1. **Greedy decode token identity** — the reference's actual
   ``ViTOMR.cached_greedy_generate`` + ``CachedTransformerDecoder``
   (reference models.py:600-615, kv_caching.py:258-302) vs our
   ``decode.generate(pe_offset=1)`` over a ragged synthetic image batch:
   identical token sequences, identical sequence masks, matching
   per-sequence avg log-probs. ``pe_offset=1`` reproduces the reference
   cached path's PE indexing (token ``t-1`` embedded with ``pos_embedding[t]``,
   models.py:576/523 — one row ahead of its own training forward).
2. **Teacher-forced CE loss equality** — reference ``ViTOMR.forward`` +
   ``OMRCELoss`` (models.py:716-736, 784-796) vs our
   ``forward_teacher_forced`` + ``omr_ce_loss`` on a fixed batch.
3. **MAE loss equality** — reference ``MAE.forward`` + ``MAELoss``
   (models.py:249-288) vs our ``mae.forward`` + ``mae_loss``, with both
   sides driven by the same shuffle noise (the reference's ``torch.rand``
   in ``mask_sequence`` is patched to replay it).
4. **State-dict round trip** — params -> torch state dict -> params is exact.

With these green, the only remaining parity dependency is the trained
weights themselves (tools/parity_gate.py stays ready for them).

Usage: python tools/reference_identity.py [--tiny]   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_ROOT = Path(os.environ.get("ACAI_REFERENCE_ROOT", "/root/reference"))


def available() -> bool:
    return (REF_ROOT / "acai_omr" / "models" / "models.py").is_file()


_ref_cache = {}


def import_reference():
    """Import the reference package (stubbing flask, which its __init__
    imports for the web app but the model code never touches)."""
    if "models" in _ref_cache:
        return _ref_cache["models"]
    if "flask" not in sys.modules:
        flask_stub = types.ModuleType("flask")
        flask_stub.Flask = object
        sys.modules["flask"] = flask_stub
    if str(REF_ROOT) not in sys.path:
        sys.path.insert(0, str(REF_ROOT))
    import acai_omr.models.models as ref_models

    _ref_cache["models"] = ref_models
    return ref_models


# ---------------------------------------------------------------------------
# config + weight plumbing
# ---------------------------------------------------------------------------

def make_cfg(tiny: bool):
    """Our ViTOMRConfig: flagship (train/omr_teacher_force_train.set_up_vitomr)
    or a structurally identical tiny config for fast CI."""
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.train.omr_teacher_force_train import set_up_vitomr

    if not tiny:
        return set_up_vitomr()
    return ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=12, pe_max_width=24,
                              num_layers=2, hidden_dim=32, num_heads=4,
                              mlp_dim=64, dropout=0.0, fine_tune_depth=2),
        decoder=DecoderConfig(max_lmx_seq_len=64, num_layers=2, hidden_dim=32,
                              num_heads=4, mlp_dim=64, dropout=0.0),
        transition_head_dim=48)


def build_reference_vitomr(cfg, max_batch_size: int, use_caching: bool = True):
    """Instantiate the reference's own TeacherForcedViTOMR (FineTuneOMREncoder
    + Sequential transition head + cached OMRDecoder, models.py:649-661) at
    our config's dimensions. Carries both the training ``forward``
    (models.py:722-736) and the inherited cached greedy machinery
    (models.py:600-615)."""
    import torch

    ref = import_reference()
    from acai_omr_tpu.config import LMX_VOCAB_PATH

    ec, dc = cfg.encoder, cfg.decoder
    encoder = ref.FineTuneOMREncoder(
        ec.patch_size, ec.pe_max_height, ec.pe_max_width,
        fine_tune_depth=ec.fine_tune_depth or ec.num_layers,
        num_layers=ec.num_layers, hidden_dim=ec.hidden_dim,
        num_heads=ec.num_heads, mlp_dim=ec.mlp_dim, transformer_dropout=0.0)
    decoder = ref.OMRDecoder(
        dc.max_lmx_seq_len, str(LMX_VOCAB_PATH), num_layers=dc.num_layers,
        hidden_dim=dc.hidden_dim, num_heads=dc.num_heads, mlp_dim=dc.mlp_dim,
        transformer_dropout=0.0, use_caching=use_caching,
        max_batch_size=max_batch_size,
        cache_dtype=torch.float32 if use_caching else None)
    model = ref.TeacherForcedViTOMR(
        encoder, None, decoder, transition_head_dim=cfg.transition_head_dim,
        transition_head_dropout=0.0)
    return model


def load_params_into_reference(model, params, cfg):
    import torch
    from acai_omr_tpu.models import torch_compat

    ec = cfg.encoder
    sd = torch_compat.vitomr_state_dict_from_params(
        params, ec.fine_tune_depth or ec.num_layers)
    model.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                          strict=True)
    model.eval()


def _synthetic_images(cfg, seed: int, tiny: bool):
    rng = np.random.default_rng(seed)
    p = cfg.encoder.patch_size
    if tiny:
        shapes = [(2 * p, 5 * p), (1 * p, 3 * p), (3 * p, 2 * p)]
    else:
        shapes = [(4 * p, 7 * p), (3 * p, 4 * p), (2 * p, 6 * p)]
    return [rng.random((1, h, w), dtype=np.float32) for (h, w) in shapes]


# ---------------------------------------------------------------------------
# check 1: greedy decode token identity
# ---------------------------------------------------------------------------

def check_greedy_identity(tiny: bool = False, seed: int = 0,
                          max_len: int = 32) -> dict:
    import torch

    import jax.numpy as jnp
    import jax

    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.models import vit_encoder, vitomr

    cfg = make_cfg(tiny)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(seed), cfg)
    imgs = _synthetic_images(cfg, seed + 1, tiny)
    b = len(imgs)

    # --- ours ---------------------------------------------------------------
    pb = vit_encoder.batchify(imgs, cfg.encoder, bucket_multiple=8)
    latent, latent_valid = vitomr.encode_image(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        compute_dtype=jnp.float32, deterministic=True)
    seqs, lps, mask = decode_lib.generate(
        params["decoder"], cfg.decoder, latent, latent_valid, max_len=max_len,
        initial_segment=max_len, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32, pe_offset=1)
    seqs, lps, mask = map(np.asarray, (seqs, lps, mask))

    # --- the reference's own cached greedy machinery -------------------------
    model = build_reference_vitomr(cfg, max_batch_size=b)
    load_params_into_reference(model, params, cfg)
    with torch.no_grad():
        t_lat, t_pad = model.encoder([torch.from_numpy(i) for i in imgs])
        t_lat = model.transition_head(t_lat)
        r_seqs, r_lps, r_mask = model.cached_greedy_generate(
            t_lat, t_pad, max_len=max_len)
    r_seqs, r_lps, r_mask = (r_seqs.numpy(), r_lps.numpy(), r_mask.numpy())

    rows = []
    identical = True
    max_lp_diff = 0.0
    for i in range(b):
        n_ref = int(r_mask[i].sum())
        n_ours = int(mask[i].sum())
        toks_ref = r_seqs[i][r_mask[i]].tolist()
        toks_ours = seqs[i][mask[i]].tolist()
        same = toks_ref == toks_ours
        identical &= same and (n_ref == n_ours)
        # avg log prob over generated tokens (routes.py confidence semantics)
        alp_ref = float(r_lps[i][r_mask[i]].sum() / max(n_ref - 1, 1))
        alp_ours = float(lps[i][mask[i]].sum() / max(n_ours - 1, 1))
        max_lp_diff = max(max_lp_diff, abs(alp_ref - alp_ours))
        row = {"len": n_ref, "identical": same}
        if not same:
            row["first_divergence"] = next(
                (j for j, (a, c) in enumerate(zip(toks_ref, toks_ours)) if a != c),
                min(n_ref, n_ours))
        rows.append(row)
    return {"status": "ok" if (identical and max_lp_diff < 1e-3) else "MISMATCH",
            "identical_tokens": identical,
            "max_avg_log_prob_diff": round(max_lp_diff, 8),
            "rows": rows}


# ---------------------------------------------------------------------------
# check 2: teacher-forced CE loss equality
# ---------------------------------------------------------------------------

def check_ce_loss(tiny: bool = False, seed: int = 0,
                  label_smoothing: float = 0.0) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from acai_omr_tpu.models import vit_encoder, vitomr

    cfg = make_cfg(tiny)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(seed), cfg)
    imgs = _synthetic_images(cfg, seed + 2, tiny)
    b = len(imgs)
    dc = cfg.decoder

    rng = np.random.default_rng(seed + 3)
    lens = [9, 6, 4]
    seqs = []
    for n in lens:
        body = rng.integers(3, dc.vocab_size, size=n).astype(np.int64)
        seqs.append(np.concatenate([[dc.bos_idx], body, [dc.eos_idx]]))

    # --- reference: ViTOMR.forward + OMRCELoss -------------------------------
    model = build_reference_vitomr(cfg, max_batch_size=b, use_caching=False)
    load_params_into_reference(model, params, cfg)
    ref = import_reference()
    with torch.no_grad():
        pred, target = model([(torch.from_numpy(i), torch.from_numpy(s))
                              for i, s in zip(imgs, seqs)])
        ref_loss = float(ref.OMRCELoss(dc.pad_idx, label_smoothing)(pred, target))

    # --- ours ----------------------------------------------------------------
    t_max = max(len(s) for s in seqs)
    padded = np.full((b, t_max), dc.pad_idx, dtype=np.int32)
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = s
    input_seqs, target_seqs = padded[:, :-1], padded[:, 1:]
    lmx_valid = input_seqs != dc.pad_idx

    pb = vit_encoder.batchify(imgs, cfg.encoder, bucket_multiple=8)
    logits = vitomr.forward_teacher_forced(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(input_seqs),
        jnp.asarray(lmx_valid), compute_dtype=jnp.float32, deterministic=True)
    our_loss = float(vitomr.omr_ce_loss(logits, jnp.asarray(target_seqs),
                                        dc.pad_idx, label_smoothing))
    diff = abs(ref_loss - our_loss)
    return {"status": "ok" if diff < 1e-4 else "MISMATCH",
            "ref_loss": round(ref_loss, 8), "our_loss": round(our_loss, 8),
            "abs_diff": round(diff, 9)}


# ---------------------------------------------------------------------------
# check 3: MAE loss equality (shared shuffle noise)
# ---------------------------------------------------------------------------

def check_mae_loss(tiny: bool = False, seed: int = 0) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from acai_omr_tpu.models import mae as mae_lib
    from acai_omr_tpu.models import torch_compat, vit_encoder
    from acai_omr_tpu.models.mae import MaeConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig

    if tiny:
        cfg = MaeConfig(
            encoder=EncoderConfig(patch_size=16, pe_max_height=12,
                                  pe_max_width=24, num_layers=2, hidden_dim=32,
                                  num_heads=4, mlp_dim=64),
            mask_ratio=0.75, decoder_num_layers=2, decoder_hidden_dim=24,
            decoder_num_heads=4, decoder_mlp_dim=48)
    else:
        from acai_omr_tpu.train.pre_train import set_up_mae
        cfg = set_up_mae()

    params = mae_lib.init_mae_params(jax.random.PRNGKey(seed), cfg)
    ec = cfg.encoder
    rng = np.random.default_rng(seed + 4)
    p = ec.patch_size
    shapes = [(2 * p, 5 * p), (3 * p, 3 * p)] if tiny else [(4 * p, 6 * p), (3 * p, 5 * p)]
    imgs = [rng.random((1, h, w), dtype=np.float32) for (h, w) in shapes]

    pb = vit_encoder.batchify(imgs, ec, bucket_multiple=8)
    noise = rng.random((len(imgs), pb.patches.shape[1]), dtype=np.float32)

    # --- ours ----------------------------------------------------------------
    pred, loss_mask, target = mae_lib.forward(
        params, cfg, None, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(pb.lengths),
        jnp.asarray(pb.patches), compute_dtype=jnp.float32,
        mask_noise=jnp.asarray(noise))
    our_loss = float(mae_lib.mae_loss(pred, loss_mask, target))

    # --- reference: MAE.forward + MAELoss with replayed shuffle noise --------
    ref = import_reference()
    model = ref.MAE(cfg.mask_ratio, p, ec.pe_max_height, ec.pe_max_width,
                    encoder_hidden_dim=ec.hidden_dim,
                    decoder_hidden_dim=cfg.decoder_hidden_dim,
                    encoder_kwargs={"num_layers": ec.num_layers,
                                    "num_heads": ec.num_heads,
                                    "mlp_dim": ec.mlp_dim},
                    decoder_kwargs={"num_layers": cfg.decoder_num_layers,
                                    "num_heads": cfg.decoder_num_heads,
                                    "mlp_dim": cfg.decoder_mlp_dim})
    sd = torch_compat.mae_state_dict_from_params(params)
    model.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                          strict=True)
    model.eval()

    # replay our (B, L) noise through the reference's per-image torch.rand
    # calls (mask_sequence, models.py:106-125)
    noise_rows = [torch.from_numpy(noise[i, : int(pb.lengths[i])].copy())
                  for i in range(len(imgs))]
    real_rand = torch.rand

    def fake_rand(*size, **kwargs):
        n = size[0] if size else kwargs.get("size")
        expect = noise_rows[fake_rand.i]
        assert n == expect.shape[0], (n, expect.shape)
        fake_rand.i += 1
        return expect.clone()

    fake_rand.i = 0
    torch.rand = fake_rand
    try:
        with torch.no_grad():
            batch = [(torch.from_numpy(i), torch.from_numpy(i)) for i in imgs]
            r_pred, r_mask, r_target = model(batch)
            ref_loss = float(ref.MAELoss()(r_pred, r_mask, r_target))
    finally:
        torch.rand = real_rand
    assert fake_rand.i == len(imgs)

    diff = abs(ref_loss - our_loss)
    return {"status": "ok" if diff < 1e-4 else "MISMATCH",
            "ref_loss": round(ref_loss, 8), "our_loss": round(our_loss, 8),
            "abs_diff": round(diff, 9)}


# ---------------------------------------------------------------------------
# check 4: state-dict round trip
# ---------------------------------------------------------------------------

def check_roundtrip(tiny: bool = True, seed: int = 0) -> dict:
    import jax

    from acai_omr_tpu.models import torch_compat, vitomr

    cfg = make_cfg(tiny)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(seed), cfg)
    sd = torch_compat.vitomr_state_dict_from_params(
        params, cfg.encoder.fine_tune_depth)
    back = torch_compat.vitomr_params_from_torch(sd)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    max_diff = 0.0
    for path, leaf in flat_a:
        other = flat_b[path]
        assert np.asarray(leaf).shape == np.asarray(other).shape, path
        max_diff = max(max_diff, float(np.abs(np.asarray(leaf, np.float64)
                                              - np.asarray(other, np.float64)).max()))
    return {"status": "ok" if max_diff == 0.0 else "MISMATCH",
            "max_abs_diff": max_diff, "num_keys": len(sd)}


def run_all(tiny: bool = False) -> dict:
    if not available():
        return {"status": f"skipped: reference not mounted at {REF_ROOT}"}
    # both sides on CPU fp32 (no-op if a jax backend is already initialized)
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    result = {
        "greedy_token_identity": check_greedy_identity(tiny),
        "teacher_forced_ce": check_ce_loss(tiny),
        "teacher_forced_ce_smoothed": check_ce_loss(tiny, label_smoothing=0.1),
        "mae_loss": check_mae_loss(tiny),
        "state_dict_roundtrip": check_roundtrip(tiny),
    }
    result["status"] = ("ok" if all(v["status"] == "ok" for v in result.values())
                        else "MISMATCH")
    result["config"] = "tiny" if tiny else "flagship"
    return result


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    out = run_all(tiny=args.tiny)
    print(json.dumps(out))
    raise SystemExit(0 if out["status"] == "ok" else 1)
