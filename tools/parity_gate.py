"""One-command reference-parity gate: ``make parity``.

North-star claims that can only be proven with the reference's trained
artifacts (BASELINE.json configs 1-3; reference README.md:63-64):

1. MAE masked-pixel MSE 0.159 on the held-out test mix
   (reference misc/logs/mae_eval.log:65),
2. teacher-forced CE 0.056 (misc/logs/vitomr_eval.log:78),
3. token-identical greedy decode on the docs example images
   (docs/docs_images/{ballade,liebesleid_scan,bethena_phone}).

Neither the datasets nor ``pretrained_mae.pth`` / ``vitomr.pth`` ship with
this snapshot, so the gate degrades gracefully: every sub-check that is
missing an artifact reports ``"skipped: <what's missing>"`` instead of
failing, and the gate exits 0 unless a check RAN and MISMATCHED. Emits ONE
JSON line so CI/driver logs stay greppable.

Artifact discovery (all overridable):
    ACAI_REF_MAE_PTH     reference pretrained_mae.pth   (default: ./pretrained_mae.pth)
    ACAI_REF_VITOMR_PTH  reference vitomr.pth           (default: ./vitomr.pth)
    ACAI_REF_DOCS_DIR    docs example images            (default: /root/reference/docs/docs_images)
    ACAI_REF_LMX_DIR     reference per-image LMX decodes to diff against
                         (<image-stem>.lmx files produced by running the
                         reference's vitomr_inference on the same images)
    dataset roots        acai_omr_tpu/config.py env vars

Usage:  python tools/parity_gate.py [--fast]   # or: make parity
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DOCS_IMAGES = ("ballade.png", "liebesleid_scan.png", "bethena_phone.jpg")


def _dataset_roots_present() -> list[str]:
    from acai_omr_tpu import config

    missing = []
    for name in ("GRAND_STAFF_ROOT_DIR", "OLIMPIC_SYNTHETIC_ROOT_DIR",
                 "OLIMPIC_SCANNED_ROOT_DIR"):
        if not Path(getattr(config, name)).is_dir():
            missing.append(name)
    return missing


def check_loss(model: str, pth: Path, batch_size: int) -> dict:
    from tools import verify_reference_losses as vrl
    from acai_omr_tpu import eval_model

    missing = _dataset_roots_present()
    if not pth.is_file():
        return {"status": f"skipped: {pth} not mounted"}
    if missing:
        return {"status": f"skipped: dataset roots missing ({', '.join(missing)})"}
    params = vrl.load_params(model, str(pth), None)
    loss = vrl._eval_with_params(eval_model, model, params, batch_size)
    expected = vrl.EXPECTED[model]
    ok = abs(loss - expected) <= 0.005
    return {"status": "ok" if ok else "MISMATCH",
            "loss": round(loss, 6), "expected": round(expected, 6)}


def check_decode(vitomr_pth: Path, docs_dir: Path, lmx_dir: Path | None,
                 max_len: int) -> dict:
    """Greedy-decode the docs examples with the reference weights through OUR
    stack; token-diff against the reference's own decodes when provided."""
    if not vitomr_pth.is_file():
        return {"status": f"skipped: {vitomr_pth} not mounted"}
    imgs = [docs_dir / n for n in DOCS_IMAGES if (docs_dir / n).is_file()]
    if not imgs:
        return {"status": f"skipped: no docs images under {docs_dir}"}

    from PIL import Image
    from tools import verify_reference_losses as vrl
    from acai_omr_tpu.data import transforms as tf_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.inference.vitomr_inference import inference
    from acai_omr_tpu.train.omr_teacher_force_train import set_up_vitomr
    from acai_omr_tpu import config

    tok = LmxTokenizer()
    cfg = set_up_vitomr(tok)
    params = vrl.load_params("vitomr", str(vitomr_pth), None)
    transform = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(config.PATCH_SIZE, config.OMR_MAX_IMG_SEQ_LEN,
                             config.PE_MAX_HEIGHT, config.PE_MAX_WIDTH,
                             crop_imgs=True)])

    per_image = {}
    identical = []
    for path in imgs:
        img = transform(Image.open(path).convert("L"))
        lmx, _ = inference(params, cfg, img, max_len)
        entry = {"tokens": len(lmx.split()),
                 "sha1": hashlib.sha1(lmx.encode()).hexdigest()[:12]}
        ref = (lmx_dir / f"{path.stem}.lmx") if lmx_dir else None
        if ref and ref.is_file():
            ref_lmx = ref.read_text().split()
            ours = lmx.split()
            entry["token_identical"] = ours == ref_lmx
            identical.append(entry["token_identical"])
            if not entry["token_identical"]:
                first = next((i for i, (a, b) in enumerate(zip(ours, ref_lmx))
                              if a != b), min(len(ours), len(ref_lmx)))
                entry["first_divergence"] = first
        per_image[path.stem] = entry

    if not identical:
        status = "decoded (no reference LMX mounted to diff against — set ACAI_REF_LMX_DIR)"
    else:
        status = "ok" if all(identical) else "MISMATCH"
    return {"status": status, "images": per_image}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="smaller eval batches / shorter decode budget")
    args = ap.parse_args()

    batch = 16 if args.fast else 64
    max_len = 512 if args.fast else 1536
    mae_pth = Path(os.environ.get("ACAI_REF_MAE_PTH", "pretrained_mae.pth"))
    vit_pth = Path(os.environ.get("ACAI_REF_VITOMR_PTH", "vitomr.pth"))
    docs = Path(os.environ.get("ACAI_REF_DOCS_DIR",
                               "/root/reference/docs/docs_images"))
    lmx_dir = os.environ.get("ACAI_REF_LMX_DIR")
    lmx_dir = Path(lmx_dir) if lmx_dir else None

    from tools import reference_identity

    result = {
        "mae_mse": check_loss("mae", mae_pth, batch),
        "vitomr_ce": check_loss("vitomr", vit_pth, batch),
        "decode": check_decode(vit_pth, docs, lmx_dir, max_len),
        # Code-level half of the north star: our flagship-config params loaded
        # into the reference's own torch modules, both stacks run end to end
        # on CPU — identical greedy tokens + equal CE/MAE losses
        # (tools/reference_identity.py). Runs whenever /root/reference is
        # mounted; needs no trained artifacts.
        "code_level_identity": reference_identity.run_all(tiny=args.fast),
    }
    statuses = [v["status"] for v in result.values()]
    ran = [s for s in statuses if not s.startswith("skipped")]
    result["ok"] = (None if not ran
                    else all("MISMATCH" not in s for s in statuses))
    print(json.dumps(result))
    raise SystemExit(1 if result["ok"] is False else 0)


if __name__ == "__main__":
    main()
