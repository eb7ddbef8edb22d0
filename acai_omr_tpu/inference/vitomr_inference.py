"""End-to-end inference: image -> LMX -> MusicXML (-> rendered image).

API parity with the reference inference module (reference:
acai_omr/inference/vitomr_inference.py:1-123): ``inference`` /
``streamed_inference`` entry points, ``delinearize`` and
``convert_back_to_img`` post-processing. Differences by design:

* delinearization is **in-process** (acai_omr_tpu.lmx) — no poetry/subprocess
  round trip (reference:24-38);
* the decode loop is the compiled KV-cached while-loop
  (models/decode.py), so per-token host work is zero; streaming chunks are
  small decode segments rather than per-token yields;
* the encoder runs in bf16 (the reference keeps it fp32 only because torch's
  nested-tensor path breaks under autocast, reference:64 — no such
  constraint here).
"""

from __future__ import annotations

import logging
import os
import subprocess
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .. import InferenceEvent
from ..config import (LMX_VOCAB_PATH, OMR_MAX_IMG_SEQ_LEN, PATCH_SIZE,
                      PE_MAX_HEIGHT, PE_MAX_WIDTH)
from ..data import transforms as tf_lib
from ..data.tokenizer import LmxTokenizer
from ..lmx import delinearizer as delin_lib
from ..models import decode as decode_lib
from ..models import vit_encoder, vitomr as vitomr_lib
from ..models.vitomr import ViTOMRConfig

logger = logging.getLogger(__name__)


def set_up_omr_inference(weights_path: str | None = None,
                         compute_dtype=jnp.bfloat16):
    """(cfg, params, tokenizer, base_img_transform) — reference:
    omr_teacher_force_train.py:265-284. Weights load from an orbax checkpoint
    when given, else random init (architecture-only use)."""
    from ..train.omr_teacher_force_train import set_up_vitomr
    tokenizer = LmxTokenizer(LMX_VOCAB_PATH)
    cfg = set_up_vitomr(tokenizer)
    if weights_path:
        from ..utils import checkpoint as ckpt_lib
        params = ckpt_lib.load_params(weights_path)
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    if compute_dtype == jnp.bfloat16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.dtype == jnp.float32 else x, params)
    base_img_transform = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, OMR_MAX_IMG_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=False),
    ])
    return cfg, params, tokenizer, base_img_transform


def encode_images(params, cfg: ViTOMRConfig, imgs, compute_dtype=jnp.bfloat16):
    """List of (C, H, W) arrays -> (img_latent, latent_valid) device arrays."""
    pb = vit_encoder.batchify(imgs, cfg.encoder)
    latent, latent_valid = vitomr_lib.encode_image_jit(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        compute_dtype=compute_dtype)
    return latent, latent_valid


def inference(params, cfg: ViTOMRConfig, img, max_inference_len: int = 1536,
              compute_dtype=jnp.bfloat16, beam_size: int = 1,
              cache_dtype=jnp.bfloat16):
    """Batched decode (reference: vitomr_inference.py:73-86) — greedy by
    default; ``beam_size > 1`` runs beam search, ``cache_dtype=jnp.int8``
    quantized KV caches (composes with beams via the per-op path).

    ``img``: one (C, H, W) array or a list of them (ragged sizes fine).
    Returns (seqs, log_probs, seq_mask) as numpy arrays.
    """
    imgs = img if isinstance(img, (list, tuple)) else [img]
    latent, latent_valid = encode_images(params, cfg, imgs, compute_dtype)
    if beam_size > 1:
        seqs, lps, mask = decode_lib.beam_generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            beam_size=beam_size, max_len=max_inference_len,
            compute_dtype=compute_dtype, cache_dtype=cache_dtype)
    else:
        seqs, lps, mask = decode_lib.generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            max_len=max_inference_len, compute_dtype=compute_dtype,
            cache_dtype=cache_dtype)
    return np.asarray(seqs), np.asarray(lps), np.asarray(mask)


def streamed_inference(params, cfg: ViTOMRConfig, img,
                       max_inference_len: int = 1536, flush_interval: int = 25,
                       compute_dtype=jnp.bfloat16):
    """Generator of InferenceEvent dicts (reference: :51-70)."""
    yield {"type": InferenceEvent.ENCODING_START.value, "payload": None}
    latent, latent_valid = encode_images(params, cfg, [img], compute_dtype)
    yield {"type": InferenceEvent.ENCODING_FINISH.value, "payload": None}
    for kind, payload in decode_lib.streamed_generate(
            params["decoder"], cfg.decoder, latent, latent_valid,
            max_len=max_inference_len, flush_interval=flush_interval,
            compute_dtype=compute_dtype):
        if kind == "step":
            yield {"type": InferenceEvent.STEP.value,
                   "payload": {"tokens": payload}}
        else:
            seqs, log_probs, mask = payload
            yield {"type": InferenceEvent.INFERENCE_FINISH.value,
                   "payload": {"sequence": np.asarray(seqs),
                               "log_probs": np.asarray(log_probs),
                               "mask": np.asarray(mask)}}


def delinearize(lmx_seq: str, lmx_seq_path: str, xml_file_path: str) -> dict:
    """LMX string -> .lmx + .musicxml files (reference: :17-38 — same return
    contract, but in-process instead of a subprocess)."""
    logger.info("Delinearizing lmx sequence (%d tokens)", len(lmx_seq.split()))
    Path(lmx_seq_path).write_text(lmx_seq)
    try:
        xml, problems = delin_lib.delinearize(lmx_seq)
    except delin_lib.DelinearizationError as e:
        logger.warning("Delinearization catastrophically failed: %s", e)
        return {"ok": False, "error": str(e)}
    Path(xml_file_path).write_text(xml)
    if problems:
        logger.warning("Caught problems with delinearization: %s", problems)
    return {"ok": True, "xml_file_path": xml_file_path,
            "delinearize_problems": problems}


def convert_back_to_img(xml_file_path: str, img_file_path: str) -> str | None:
    """Render MusicXML via musescore3 + imagemagick when installed
    (reference: :41-49); returns None when the toolchain is absent.

    The musescore intermediate lives NEXT TO the caller's output file, not
    at a fixed CWD name: the reference runs one request at a time, but this
    port's threaded WSGI server renders concurrently, and a shared
    ./mscore_out-1.png let request A return request B's score (round-5
    review)."""
    inter = str(Path(img_file_path).with_suffix("")) + ".mscore_out.png"
    inter1 = str(Path(img_file_path).with_suffix("")) + ".mscore_out-1.png"
    try:
        subprocess.run(["musescore3", "-o", inter, xml_file_path],
                       check=True, capture_output=True)
        subprocess.run(["convert", inter1, "-background", "white",
                        "-alpha", "remove", "-alpha", "off", img_file_path],
                       check=True, capture_output=True)
        os.remove(inter1)
        return img_file_path
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        logger.warning("musescore/imagemagick rendering unavailable: %s", e)
        return None


def main():
    import argparse
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description="Acai OMR TPU inference")
    ap.add_argument("image", help="path to a system image")
    ap.add_argument("-w", "--weights", default=None)
    ap.add_argument("-o", "--out-prefix", default="inference_result")
    ap.add_argument("-b", "--beam-size", type=int, default=1,
                    help="beam-search width (1 = greedy)")
    ap.add_argument("--int8-kv", action="store_true",
                    help="quantized int8 KV caches (faster decode, greedy only)")
    args = ap.parse_args()

    from PIL import Image
    cfg, params, tokenizer, transform = set_up_omr_inference(args.weights)
    img = transform(Image.open(args.image).convert("L"))
    seqs, log_probs, mask = inference(
        params, cfg, img, beam_size=args.beam_size,
        cache_dtype=jnp.int8 if args.int8_kv else jnp.bfloat16)
    for i in range(seqs.shape[0]):
        ids = seqs[i][mask[i]]
        lmx = tokenizer.decode(ids)
        avg_lp = float(log_probs[i][mask[i]].sum() / max(mask[i].sum(), 1))
        logger.info("Decoded: %s\nAverage log prob per token: %f", lmx, avg_lp)
        resp = delinearize(lmx, f"{args.out_prefix}.lmx", f"{args.out_prefix}.musicxml")
        if resp["ok"]:
            convert_back_to_img(resp["xml_file_path"], f"{args.out_prefix}.png")


if __name__ == "__main__":
    main()
