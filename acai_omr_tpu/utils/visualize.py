"""Qualitative prediction dumps (MAE reconstructions, ViTOMR transcriptions).

Parity with the reference's sample-dump harnesses (reference:
acai_omr/utils/utils.py:387-455 show_mae_prediction/show_vitomr_prediction):
render input / reconstruction / target side by side, or save the predicted vs
target LMX token sequences for one example.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def show_mae_prediction(params, cfg, input_img, target_img, save_path: str,
                        rng=None):
    """Run one example through the MAE and save an input/recon/target figure.

    input_img/target_img: (C, H, W) float arrays. Returns the masked loss.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import mae as mae_lib, vit_encoder
    from ..ops import patchify as patch_ops

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pb = vit_encoder.batchify([input_img], cfg.encoder)
    tgt = np.zeros_like(pb.patches)
    tp = patch_ops.patchify(np.asarray(target_img, np.float32), cfg.patch_size)
    tgt[0, :tp.shape[0]] = tp
    pred, loss_mask, target = mae_lib.forward(
        params, cfg, rng, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(pb.lengths),
        jnp.asarray(tgt))
    loss = float(mae_lib.mae_loss(pred, loss_mask, target))

    hp, wp = pb.dims[0]
    n = hp * wp
    recon = patch_ops.unpatchify(np.asarray(pred)[0, :n], hp, wp, cfg.patch_size)

    fig, axs = plt.subplots(1, 3, figsize=(16, 4))
    fig.suptitle(f"Loss: {loss}")
    for ax, img, title in zip(
            axs, [input_img, recon, target_img],
            ["Input image", "MAE reconstruction prediction", "Target image"]):
        ax.imshow(np.asarray(img)[0], cmap="gray")
        ax.set_title(title)
    fig.savefig(save_path)
    plt.close(fig)
    return loss


def show_vitomr_prediction(params, cfg, tokenizer, img, lmx_ids,
                           sample_save_dir: str):
    """Teacher-forced prediction dump: input image + pred.txt + target_seq.txt
    (reference: utils.py:415-455)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import omr_decoder, vit_encoder, vitomr as vitomr_lib

    out = Path(sample_save_dir)
    out.mkdir(parents=True, exist_ok=True)

    pb = vit_encoder.batchify([img], cfg.encoder)
    inputs, targets, lmx_valid = omr_decoder.batchify_and_split_lmx_seqs(
        [np.asarray(lmx_ids, np.int32)], cfg.decoder.pad_idx,
        max_len=cfg.decoder.max_lmx_seq_len)
    logits = vitomr_lib.forward_teacher_forced(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid), jnp.asarray(inputs),
        jnp.asarray(lmx_valid))
    loss = float(vitomr_lib.omr_ce_loss(logits, jnp.asarray(targets),
                                        cfg.decoder.pad_idx))
    pred_ids = np.asarray(jnp.argmax(logits, axis=-1))[0]
    pred = " ".join(tokenizer.idxs_to_tokens[int(i)] for i in pred_ids)
    target = " ".join(tokenizer.idxs_to_tokens[int(i)] for i in targets[0])

    fig, ax = plt.subplots(figsize=(12, 8))
    fig.suptitle(f"Sequences cross entropy loss: {loss}")
    ax.imshow(np.asarray(img)[0], cmap="gray")
    ax.set_title("Input image")
    fig.savefig(out / "input_image.png")
    plt.close(fig)
    (out / "pred.txt").write_text(pred)
    (out / "target_seq.txt").write_text(target)
    return loss
