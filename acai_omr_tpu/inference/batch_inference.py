"""Throughput-oriented batched inference over ragged multi-resolution images.

The BASELINE "ragged multi-resolution batch inference" configuration: mixed
Musescore screenshots / PDF scans / phone photos in one request. Images are
grouped into encoder shape buckets (one compiled program per bucket), encoded,
and decoded with the KV-cached loop per group — maximum device utilization
with zero per-image Python in the hot path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..models import decode as decode_lib
from ..models import vit_encoder, vitomr as vitomr_lib
from ..models.vitomr import ViTOMRConfig


@dataclasses.dataclass
class BatchResult:
    lmx: list            # LMX string per image (input order)
    avg_log_probs: list  # mean per-token log prob per image
    seqs: list           # raw id arrays (trimmed, specials included)


def _bucket_key(img, cfg, bucket_multiple):
    p = cfg.encoder.patch_size
    hp, wp = img.shape[-2] // p, img.shape[-1] // p
    return vit_encoder.bucket_len(hp * wp, bucket_multiple)


def batch_inference(params, cfg: ViTOMRConfig, imgs, tokenizer, *,
                    max_inference_len: int = 1536, decode_batch: int = 32,
                    bucket_multiple: int = 128, beam_size: int = 1,
                    length_penalty: float = 0.6,
                    compute_dtype=jnp.bfloat16,
                    cache_dtype=jnp.bfloat16,
                    mesh=None, model_axis: str | None = None,
                    progress_cb=None,
                    progress_interval: int = 25) -> BatchResult:
    """Transcribe a list of (C, H, W) float arrays of arbitrary sizes.

    Groups by patch-count bucket, then runs encode+decode in ``decode_batch``
    chunks inside each group. Results are returned in input order.
    ``beam_size > 1`` switches the decode to beam search (quality over
    throughput; the effective decode batch is ``decode_batch * beam_size``
    rows). ``cache_dtype=jnp.int8`` enables quantized KV caches (~1.5x decode
    throughput on TPU via fused kernels; composes with beams via the per-op
    path; near- but not bit-identical tokens — see docs/PERF.md).

    ``mesh``: decode each bucket group over the device mesh
    (:func:`decode.sharded_generate` / :func:`decode.sharded_beam_generate`)
    — the batch is padded up to the data axis and shards get independent
    decode loops; ``model_axis`` adds tensor parallelism on top (heads/MLP
    split — the low-batch latency lever; beams ride the TP monolith too).

    ``progress_cb(img_indices, seqs, t, finished)``: mid-decode streaming
    hook (reference SSE STEP parity under dynamic batching, ui/routes.py:
    66-104): called every ``progress_interval`` decode steps per bucket
    group with the ORIGINAL image indices for the group's rows, the raw
    (rows, max_len) int32 sequence buffer so far, the decode position, and
    a per-row finished mask. Supported by the plain AND the ``mesh`` greedy
    decode paths (``sharded_generate`` streams the same merged
    segment-boundary pull per shard — multi-chip serving keeps the SSE
    contract); batch-pad rows never surface. Beam paths run their reorder
    loops device-side and don't surface mid-decode state.
    """
    order = sorted(range(len(imgs)),
                   key=lambda i: _bucket_key(imgs[i], cfg, bucket_multiple))
    # TP decode: shuffle+place the decoder weights ONCE for all bucket groups
    # (the shuffle emits fresh arrays — per-call it would re-upload ~all
    # decoder weights through the device transfer path every group)
    tp_params = None
    if mesh is not None and model_axis is not None \
            and mesh.shape[model_axis] > 1:
        tp_params = decode_lib.prepare_tp_decode_params(
            params["decoder"], cfg.decoder, mesh, model_axis)
    lmx_out = [None] * len(imgs)
    lp_out = [0.0] * len(imgs)
    seq_out = [None] * len(imgs)

    i = 0
    while i < len(order):
        # same-bucket run, capped at decode_batch
        key = _bucket_key(imgs[order[i]], cfg, bucket_multiple)
        group = [order[i]]
        while (len(group) < decode_batch and i + len(group) < len(order)
               and _bucket_key(imgs[order[i + len(group)]], cfg,
                               bucket_multiple) == key):
            group.append(order[i + len(group)])
        i += len(group)

        # streaming hook shared by the plain and mesh greedy branches: the
        # slice to len(group) drops batch-pad rows (a no-op when unpadded)
        group_cb = None
        seg_steps = None
        if progress_cb is not None and beam_size == 1:
            group_idx = list(group)
            group_cb = (lambda s, t, fin, gi=group_idx:
                        progress_cb(gi, s[: len(gi)], t, fin[: len(gi)]))
            seg_steps = progress_interval

        # pad ragged tail groups up to a power of two (capped at
        # decode_batch): XLA programs are batch-shape-specialized, so every
        # distinct tail size otherwise compiles its own encode+decode
        # program — several multi-minute cold compiles per mixed request
        # through a remote-compile tunnel (round-5 review; same rationale
        # as serving's scheduler.bucketed_runner). Pad rows repeat the
        # first image and are dropped by every consumer below (result
        # loops iterate `group`; the streaming cb slices to len(group)).
        n_real = len(group)
        b_pad = 1
        while b_pad < n_real:
            b_pad *= 2
        b_pad = min(b_pad, decode_batch)
        group_imgs = [imgs[g] for g in group] \
            + [imgs[group[0]]] * (b_pad - n_real)
        pb = vit_encoder.batchify(group_imgs, cfg.encoder,
                                  bucket_multiple)
        latent, latent_valid = vitomr_lib.encode_image_jit(
            params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
            jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
            compute_dtype=compute_dtype)
        if beam_size > 1 and mesh is None:
            seqs, lps, mask = decode_lib.beam_generate(
                params["decoder"], cfg.decoder, latent, latent_valid,
                beam_size=beam_size, length_penalty=length_penalty,
                max_len=max_inference_len, compute_dtype=compute_dtype,
                cache_dtype=cache_dtype)
        elif beam_size > 1:
            from ..parallel import mesh as mesh_lib
            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            pad = (-len(group)) % n_data
            if pad:
                latent = jnp.concatenate(
                    [latent, jnp.repeat(latent[:1], pad, axis=0)])
                latent_valid = jnp.concatenate(
                    [latent_valid, jnp.repeat(latent_valid[:1], pad, axis=0)])
            seqs, lps, mask = decode_lib.sharded_beam_generate(
                params["decoder"], cfg.decoder, latent, latent_valid, mesh,
                axis=mesh_lib.DATA_AXIS, model_axis=model_axis,
                beam_size=beam_size, length_penalty=length_penalty,
                max_len=max_inference_len, compute_dtype=compute_dtype,
                cache_dtype=cache_dtype, tp_params=tp_params)
        elif mesh is not None:
            from ..parallel import mesh as mesh_lib
            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            pad = (-len(group)) % n_data
            if pad:  # repeat rows so the batch shards evenly; dropped below
                latent = jnp.concatenate(
                    [latent, jnp.repeat(latent[:1], pad, axis=0)])
                latent_valid = jnp.concatenate(
                    [latent_valid, jnp.repeat(latent_valid[:1], pad, axis=0)])
            seqs, lps, mask = decode_lib.sharded_generate(
                params["decoder"], cfg.decoder, latent, latent_valid, mesh,
                axis=mesh_lib.DATA_AXIS, model_axis=model_axis,
                max_len=max_inference_len, compute_dtype=compute_dtype,
                cache_dtype=cache_dtype, tp_params=tp_params,
                progress_cb=group_cb, segment_steps=seg_steps)
        else:
            seqs, lps, mask = decode_lib.generate(
                params["decoder"], cfg.decoder, latent, latent_valid,
                max_len=max_inference_len, compute_dtype=compute_dtype,
                cache_dtype=cache_dtype, progress_cb=group_cb,
                segment_steps=seg_steps)
        seqs, lps, mask = np.asarray(seqs), np.asarray(lps), np.asarray(mask)
        for row, g in enumerate(group):
            ids = seqs[row][mask[row]]
            lmx_out[g] = tokenizer.decode(ids)
            n = max(int(mask[row].sum()), 1)
            lp_out[g] = float(lps[row][mask[row]].sum() / n)
            seq_out[g] = ids

    return BatchResult(lmx_out, lp_out, seq_out)
