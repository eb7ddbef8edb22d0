"""Threaded prefetching batch loader: host packing overlapped with TPU steps.

Replaces the reference's ``DataLoader(num_workers=24, ragged_collate_fn,
pin_memory)`` (reference: acai_omr/train/pre_train.py:101-102) with a
thread-pool pipeline tuned for the JAX model: workers load + transform +
*pack* examples into static-shape PatchBatch arrays (the expensive host work
is PIL decode/resize and numpy patchify, which release the GIL in C), and a
bounded prefetch queue keeps a couple of packed batches ready for device
transfer while the accelerator runs the previous step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..models import omr_decoder, vit_encoder
from ..models.vit_encoder import EncoderConfig


class MaePackedBatch(dict):
    """dict of device-ready arrays for one MAE step."""


def _pad_batch_dim(arrays: dict, pad_to: int | None, fills: dict | None = None) -> dict:
    """Pad every array's batch dim to ``pad_to`` (padding rows have
    valid=False / length 0 / pad-token targets, so they contribute nothing to
    losses — keeps batch shapes static and divisible for DP sharding)."""
    if pad_to is None:
        return arrays
    b = next(iter(arrays.values())).shape[0]
    if b >= pad_to:
        return arrays
    fills = fills or {}
    out = {}
    for k, v in arrays.items():
        pad = [(0, pad_to - b)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad, constant_values=fills.get(k, 0))
    return out


def pack_mae_batch(examples, enc_cfg: EncoderConfig, bucket_multiple=128,
                   pad_to_batch: int | None = None):
    """[(input_img, target_img)] -> packed arrays (patches/pe/valid + targets)."""
    inputs = [ex[0] for ex in examples]
    targets = [ex[1] for ex in examples]
    pb = vit_encoder.batchify(inputs, enc_cfg, bucket_multiple)
    # target images may differ from inputs but share shapes (reference
    # guarantees equal sizes: datasets.py:34-37); patchify to the same bucket
    from ..ops import patchify as patch_ops
    if all(t is i_ for t, i_ in zip(targets, inputs)):
        # un-augmented wrappers pass the input object straight through —
        # reuse its patches instead of re-patchifying (ingest is host-CPU
        # bound at ~200 img/s/core, tools/ingest_bench.py)
        tgt = pb.patches
    else:
        tgt = np.zeros_like(pb.patches)
        for i, t in enumerate(targets):
            t = np.asarray(t, dtype=np.float32)
            if t.ndim == 2:
                t = t[None]
            tp = patch_ops.patchify(t, enc_cfg.patch_size)
            tgt[i, :tp.shape[0]] = tp
    arrays = dict(patches=pb.patches, pe_idx=pb.pe_idx, pe_w=pb.pe_w,
                  valid=pb.valid, lengths=pb.lengths, target_patches=tgt)
    return MaePackedBatch(_pad_batch_dim(arrays, pad_to_batch))


def pack_omr_batch(examples, enc_cfg: EncoderConfig, tokenizer,
                   bucket_multiple=128, lmx_bucket_multiple=128,
                   max_lmx_seq_len: int | None = None,
                   include_musicxml=False, pad_to_batch: int | None = None):
    """[(img, lmx[, musicxml])] -> packed arrays for a seq2seq step."""
    imgs = [ex[0] for ex in examples]
    lmx = [ex[1] for ex in examples]
    pb = vit_encoder.batchify(imgs, enc_cfg, bucket_multiple)
    seqs = [tokenizer.encode(s) if isinstance(s, str) else np.asarray(s, np.int32)
            for s in lmx]
    inputs, targets, lmx_valid = omr_decoder.batchify_and_split_lmx_seqs(
        seqs, tokenizer.pad_idx, lmx_bucket_multiple, max_len=max_lmx_seq_len)
    arrays = dict(patches=pb.patches, pe_idx=pb.pe_idx, pe_w=pb.pe_w,
                  valid=pb.valid, lengths=pb.lengths, inputs=inputs,
                  targets=targets, lmx_valid=lmx_valid)
    out = _pad_batch_dim(arrays, pad_to_batch,
                         fills={"inputs": tokenizer.pad_idx,
                                "targets": tokenizer.pad_idx})
    if include_musicxml:
        # keep the host-side lists row-aligned with the padded arrays: pad
        # rows carry None so a consumer pairing array row i with
        # musicxml[i] sees an explicit sentinel instead of an IndexError
        # or a silently re-scored real row (round-4 review)
        n_pad = (out["patches"].shape[0] - len(examples))
        out["musicxml"] = [ex[2] for ex in examples] + [None] * n_pad
        out["lmx_seqs"] = seqs + [None] * n_pad
    return out


class PrefetchLoader:
    """Iterate (pack_fn(dataset[batch_indices])) with worker threads.

    sampler yields index arrays; ``pack_fn(examples) -> batch``. Prefetches up
    to ``prefetch`` packed batches; example loading fans out over
    ``num_workers`` threads.
    """

    def __init__(self, dataset, sampler, pack_fn, num_workers: int = 8,
                 prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.pack_fn = pack_fn
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices consumer abandonment (avoids leaking a
            # blocked producer thread in long-lived processes)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in self.sampler:
                        examples = list(pool.map(self.dataset.__getitem__, idxs))
                        if not put(self.pack_fn(examples)):
                            return
            except BaseException as e:  # surface worker errors to consumer
                put(e)
                return
            put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
