"""Host ingest throughput: can the data pipeline feed the training step?

The TPU step rates are only real if the host keeps up: MAE pretrain runs at
~395 img/s and scheduled sampling at ~60 img/s on a v5e-1 (docs/PERF.md), so
the preprocessing path — PIL-style decode stand-in, DynamicResize (C++
bicubic via native/libimgproc.so when built), patchify, PE gather, bucket
padding — must sustain at least that.

Measures, on synthetic variable-resolution grayscale images drawn from the
reference's published size distribution (~150x300 to ~1000x1700 px,
docs/design_decisions.md:27):

1. single-thread pack_mae_batch / pack_omr_batch (img transform included)
2. PrefetchLoader end-to-end with N worker threads (the training-loop path)

Usage: python tools/ingest_bench.py [--batches 30] [--workers 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from acai_omr_tpu.data import loader, native_imgproc
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.data.transforms import DynamicResize
from acai_omr_tpu.models.vit_encoder import EncoderConfig


class SyntheticDataset:
    """Variable-resolution grayscale systems + ~230-token LMX strings."""

    def __init__(self, n, tok, resize, rng, mae=False):
        self.n = n
        self.tok = tok
        self.resize = resize
        self.mae = mae
        r = np.random.default_rng(rng)
        self.shapes = [(int(r.integers(150, 1000)), int(r.integers(300, 1700)))
                       for _ in range(n)]
        ids = r.integers(3, 200, (n, 230)).astype(np.int32)
        self.lmx = [tok.decode(row) for row in ids]
        self._imgs = [np.asarray(r.random((h, w), dtype=np.float32))
                      for h, w in self.shapes[:64]]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # stand-in for PIL decode: a fresh fp32 H x W array (copy cost kept)
        img = self._imgs[i % len(self._imgs)].copy()[None]
        img = self.resize(img)
        if self.mae:
            return img, img
        return img, self.lmx[i]


def bench(name, it, batch_size, batches):
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += 1
        if n >= batches:
            break
    el = time.perf_counter() - t0
    rate = n * batch_size / el
    print(f"{name}: {rate:8.1f} img/s  ({n} batches of {batch_size} "
          f"in {el:.2f}s)", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    print(f"native imgproc available: {native_imgproc.available()}")
    tok = LmxTokenizer(str(Path(__file__).parent.parent / "lmx_vocab.txt"))

    # MAE regime: token budget 512, batch 64 (reference pre_train.py:15-36)
    enc_mae = EncoderConfig()
    ds_mae = SyntheticDataset(4096, tok, DynamicResize(16, 512, 60, 200, False), 0,
                              mae=True)
    # OMR regime: budget 1024, batch 8 (reference omr_teacher_force_train)
    enc_omr = EncoderConfig()
    ds_omr = SyntheticDataset(4096, tok, DynamicResize(16, 1024, 60, 200, False), 1)

    r = np.random.default_rng(7)

    def sampler(n, bs):
        while True:
            yield r.integers(0, n, bs)

    # single-thread packing
    def st_iter(ds, bs, pack):
        for idxs in sampler(len(ds), bs):
            yield pack([ds[i] for i in idxs])

    bench("mae pack 1-thread (B=64) ",
          st_iter(ds_mae, 64, lambda ex: loader.pack_mae_batch(ex, enc_mae)),
          64, args.batches)
    bench("omr pack 1-thread (B=8)  ",
          st_iter(ds_omr, 8, lambda ex: loader.pack_omr_batch(ex, enc_omr, tok)),
          8, args.batches)

    # threaded loader (the training-loop path)
    import itertools
    mae_loader = loader.PrefetchLoader(
        ds_mae, itertools.islice(sampler(len(ds_mae), 64), args.batches + 2),
        lambda ex: loader.pack_mae_batch(ex, enc_mae),
        num_workers=args.workers)
    bench(f"mae PrefetchLoader x{args.workers}   ", iter(mae_loader), 64,
          args.batches)
    omr_loader = loader.PrefetchLoader(
        ds_omr, itertools.islice(sampler(len(ds_omr), 8), args.batches + 2),
        lambda ex: loader.pack_omr_batch(ex, enc_omr, tok),
        num_workers=args.workers)
    bench(f"omr PrefetchLoader x{args.workers}   ", iter(omr_loader), 8,
          args.batches)

    import os
    cores = os.cpu_count() or 1
    print(f"host cores: {cores}. targets: MAE step ~395 img/s, "
          "scheduled-sampling step ~60 img/s (docs/PERF.md). Ingest scales "
          "with worker threads (the C++ resize releases the GIL) — judge "
          "per-core: a production v5e host has ~24 vCPUs/chip.")


if __name__ == "__main__":
    main()
