"""Resolution-bucketed batch sampling.

On TPU this is load-bearing, not an optimization (SURVEY.md §7 risks): every
distinct padded shape is a compiled program, so batches must group images of
similar size. Same bucketing semantics as the reference's BucketBatchSampler
(reference: acai_omr/utils/utils.py:510-564) — smallest-fitting bucket by
(h, w) boundary list plus an inf bucket, shuffled bucket order and intra-bucket
order — with the padded sequence length additionally rounded to a shape bucket
by the packers.
"""

from __future__ import annotations

import logging

import numpy as np


class BucketBatchSampler:
    """Yields index batches grouped by image resolution.

    ``resolutions_fn(dataset, i) -> (h, w)`` lets callers avoid loading full
    images when sizes are known cheaply; default indexes the dataset and reads
    the first item's shape (reference behavior, utils.py:525).
    """

    def __init__(self, dataset, bucket_boundaries, batch_size, shuffle=True,
                 resolutions_fn=None, seed=0):
        self.logger = logging.getLogger(__name__)
        if resolutions_fn is None:
            # NOTE (startup cost, round-5 review): this default materializes
            # EVERY example once (full decode+resize+augment pipeline,
            # single-threaded) before step 1 — at reference dataset scale
            # and the measured ~200 img/s/core host rate that is a long
            # dead startup. All augments are size-preserving, so a
            # production deployment should pass a resolutions_fn that reads
            # PIL header sizes + the DynamicResize target math instead
            # (~1000x cheaper); the hook exists for exactly that.
            def resolutions_fn(ds, i):
                item = ds[i]
                img = item[0] if isinstance(item, tuple) else item
                return img.shape[-2], img.shape[-1]
        resolutions = np.array([resolutions_fn(dataset, i) for i in range(len(dataset))])

        boundaries = list(bucket_boundaries) + [(float("inf"), float("inf"))]
        buckets = [[] for _ in boundaries]
        for i, (h, w) in enumerate(resolutions):
            for j, (bh, bw) in enumerate(boundaries):
                if h <= bh and w <= bw:
                    buckets[j].append(i)
                    break
        self.buckets = [np.array(b) for b in buckets if len(b) > 0]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.dataset = dataset
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        # per-bucket ceil: __iter__ yields a ragged tail batch PER BUCKET,
        # so ceil(N/batch) under-counts whenever >1 bucket has a remainder —
        # the train loops derive steps_per_epoch (warmup/cosine schedules,
        # epoch accounting) from this (round-4 review)
        return sum(-(len(b) // -self.batch_size) for b in self.buckets)

    def __iter__(self):
        order = np.arange(len(self.buckets))
        if self.shuffle:
            self.rng.shuffle(order)
        for bi in order:
            bucket = self.buckets[bi].copy()
            if self.shuffle:
                self.rng.shuffle(bucket)
            for i in range(0, len(bucket), self.batch_size):
                yield bucket[i:i + self.batch_size]


def default_bucket_boundaries(patch_size: int = 16):
    """Resolution buckets derived from the reference's dataset statistics
    (calc_dataset_stats histograms): pre-DynamicResize sheet systems cluster
    around a few aspect/size families; boundaries are in pixels (h, w)."""
    return [
        (128, 512), (128, 1024), (192, 1024), (256, 1024),
        (256, 2048), (384, 2048), (512, 2048), (768, 3200),
    ]
