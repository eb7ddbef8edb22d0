"""Bucket sampler, prefetch loader, batch packing."""

import numpy as np
import pytest

from acai_omr_tpu.data.bucketing import BucketBatchSampler
from acai_omr_tpu.data.datasets import ConcatDataset, DebugDataset
from acai_omr_tpu.data.loader import PrefetchLoader, pack_mae_batch, pack_omr_batch
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.models.vit_encoder import EncoderConfig

ENC = EncoderConfig(patch_size=16, pe_max_height=60, pe_max_width=200,
                    num_layers=2, hidden_dim=16, num_heads=2, mlp_dim=24)


class SizedDataset:
    """Items of known sizes for bucketing checks."""

    def __init__(self, sizes):
        self.sizes = sizes

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        return (np.zeros((1, h, w), dtype=np.float32), f"item{i}")


def test_bucket_sampler_groups_by_resolution():
    sizes = [(64, 64)] * 5 + [(256, 512)] * 4 + [(900, 1800)] * 2
    ds = SizedDataset(sizes)
    sampler = BucketBatchSampler(ds, [(128, 128), (512, 512)], batch_size=3,
                                 shuffle=False)
    batches = list(sampler)
    # every batch homogeneous in bucket
    for batch in batches:
        buckets = {0 if sizes[i] == (64, 64) else 1 if sizes[i] == (256, 512)
                   else 2 for i in batch}
        assert len(buckets) == 1
    assert sum(len(b) for b in batches) == len(ds)
    assert len(sampler) == -(len(ds) // -3)


def test_bucket_sampler_shuffles_deterministically():
    ds = SizedDataset([(64, 64)] * 10)
    s1 = list(BucketBatchSampler(ds, [(128, 128)], 4, shuffle=True, seed=1))
    s2 = list(BucketBatchSampler(ds, [(128, 128)], 4, shuffle=True, seed=1))
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)


def test_prefetch_loader_yields_all_batches():
    ds = DebugDataset(n=7, sizes=((64, 96),), kind="mae")
    sampler = BucketBatchSampler(ds, [(128, 128)], 3, shuffle=False)
    loader = PrefetchLoader(ds, sampler, lambda ex: pack_mae_batch(ex, ENC),
                            num_workers=2, prefetch=2)
    batches = list(loader)
    assert len(batches) == 3
    assert sum(b["patches"].shape[0] for b in batches) == 7
    assert batches[0]["patches"].shape[1] % 128 == 0


def test_prefetch_loader_propagates_errors():
    class Broken:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise RuntimeError("boom")

    ds = Broken()
    loader = PrefetchLoader(ds, [[0, 1]], lambda ex: ex, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_pack_omr_batch_with_padding():
    tok = LmxTokenizer()
    ds = DebugDataset(n=3, sizes=((64, 96),), seq_len=6, vocab=tok.vocab_size,
                      kind="omr")
    examples = [ds[i] for i in range(3)]
    out = pack_omr_batch(examples, ENC, tok, max_lmx_seq_len=64, pad_to_batch=8)
    assert out["patches"].shape[0] == 8
    assert out["inputs"].shape[0] == 8
    # padded rows are fully invalid / pad tokens
    assert not out["valid"][3:].any()
    assert (out["targets"][3:] == tok.pad_idx).all()
    assert (out["lengths"][3:] == 0).all()
