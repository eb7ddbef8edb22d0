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
    # len == the real yielded batch count (per-bucket ragged tails:
    # ceil(5/3) + ceil(4/3) + ceil(1/3)... buckets are 5/4/2 -> 2+2+1)
    assert len(sampler) == len(batches) == 5


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


def test_bucket_sampler_len_counts_ragged_tails():
    """__iter__ yields one ragged tail batch PER BUCKET; __len__ must agree
    (the train loops derive LR-schedule steps_per_epoch from it)."""
    from acai_omr_tpu.data.bucketing import BucketBatchSampler

    class _DS:
        # 5 small + 5 large images -> two buckets of 5
        def __len__(self):
            return 10

        def __getitem__(self, i):
            h = 32 if i < 5 else 128
            return (np.zeros((1, h, h), np.float32),)

    s = BucketBatchSampler(_DS(), batch_size=4, bucket_boundaries=[(64, 64)],
                           shuffle=False)
    batches = list(s)
    assert len(batches) == len(s) == 4, (len(batches), len(s))


def test_pretrain_wrapper_single_load_identity():
    """Un-augmented wrappers must pass the SAME object as input and target
    (one decode per item; pack_mae_batch's identity fast path keys on it)."""
    from acai_omr_tpu.data.datasets import PreTrainWrapper

    calls = []

    class _DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            calls.append(i)
            return np.zeros((1, 8, 8), np.float32)

    w = PreTrainWrapper(_DS())
    inp, tgt = w[0]
    assert inp is tgt
    assert calls == [0]


def test_to_float_chw_near_black_uint8():
    """uint8 sources always divide by 255 — a near-black image (max pixel 1)
    must map to 1/255, not full white."""
    from PIL import Image
    from acai_omr_tpu.data.transforms import to_float_chw

    raw = np.zeros((4, 4), np.uint8)
    raw[0, 0] = 1
    arr = to_float_chw(Image.fromarray(raw, mode="L"))
    assert abs(arr[0, 0, 0] - 1.0 / 255.0) < 1e-7, arr[0, 0, 0]
