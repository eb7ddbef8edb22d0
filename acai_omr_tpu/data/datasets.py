"""Dataset classes for GrandStaff-LMX, OLiMPiC, Primus/DoReMi prepared sets.

Capability parity with the reference's dataset layer (reference:
acai_omr/train/datasets.py:1-182): same on-disk layouts, split files, transform
hooks and wrapper semantics (augment-input-only for MAE, augment_p distorted
sampling for GrandStaff), framework-free — items are numpy arrays / python
strings consumed by the bucket loader.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image


class LMXDataset:
    """Base: CSV split file -> example ids (reference: datasets.py:8-19)."""

    def __init__(self, root_dir, split_file_name, img_transform=None,
                 lmx_transform=None, include_musicxml=False):
        self.root_dir = Path(root_dir)
        self.id_df = pd.read_csv(self.root_dir / split_file_name, header=None)
        self.img_transform = img_transform
        self.lmx_transform = lmx_transform
        self.include_musicxml = include_musicxml

    def __len__(self):
        return len(self.id_df)

    def _load_img(self, path) -> Image.Image:
        return Image.open(path).convert("L")

    def _load_text(self, path) -> str:
        with open(path, "r") as f:
            return f.read()


class GrandStaffLMXDataset(LMXDataset):
    """(original, distorted-resized, lmx[, musicxml]) — datasets.py:28-56."""

    def __getitem__(self, idx):
        ex_id = self.id_df.iat[idx, 0]
        original = self._load_img(self.root_dir / "grandstaff" / (ex_id + ".jpg"))
        distorted = self._load_img(self.root_dir / "grandstaff" / (ex_id + "_distorted.jpg"))
        distorted = distorted.resize(original.size, resample=Image.Resampling.BILINEAR)

        if self.img_transform:
            original = self.img_transform(original)
            distorted = self.img_transform(distorted)

        lmx = self._load_text(self.root_dir / (ex_id + ".lmx"))
        if self.lmx_transform:
            lmx = self.lmx_transform(lmx)

        if self.include_musicxml:
            musicxml = self._load_text(self.root_dir / (ex_id + ".musicxml"))
            return original, distorted, lmx, musicxml
        return original, distorted, lmx


class OlimpicDataset(LMXDataset):
    """(img, lmx[, musicxml]) for synthetic/scanned OLiMPiC — datasets.py:130-152."""

    def __getitem__(self, idx):
        ex_id = self.id_df.iat[idx, 0]
        img = self._load_img(self.root_dir / (ex_id + ".png"))
        if self.img_transform:
            img = self.img_transform(img)
        lmx = self._load_text(self.root_dir / (ex_id + ".lmx"))
        if self.lmx_transform:
            lmx = self.lmx_transform(lmx)
        if self.include_musicxml:
            musicxml = self._load_text(self.root_dir / (ex_id + ".musicxml"))
            return img, lmx, musicxml
        return img, lmx


class PreparedDataset:
    """Primus/DoReMi images via ids.csv from the prepare scripts
    (datasets.py:109-127)."""

    def __init__(self, root_dir, transform=None):
        self.root_dir = Path(root_dir)
        self.id_df = pd.read_csv(self.root_dir / "ids.csv")
        self.transform = transform

    def __len__(self):
        return len(self.id_df)

    def __getitem__(self, idx):
        img_id = self.id_df.at[idx, "id"]
        img = Image.open(self.root_dir / "images" / (img_id + ".png")).convert("L")
        if self.transform:
            img = self.transform(img)
        return img


class PreTrainWrapper:
    """(input, target) pairs; transform applies to the input only so the MAE
    reconstructs the clean image (datasets.py:58-76)."""

    def __init__(self, base_dataset, transform=None,
                 rng: np.random.Generator | None = None):
        self.base_dataset = base_dataset
        self.transform = transform
        self.rng = rng or np.random.default_rng()

    def __len__(self):
        return len(self.base_dataset)

    def __getitem__(self, idx):
        # load ONCE: the double base_dataset[idx] paid two PIL decodes per
        # item and broke pack_mae_batch's object-identity fast path for
        # un-augmented wrappers (round-4 review); transform(None) keeps the
        # target the same object as the input
        img = self.base_dataset[idx]
        return (self.transform(img) if self.transform else img), img


class OlimpicPreTrainWrapper(PreTrainWrapper):
    def __getitem__(self, idx):
        img, _ = self.base_dataset[idx]
        return (self.transform(img) if self.transform else img), img


class GrandStaffPreTrainWrapper(PreTrainWrapper):
    """With prob augment_p: (transform(distorted), original); else
    (original, original) (datasets.py:92-106)."""

    def __init__(self, base_dataset, augment_p=0.0, transform=None, rng=None):
        if augment_p > 0:
            assert transform is not None, \
                "Augmentation transform must be specified for non-zero augment_p"
        super().__init__(base_dataset, transform, rng)
        self.augment_p = augment_p

    def __getitem__(self, idx):
        original, distorted, _ = self.base_dataset[idx]
        if self.rng.random() < self.augment_p:
            return self.transform(distorted), original
        return original, original


class GrandStaffOMRTrainWrapper:
    """(input_img, lmx[, musicxml]) with augment_p distorted sampling
    (datasets.py:156-182)."""

    def __init__(self, base_dataset, augment_p=0.0, transform=None, rng=None):
        if augment_p > 0:
            assert transform is not None, \
                "Augmentation transform must be specified for non-zero augment_p"
        self.base_dataset = base_dataset
        self.augment_p = augment_p
        self.transform = transform
        self.rng = rng or np.random.default_rng()

    def __len__(self):
        return len(self.base_dataset)

    def __getitem__(self, idx):
        item = self.base_dataset[idx]
        if self.base_dataset.include_musicxml:
            original, distorted, lmx, musicxml = item
        else:
            original, distorted, lmx = item
            musicxml = None
        if self.rng.random() < self.augment_p:
            input_img = self.transform(distorted)
        else:
            input_img = original
        if musicxml is not None:
            return input_img, lmx, musicxml
        return input_img, lmx


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[ds][idx - int(self.offsets[ds])]


class DebugDataset:
    """Random-tensor dataset for loop smoke tests (reference test pattern:
    tests/test_pre_train.py DebugDataset)."""

    def __init__(self, n=8, sizes=((64, 96), (48, 64)), seq_len=12, vocab=11,
                 kind="mae", seed=0):
        self.n = n
        self.sizes = sizes
        self.seq_len = seq_len
        self.vocab = vocab
        self.kind = kind
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        h, w = self.sizes[idx % len(self.sizes)]
        img = self.rng.random((1, h, w), dtype=np.float32)
        if self.kind == "mae":
            return img, img
        seq = np.concatenate([[0], self.rng.integers(3, self.vocab, self.seq_len), [2]])
        return img, seq.astype(np.int32)
