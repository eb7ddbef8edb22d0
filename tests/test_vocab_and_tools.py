"""Vocab generator parity, tokenizer round-trips, transform math."""

import numpy as np
import pytest

from acai_omr_tpu.config import LMX_VOCAB_PATH
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.data.transforms import DynamicResize, PatchDivisibleResize
from acai_omr_tpu.utils.create_lmx_vocab_file import vocabulary


def test_vocab_generator_matches_file():
    gen = vocabulary()
    with open(LMX_VOCAB_PATH) as f:
        ref = [l.strip() for l in f if l.strip()]
    assert gen == ref
    assert len(gen) == 227


def test_tokenizer_roundtrip():
    tok = LmxTokenizer()
    assert tok.vocab_size == 227
    assert (tok.bos_idx, tok.pad_idx, tok.eos_idx) == (0, 1, 2)
    lmx = "measure key:fifths:-1 time beats:3 beat-type:4 clef:G2 C4 voice:1 quarter"
    ids = tok.encode(lmx)
    assert ids[0] == tok.bos_idx and ids[-1] == tok.eos_idx
    assert tok.decode(ids) == lmx


def test_dynamic_resize_budget(rng):
    """Patch count after resize never exceeds the token budget, dims are
    patch-divisible (reference property: DynamicResize, utils.py:334-370)."""
    dr = DynamicResize(16, 512, 60, 200, crop_imgs=True)
    for h, w in [(150, 300), (1000, 1700), (300, 2400), (97, 1713)]:
        img = rng.random((1, h, w), dtype=np.float32)
        out = dr(img)
        oh, ow = out.shape[-2:]
        assert oh % 16 == 0 and ow % 16 == 0
        assert (oh // 16) * (ow // 16) <= 512
        assert oh // 16 <= 60 and ow // 16 <= 200
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_dynamic_resize_exact_reference_math():
    """The integer-division aspect ratio quirk is preserved exactly."""
    import math
    dr = DynamicResize(16, 1024, 60, 200, crop_imgs=False)
    h, w = 200, 700
    ar = w // h  # 3 (integer division, not 3.5)
    th = 16 * math.floor(math.sqrt(1024 / ar))
    assert dr.target_size(h, w) == (th, th * ar)


def test_patch_divisible_resize(rng):
    pr = PatchDivisibleResize(16)
    out = pr(rng.random((1, 100, 250), dtype=np.float32))
    assert out.shape == (1, 96, 240)
    # minimum one patch
    out = pr(rng.random((1, 7, 9), dtype=np.float32))
    assert out.shape == (1, 16, 16)


def test_native_resize_matches_pil(rng):
    from PIL import Image
    from acai_omr_tpu.data import native_imgproc
    if not native_imgproc.available():
        pytest.skip("native imgproc not built")
    img = rng.random((123, 257), dtype=np.float32)
    for th, tw in [(64, 128), (200, 300), (123, 257)]:
        ref = np.asarray(Image.fromarray(img, mode="F").resize(
            (tw, th), resample=Image.Resampling.BICUBIC), dtype=np.float32)
        ours = native_imgproc.resize_bicubic(img, th, tw)
        assert np.abs(ours - ref).max() < 2e-3, (th, tw, np.abs(ours - ref).max())


def test_native_resize_patchify_consistency(rng):
    from acai_omr_tpu.data import native_imgproc
    from acai_omr_tpu.ops import patchify as patch_ops
    if not native_imgproc.available():
        pytest.skip("native imgproc not built")
    img = rng.random((100, 180), dtype=np.float32)
    th, tw, p = 64, 96, 16
    fused = native_imgproc.resize_patchify(img, th, tw, p)
    resized = np.clip(native_imgproc.resize_bicubic(img, th, tw), 0, 1)
    ref = patch_ops.patchify(resized[None], p)
    np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_camera_augmentations_shapes_and_ranges(rng):
    """Each augmentation preserves shape and [0,1] range; RandomApply with
    p=0 is identity (reference stack: pre_train.py:178-190)."""
    from acai_omr_tpu.data import transforms as tf
    g = np.random.default_rng(0)
    img = rng.random((1, 48, 64), dtype=np.float32)
    for aug in [tf.GaussianBlur(15, (0.2, 0.7), g), tf.GaussianNoise(0.03, g),
                tf.RandomRotation((-2, 2), g), tf.RandomPerspective(0.2, 1.0, g),
                tf.ColorJitter(0.15, 0.2, 0.2, 0, g)]:
        out = aug(img.copy())
        assert out.shape == img.shape, type(aug).__name__
        assert np.isfinite(out).all()
        assert out.min() >= -0.25 and out.max() <= 1.25, type(aug).__name__

    ident = tf.RandomApply([tf.GaussianNoise(0.5, g)], p=0.0, rng=g)
    np.testing.assert_array_equal(ident(img.copy()), img)

    full = tf.default_camera_augment(1.0, np.random.default_rng(1))
    out = full(img.copy())
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_plots_from_metrics_csv(tmp_path):
    from acai_omr_tpu.utils.metrics import MetricsWriter
    from acai_omr_tpu.utils.plots import plot_losses, plot_lr_schedule, plot_stats_csv
    from acai_omr_tpu.train.schedules import cosine_anneal_with_warmup

    w = MetricsWriter(None, str(tmp_path / "stats.csv"))
    for step in range(5):
        w.scalar("epoch/train_loss", 1.0 / (step + 1), step)
        w.scalar("epoch/val_loss", 1.2 / (step + 1), step)
    w.flush()
    files = plot_stats_csv(tmp_path / "stats.csv", tmp_path / "plots")
    assert len(files) == 2 and all(f.exists() for f in files)
    out = plot_losses(tmp_path / "stats.csv", tmp_path / "losses.png")
    assert out.exists() if hasattr(out, "exists") else True
    sched = cosine_anneal_with_warmup(1e-4, 10, 100, 1e-6)
    p = plot_lr_schedule(sched, 50, tmp_path / "lr.png")
    assert (tmp_path / "lr.png").exists()
