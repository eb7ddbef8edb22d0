"""On-device fused ingest (ops/preprocess.py) vs the host pipeline.

The device resize must replicate the host antialiased-bicubic
(native/imgproc.cpp / PIL) to float rounding, and the fused patchify must
match ops/patchify exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from acai_omr_tpu.data import transforms
from acai_omr_tpu.ops import patchify as patchify_lib
from acai_omr_tpu.ops import preprocess


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 96), (32, 48)),    # downscale
    ((40, 60), (64, 96)),    # upscale
    ((64, 96), (64, 96)),    # identity-size
    ((100, 37), (48, 80)),   # mixed, odd sizes
])
def test_device_resize_matches_host_bicubic(rng, in_hw, out_hw):
    img = rng.random((1, *in_hw), dtype=np.float32)
    host = transforms._resize_chw(img, out_hw)
    host = np.clip(host, 0.0, 1.0)
    rh = preprocess.bicubic_axis_weights(in_hw[0], out_hw[0])
    rw = preprocess.bicubic_axis_weights(in_hw[1], out_hw[1])
    dev = np.einsum("oh,chw->cow", rh, img)
    dev = np.einsum("ow,chw->cho", rw, dev)
    dev = np.clip(dev, 0.0, 1.0)
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_fused_ingest_matches_host_pipeline(rng):
    img = rng.random((1, 100, 150), dtype=np.float32)
    out_h, out_w, p = 48, 80, 16
    patches = preprocess.resize_normalize_patchify(img, out_h, out_w, p)
    host_img = np.clip(transforms._resize_chw(img, (out_h, out_w)), 0.0, 1.0)
    host_patches = patchify_lib.patchify(host_img, p)
    assert patches.shape == host_patches.shape == ((out_h // p) * (out_w // p),
                                                   p * p)
    np.testing.assert_allclose(np.asarray(patches), host_patches, atol=3e-5)


def test_dynamic_resize_patchify_target_math(rng):
    """Device DynamicResize must pick the same target size as the host
    transform and produce the same patch count."""
    img = rng.random((1, 333, 517), dtype=np.float32)
    p, budget, peh, pew = 16, 256, 40, 60
    host = transforms.DynamicResize(p, budget, peh, pew, crop_imgs=False)(img)
    patches, (hp, wp) = preprocess.dynamic_resize_patchify(img, p, budget,
                                                           peh, pew)
    assert (host.shape[1] // p, host.shape[2] // p) == (hp, wp)
    assert patches.shape[0] == hp * wp <= budget
    host_patches = patchify_lib.patchify(host, p)
    np.testing.assert_allclose(np.asarray(patches), host_patches, atol=3e-5)
