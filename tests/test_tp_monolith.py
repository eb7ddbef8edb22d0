"""Tensor-parallel monolith decode: in-kernel ICI all-reduce parity.

The tp=2 monolith shard splits heads + MLP hidden Megatron-style and sums the
three row-parallel partial outputs per layer INSIDE the fused layer-stack
kernel via remote DMA over the model axis (pallas_monolith tp_allreduce) —
the reference decode protocol's numerics (kv_caching.py:258-302) at half the
per-chip weight stream. Runs in the TPU interpret mode on the virtual CPU
mesh (cross-device DMAs simulated); tokens must match the single-device
per-op decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acai_omr_tpu.models import decode
from acai_omr_tpu.models.omr_decoder import DecoderConfig, init_decoder_params
from acai_omr_tpu.ops import pallas_monolith
from acai_omr_tpu.parallel import mesh as mesh_lib

CFG = DecoderConfig(max_lmx_seq_len=32, vocab_size=33, num_layers=2,
                    hidden_dim=256, num_heads=4, mlp_dim=1024, eos_idx=2)
B, M = 4, 32


@pytest.fixture(autouse=True)
def _test_mode():
    pallas_monolith.set_test_mode(force=True, interpret=True)
    yield
    pallas_monolith.set_test_mode(force=False, interpret=False)


@pytest.fixture(scope="module")
def setup():
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    latent = jax.random.normal(jax.random.PRNGKey(1), (B, M, CFG.hidden_dim),
                               jnp.float32)
    valid = jnp.arange(M)[None, :] < jnp.asarray([M, M - 5, 17, M])[:, None]
    return params, latent, valid


def _reference(params, latent, valid, max_len=16):
    pallas_monolith.set_test_mode(force=False, interpret=True)
    out = decode.generate(params, CFG, latent, valid, max_len=max_len,
                          initial_segment=max_len, compute_dtype=jnp.float32,
                          cache_dtype=jnp.float32, compact=False)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    return out


def test_tp2_monolith_matches_single_device(setup):
    """sharded_generate(model_axis=) over a (1 data x 2 model) mesh rides the
    monolith kernel (in-kernel all-reduce) and is token-identical to the
    single-device per-op decode."""
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    ref = _reference(params, latent, valid)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-4)


@pytest.mark.slow
def test_tp2_monolith_dp_mesh(setup):
    """DP x TP (2 data x 2 model): batch shards + head shards compose."""
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(2, 2)
    ref = _reference(params, latent, valid)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


@pytest.mark.slow
def test_tp2_monolith_segment_growth(setup):
    """Cache-segment growth under the TP monolith (host-driven pad of the
    lane-sharded 4-D caches)."""
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    ref = _reference(params, latent, valid, max_len=24)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=24, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def _reference_int8(params, latent, valid, max_len=16):
    """Single-device int8-MONOLITH decode (fp32 weights, int8 caches)."""
    out = decode.generate(params, CFG, latent, valid, max_len=max_len,
                          initial_segment=max_len, compute_dtype=jnp.float32,
                          cache_dtype=jnp.int8, compact=False)
    return out


def test_tp2_monolith_int8_bit_identical(setup, monkeypatch):
    """int8 KV caches ride the tp=2 monolith TOKEN-IDENTICALLY to the
    single-device int8 monolith, with scale-exact quantization: cache/scale
    quantization is per-(row, head) and heads are whole per shard, so
    shard-local quantization produces the same scales. Log-probs differ only
    by fp32 summation order through the split-K all-reduce (measured
    <=5e-4). W8A8 is disabled for BOTH arms (under tp the weights stay bf16
    by design — per-row activation maxes span the split contraction axis;
    see decode_segment)."""
    monkeypatch.setattr(pallas_monolith, "_W8A8", False)
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    ref = _reference_int8(params, latent, valid)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=2e-3)


@pytest.mark.slow
def test_tp2_monolith_int8_segment_growth(setup, monkeypatch):
    """int8 TP monolith through a cache-growth boundary: the host loop
    unpacks/repacks the lane-packed scale planes PER HEAD-HALF
    (pack_scales_tp) so each model shard keeps a valid pack."""
    monkeypatch.setattr(pallas_monolith, "_W8A8", False)
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    ref = _reference_int8(params, latent, valid, max_len=24)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=24, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_pack_scales_tp_roundtrip():
    """pack_scales_tp shards into per-half packs and inverts exactly."""
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.random((2, 4, 8, 4)), jnp.bfloat16)  # (L, B, T, H)
    g, tp = 2, 2
    packed = pallas_monolith.pack_scales_tp(s, g, tp)
    # each lane half IS the plain pack of that head half
    hl = s.shape[-1] // tp
    for i in range(tp):
        half = pallas_monolith.pack_scales(s[..., i * hl:(i + 1) * hl], g)
        np.testing.assert_array_equal(
            np.asarray(packed[..., i * half.shape[-1]:(i + 1) * half.shape[-1]]),
            np.asarray(half))
    np.testing.assert_array_equal(
        np.asarray(pallas_monolith.unpack_scales_tp(packed, g, tp)),
        np.asarray(s))


def test_tp2_monolith_w8a8_opt_in(setup, monkeypatch):
    """ACAI_TP_W8A8=1 runs per-shard W8A8 under the tp monolith (the B=1
    latency composition — per-chip weight bytes quartered). Per-shard
    weight/activation scales are a DIFFERENT (equally principled)
    quantization than single-chip int8, so the bar is decode QUALITY:
    high token agreement with the bf16-weight tp-int8 decode, not
    bit-identity."""
    monkeypatch.setattr(pallas_monolith, "_W8A8", True)
    monkeypatch.setattr(pallas_monolith, "_TP_W8A8", True)
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    out = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    monkeypatch.setattr(pallas_monolith, "_W8A8", False)
    ref = decode.sharded_generate(
        params, CFG, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    agree = (np.asarray(ref[0])[:, :n] == np.asarray(out[0])[:, :n]).mean()
    assert agree > 0.85, agree


# ---------------------------------------------------------------------------
# tp=4 (recursive-doubling all-reduce) and grouped memories under tp
# ---------------------------------------------------------------------------

CFG4 = DecoderConfig(max_lmx_seq_len=32, vocab_size=33, num_layers=2,
                     hidden_dim=512, num_heads=4, mlp_dim=2048, eos_idx=2)


@pytest.fixture(scope="module")
def setup4():
    params = init_decoder_params(jax.random.PRNGKey(7), CFG4)
    latent = jax.random.normal(jax.random.PRNGKey(8), (B, M, CFG4.hidden_dim),
                               jnp.float32)
    valid = jnp.arange(M)[None, :] < jnp.asarray([M, M - 5, 17, M])[:, None]
    return params, latent, valid


def _reference4(params, latent, valid, max_len=16, cache_dtype=jnp.float32,
                mem_group=1):
    pallas_monolith.set_test_mode(force=False, interpret=True)
    out = decode.generate(params, CFG4, latent, valid, max_len=max_len,
                          initial_segment=max_len, compute_dtype=jnp.float32,
                          cache_dtype=cache_dtype, compact=False,
                          mem_group=mem_group)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    return out


def test_tp4_monolith_matches_single_device(setup4):
    """tp=4 monolith decode (2-round recursive-doubling in-kernel
    all-reduce) is token-identical to the single-device per-op decode."""
    params, latent, valid = setup4
    mesh = mesh_lib.make_mesh(1, 4)
    ref = _reference4(params, latent, valid)
    out = decode.sharded_generate(
        params, CFG4, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-4)


@pytest.mark.slow
def test_tp4_monolith_int8(setup4):
    """int8 caches compose with tp=4 (shard-local per-(row, head) scales)."""
    params, latent, valid = setup4
    mesh = mesh_lib.make_mesh(1, 4)
    ref = _reference4(params, latent, valid, cache_dtype=jnp.int8)
    out = decode.sharded_generate(
        params, CFG4, latent, valid, mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_tp2_monolith_grouped_mem(setup):
    """Grouped memories (mem_group=4, the GRPO-rollout layout) ride the TP
    monolith kernel: the shared (M, E/tp) block and narrow scale planes are
    per-shard slices, orthogonal to the all-reduce. Single-tile shapes: the
    TPU interpreter rejects the kernel's multi-tile output-window revisits
    (legal on hardware with "arbitrary" grid semantics) — multi-tile grouped
    coverage lives in the single-chip tests (test_monolith.py)."""
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    g = 4
    ref = _reference_grouped(params, latent[:1], valid[:1], g)
    out = decode.sharded_generate(
        params, CFG, latent[:1], valid[:1], mesh,
        axis=mesh_lib.DATA_AXIS, model_axis=mesh_lib.MODEL_AXIS,
        mem_group=g, max_len=16, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def _reference_grouped(params, latent, valid, g, max_len=16):
    pallas_monolith.set_test_mode(force=False, interpret=True)
    out = decode.generate(params, CFG, latent, valid, max_len=max_len,
                          initial_segment=max_len, compute_dtype=jnp.float32,
                          cache_dtype=jnp.float32, compact=False, mem_group=g)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    return out


def test_tp2_beam_rides_monolith(setup):
    """sharded_beam_generate(model_axis=) rides the TP monolith kernel
    (beams as grouped memories per shard + in-kernel all-reduce) and matches
    the single-device beam search exactly."""
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    pallas_monolith.set_test_mode(force=False, interpret=True)
    ref = decode.beam_generate(params, CFG, latent[:1], valid[:1],
                               beam_size=4, max_len=16, initial_segment=16,
                               compute_dtype=jnp.float32,
                               cache_dtype=jnp.float32)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    out = decode.sharded_beam_generate(
        params, CFG, latent[:1], valid[:1], mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, beam_size=4, max_len=16,
        initial_segment=16, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-4)


@pytest.mark.slow
def test_tp2_beam_int8_rides_monolith(setup, monkeypatch):
    """int8 beams under TP: per-shard lane-packed self planes
    (pack_scales_tp) reorder via unpack -> parent-gather -> repack inside
    each shard; tokens match the single-device int8 monolith beam."""
    monkeypatch.setattr(pallas_monolith, "_W8A8", False)
    params, latent, valid = setup
    mesh = mesh_lib.make_mesh(1, 2)
    ref = decode.beam_generate(params, CFG, latent[:1], valid[:1],
                               beam_size=4, max_len=16, initial_segment=16,
                               compute_dtype=jnp.float32,
                               cache_dtype=jnp.int8)
    out = decode.sharded_beam_generate(
        params, CFG, latent[:1], valid[:1], mesh, axis=mesh_lib.DATA_AXIS,
        model_axis=mesh_lib.MODEL_AXIS, beam_size=4, max_len=16,
        initial_segment=16, compute_dtype=jnp.float32,
        cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
