"""Batch-sharded KV-cached decode over the device mesh (SURVEY §2.5(b):
embarrassingly parallel across images, no cross-chip traffic in the hot loop).
Runs on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from acai_omr_tpu.models import decode as decode_lib
from acai_omr_tpu.models import omr_decoder
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.parallel import mesh as mesh_lib

CFG = DecoderConfig(max_lmx_seq_len=32, vocab_size=31, num_layers=2,
                    hidden_dim=32, num_heads=4, mlp_dim=48, dropout=0.0,
                    pad_idx=1, bos_idx=0, eos_idx=2)


def test_data_sharded_decode_matches_single_device():
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, m, CFG.hidden_dim))
    mem_valid = jnp.ones((b, m), dtype=bool)

    ref_seqs, ref_lps, ref_mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    # shard the batch over the data axis; params replicated
    data_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    params_s = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    mem_s = jax.device_put(mem, NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None)))
    valid_s = jax.device_put(mem_valid, data_sh)

    seqs, lps, mask = decode_lib.generate(
        params_s, CFG, mem_s, valid_s, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    n = min(ref_seqs.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(np.asarray(seqs)[:, :n], np.asarray(ref_seqs)[:, :n])
    np.testing.assert_allclose(np.asarray(lps)[:, :n], np.asarray(ref_lps)[:, :n],
                               atol=1e-5)


def test_shard_map_decode_matches_single_device():
    """sharded_generate (per-device decode loops under shard_map — the path
    that keeps the Pallas monolith per chip) must be token-identical to the
    single-device generate, including cache-segment growth."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, m, CFG.hidden_dim))
    mem_valid = jnp.asarray(
        np.arange(m)[None, :] < (np.arange(b) % 4 * 2 + 5)[:, None])

    ref = decode_lib.generate(params, CFG, mem, mem_valid, max_len=24,
                              initial_segment=8, compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32, compact=False)
    out = decode_lib.sharded_generate(params, CFG, mem, mem_valid, mesh,
                                      max_len=24, initial_segment=8,
                                      compute_dtype=jnp.float32,
                                      cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-5)


def test_shard_map_decode_streams_progress():
    """sharded_generate(progress_cb=): segment-boundary streaming under the
    multi-chip decode (SSE STEP parity for DP serving — reference streams
    per flush interval, ui/routes.py:66-104). Every flushed buffer must be
    a consistent snapshot (prefix of the final sequences up to its t), the
    finished mask must only ever grow, and the decode output must be
    unchanged by streaming."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, m, CFG.hidden_dim))
    mem_valid = jnp.asarray(
        np.arange(m)[None, :] < (np.arange(b) % 4 * 2 + 5)[:, None])

    ref = decode_lib.sharded_generate(params, CFG, mem, mem_valid, mesh,
                                      max_len=24, initial_segment=8,
                                      compute_dtype=jnp.float32,
                                      cache_dtype=jnp.float32)
    events = []
    out = decode_lib.sharded_generate(
        params, CFG, mem, mem_valid, mesh, max_len=24, initial_segment=8,
        segment_steps=5, compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        progress_cb=lambda s, t, fin: events.append((s.copy(), t, fin.copy())))

    assert events, "no progress events at segment boundaries"
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    final = np.asarray(out[0])
    prev_fin = np.zeros(b, bool)
    prev_t = 0
    for seqs, t, fin in events:
        assert seqs.shape == (b, 24) and fin.shape == (b,)
        assert fin.dtype == bool
        assert t >= prev_t, "reported t must be monotone across events"
        prev_t = t
        assert (~prev_fin | fin).all(), "finished mask must be monotone"
        prev_fin = fin
        k = min(t, final.shape[1])
        for row in range(b):
            # live rows: streamed prefix == final tokens; finished rows may
            # carry pad tails past their eos (documented; consumers filter)
            row_final = final[row, :k]
            row_seen = seqs[row, :k]
            keep = row_final != CFG.pad_idx
            np.testing.assert_array_equal(row_seen[keep], row_final[keep])


@pytest.mark.slow
def test_shard_map_decode_grouped_mem():
    """sharded_generate composes with grouped memory (mem_group=G): greedy
    grouped sharded decode == single-device grouped decode."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    bu, g, m = 8, 4, 12
    mem = jax.random.normal(jax.random.PRNGKey(2), (bu, m, CFG.hidden_dim))
    mem_valid = jnp.ones((bu, m), dtype=bool)

    ref = decode_lib.generate(params, CFG, mem, mem_valid, mem_group=g,
                              max_len=20, initial_segment=8,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32, compact=False)
    out = decode_lib.sharded_generate(params, CFG, mem, mem_valid, mesh,
                                      mem_group=g, max_len=20,
                                      initial_segment=8,
                                      compute_dtype=jnp.float32,
                                      cache_dtype=jnp.float32)
    assert out[0].shape[0] == bu * g
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_shard_map_decode_int8_runs():
    """int8 KV caches under shard_map: per-shard scale planes, valid masked
    sequences, tokens close to the fp32 shard_map decode."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(4), (b, m, CFG.hidden_dim))
    mem_valid = jnp.ones((b, m), dtype=bool)
    ref = decode_lib.sharded_generate(params, CFG, mem, mem_valid, mesh,
                                      max_len=16, initial_segment=8,
                                      compute_dtype=jnp.float32,
                                      cache_dtype=jnp.float32)
    q = decode_lib.sharded_generate(params, CFG, mem, mem_valid, mesh,
                                    max_len=16, initial_segment=8,
                                    compute_dtype=jnp.float32,
                                    cache_dtype=jnp.int8)
    assert q[0].shape[0] == b and bool(q[2][:, 0].all())
    n = min(ref[0].shape[1], q[0].shape[1])
    agree = (np.asarray(ref[0])[:, :n] == np.asarray(q[0])[:, :n]).mean()
    assert agree > 0.9, agree


def test_shard_map_decode_sampled_runs():
    """Sampled sharded decode: valid sequences, independent per-shard rows."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 8, 12
    mem = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(3), (1, m, CFG.hidden_dim)),
        (b, m, CFG.hidden_dim))
    mem_valid = jnp.ones((b, m), dtype=bool)
    seqs, lps, mask = decode_lib.sharded_generate(
        params, CFG, mem, mem_valid, mesh, max_len=16, initial_segment=8,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        sampling=decode_lib.SamplingConfig(top_k=5, temperature=1.5),
        rng=jax.random.PRNGKey(9))
    assert seqs.shape[0] == b and bool(mask[:, 0].all())
    assert float(jnp.max(jnp.where(mask, lps, -1.0))) <= 1e-6
    # identical memories but per-shard PRNG streams: rows must not all match
    rows = np.asarray(seqs)
    assert not all((rows[i] == rows[0]).all() for i in range(1, b))


# ---------------------------------------------------------------------------
# tensor-parallel decode (DP x TP mesh)
# ---------------------------------------------------------------------------

def _setup(b=16, m=12, key=1):
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    mem = jax.random.normal(jax.random.PRNGKey(key), (b, m, CFG.hidden_dim))
    return params, mem, jnp.ones((b, m), dtype=bool)


def test_tp_decode_matches_single_device():
    """DP=2 x TP=4 decode through a cache-growth boundary: tokens identical
    to the single-device per-op path, log-probs equal to fp32 psum noise."""
    params, mem, mem_valid = _setup()
    ref_seqs, ref_lps, _ = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    mesh = mesh_lib.make_mesh(2, 4)
    seqs, lps, _ = decode_lib.sharded_generate(
        params, CFG, mem, mem_valid, mesh, model_axis=mesh_lib.MODEL_AXIS,
        max_len=16, initial_segment=8,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    n = min(ref_seqs.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(np.asarray(seqs)[:, :n],
                                  np.asarray(ref_seqs)[:, :n])
    np.testing.assert_allclose(np.asarray(lps)[:, :n],
                               np.asarray(ref_lps)[:, :n],
                               atol=1e-5, rtol=1e-5)


def test_tp_decode_int8_and_grouped():
    """int8 KV caches and grouped memories (GRPO rollouts) both compose with
    tensor parallelism."""
    params, mem, mem_valid = _setup()
    mesh = mesh_lib.make_mesh(2, 4)
    ref = decode_lib.generate(params, CFG, mem, mem_valid, max_len=16,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    q = decode_lib.sharded_generate(
        params, CFG, mem, mem_valid, mesh, model_axis=mesh_lib.MODEL_AXIS,
        max_len=16, initial_segment=8,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], q[0].shape[1])
    agree = (np.asarray(ref[0])[:, :n] == np.asarray(q[0])[:, :n]).mean()
    assert agree > 0.9, agree

    g = 4
    ref_g = decode_lib.generate(params, CFG, mem[:4], mem_valid[:4],
                                max_len=16, mem_group=g, compact=False,
                                compute_dtype=jnp.float32,
                                cache_dtype=jnp.float32)
    got_g = decode_lib.sharded_generate(
        params, CFG, mem[:4], mem_valid[:4], mesh,
        model_axis=mesh_lib.MODEL_AXIS, max_len=16, initial_segment=8,
        mem_group=g, compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    n = min(ref_g[0].shape[1], got_g[0].shape[1])
    np.testing.assert_array_equal(np.asarray(got_g[0])[:, :n],
                                  np.asarray(ref_g[0])[:, :n])


def test_tp_decode_rejects_indivisible_heads():
    params, mem, mem_valid = _setup()
    mesh = mesh_lib.make_mesh(1, 8)  # 8 > 4 heads
    with pytest.raises(ValueError, match="divisible"):
        decode_lib.sharded_generate(
            params, CFG, mem, mem_valid, mesh,
            model_axis=mesh_lib.MODEL_AXIS, max_len=16)


def test_sharded_beam_matches_single_device_beam():
    """sharded_beam_generate (per-device beam loops under shard_map) must
    match single-device beam_generate exactly — beams never cross shards, so
    the per-row top-K reductions are identical; includes segment growth."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(3), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(4), (b, m, CFG.hidden_dim))
    mem_valid = jnp.asarray(
        np.arange(m)[None, :] < (np.arange(b) % 4 * 2 + 5)[:, None])

    ref = decode_lib.beam_generate(params, CFG, mem, mem_valid, beam_size=3,
                                   max_len=24, initial_segment=8,
                                   compute_dtype=jnp.float32,
                                   cache_dtype=jnp.float32)
    out = decode_lib.sharded_beam_generate(params, CFG, mem, mem_valid, mesh,
                                           beam_size=3, max_len=24,
                                           initial_segment=8,
                                           compute_dtype=jnp.float32,
                                           cache_dtype=jnp.float32)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-5)


@pytest.mark.slow
def test_sharded_beam_int8_matches_single_device_beam_int8():
    """int8 cache quantization composes with sharded beams (per-op layout on
    CPU; the per-shard scale-plane pack groups are exercised on TPU)."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(5), CFG)
    b, m = 8, 12
    mem = jax.random.normal(jax.random.PRNGKey(6), (b, m, CFG.hidden_dim))
    mem_valid = jnp.ones((b, m), dtype=bool)

    ref = decode_lib.beam_generate(params, CFG, mem, mem_valid, beam_size=2,
                                   max_len=16, initial_segment=8,
                                   compute_dtype=jnp.float32,
                                   cache_dtype=jnp.int8)
    out = decode_lib.sharded_beam_generate(params, CFG, mem, mem_valid, mesh,
                                           beam_size=2, max_len=16,
                                           initial_segment=8,
                                           compute_dtype=jnp.float32,
                                           cache_dtype=jnp.int8)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
