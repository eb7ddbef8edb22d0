"""KV-cached decode equivalence — the crown-jewel test pattern.

Mirrors the reference's cached-vs-uncached test strategy (SURVEY.md §4.2,
reference: tests/test_kv_caching.py): the compiled while-loop decode with
functional caches must produce exactly the tokens the dense full-sequence
forward would choose step by step, including sub-max batch sizes, memory
padding masks, cache-segment growth and sampled log-prob bookkeeping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acai_omr_tpu.models import decode as decode_lib
from acai_omr_tpu.models import omr_decoder
from acai_omr_tpu.models.omr_decoder import DecoderConfig

CFG = DecoderConfig(max_lmx_seq_len=64, vocab_size=31, num_layers=2,
                    hidden_dim=32, num_heads=4, mlp_dim=48, dropout=0.0,
                    pad_idx=1, bos_idx=0, eos_idx=2)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = omr_decoder.init_decoder_params(key, CFG)
    b, m = 3, 12
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, m, CFG.hidden_dim))
    mem_valid = jnp.asarray(np.arange(m)[None, :] < np.array([12, 7, 9])[:, None])
    return params, mem, mem_valid


def greedy_reference(params, mem, mem_valid, max_len):
    """Step-by-step greedy decode through the *dense* forward (uncached)."""
    b = mem.shape[0]
    seqs = np.full((b, max_len), CFG.pad_idx, dtype=np.int32)
    lps = np.zeros((b, max_len), dtype=np.float32)
    seqs[:, 0] = CFG.bos_idx
    finished = np.zeros(b, dtype=bool)
    for t in range(1, max_len):
        logits = omr_decoder.forward(params, CFG, jnp.asarray(seqs[:, :t]), mem,
                                     None, mem_valid)
        step = np.asarray(logits[:, -1, :])
        nxt = step.argmax(-1)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(step), axis=-1))
        seqs[:, t] = nxt
        lps[:, t] = lp[np.arange(b), nxt]
        finished |= nxt == CFG.eos_idx
        if finished.all():
            break
    return seqs, lps


def test_greedy_cached_matches_uncached(setup):
    params, mem, mem_valid = setup
    max_len = 24
    ref_seqs, ref_lps = greedy_reference(params, mem, mem_valid, max_len)
    seqs, lps, mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=max_len,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        initial_segment=8)  # force several cache growths
    t = seqs.shape[1]
    np.testing.assert_array_equal(np.asarray(seqs), ref_seqs[:, :t] * np.asarray(mask)
                                  + CFG.pad_idx * (1 - np.asarray(mask)))
    valid = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(lps)[valid], ref_lps[:, :t][valid],
                               atol=1e-4, rtol=1e-4)


def test_inference_mask_first_eos():
    eos, pad = CFG.eos_idx, CFG.pad_idx
    seqs = jnp.asarray([
        [0, 5, eos, 7, eos, 9],   # junk after first eos
        [0, 5, 6, 7, 8, 9],       # never finished
        [0, eos, 4, 4, 4, 4],     # immediate eos
    ])
    mask = decode_lib.create_inference_mask(seqs, eos)
    np.testing.assert_array_equal(np.asarray(mask), [
        [True, True, True, False, False, False],
        [True, True, True, True, True, True],
        [True, True, False, False, False, False],
    ])


def test_mask_and_clip(setup):
    eos, pad = CFG.eos_idx, CFG.pad_idx
    seqs = jnp.asarray([[0, 5, eos, 7, 9], [0, eos, 4, 4, 4]])
    lps = jnp.ones_like(seqs, dtype=jnp.float32)
    s, l, m = decode_lib.mask_and_clip_seqs(seqs, lps, eos, pad)
    assert s.shape[1] == 3  # trimmed to longest live sequence
    np.testing.assert_array_equal(np.asarray(s), [[0, 5, eos], [0, eos, pad]])
    np.testing.assert_array_equal(np.asarray(l), [[1, 1, 1], [1, 1, 0]])


def test_sub_max_batch_and_no_mask(setup):
    """Decode with a single image and no memory mask (models.py:598-599)."""
    params, mem, _ = setup
    seqs, lps, mask = decode_lib.generate(
        params, CFG, mem[:1], None, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    ref_seqs, _ = greedy_reference(params, mem[:1], None, 16)
    t = seqs.shape[1]
    assert bool(np.asarray(mask).all() or (np.asarray(seqs) == CFG.pad_idx).any())
    np.testing.assert_array_equal(
        np.asarray(seqs)[np.asarray(mask)], ref_seqs[:, :t][np.asarray(mask)])


def test_sampled_rollouts_shapes_and_logprobs(setup):
    params, mem, mem_valid = setup
    sampling = decode_lib.SamplingConfig(top_k=5, temperature=1.3)
    seqs, lps, mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=20, sampling=sampling,
        rng=jax.random.PRNGKey(7), compute_dtype=jnp.float32,
        cache_dtype=jnp.float32)
    seqs, lps, mask = map(np.asarray, (seqs, lps, mask))
    assert seqs.shape == lps.shape == mask.shape
    # every generated row starts with <bos>, junk is pad-filled
    assert (seqs[:, 0] == CFG.bos_idx).all()
    assert (seqs[~mask] == CFG.pad_idx).all()
    assert (lps[~mask] == 0.0).all()
    # chosen log-probs are valid log probabilities
    assert (lps[mask][1:] <= 0.0).all()


def test_sampling_determinism(setup):
    params, mem, mem_valid = setup
    sampling = decode_lib.SamplingConfig(top_k=5, temperature=1.0)
    outs = [decode_lib.generate(params, CFG, mem, mem_valid, max_len=16,
                                sampling=sampling, rng=jax.random.PRNGKey(3),
                                compute_dtype=jnp.float32,
                                cache_dtype=jnp.float32)[0] for _ in range(2)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_int8_cache_decode_matches_fp32(setup):
    """Opt-in int8 KV-cache quantization: same greedy tokens as fp32 caches
    on the test model (per-row max-abs scales keep argmax stable)."""
    params, mem, mem_valid = setup
    ref, _, ref_mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=24,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32, initial_segment=8)
    q, _, q_mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=24,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8, initial_segment=8)
    n = min(ref.shape[1], q.shape[1])
    agree = (np.asarray(ref)[:, :n] == np.asarray(q)[:, :n]).mean()
    assert agree > 0.9, agree


def test_batch_compaction_matches_uncompacted(setup):
    """Finished-row compaction at segment boundaries must not change any
    row's output (greedy)."""
    params, mem, mem_valid = setup
    # larger batch with varied finish times; tiny segments force several
    # compaction opportunities
    big_mem = jnp.concatenate([mem, mem * 0.5, mem * -0.3, mem * 1.7], axis=0)
    big_valid = jnp.concatenate([mem_valid] * 4, axis=0)
    ref = decode_lib.generate(params, CFG, big_mem, big_valid, max_len=40,
                              compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                              initial_segment=8, compact=False)
    out = decode_lib.generate(params, CFG, big_mem, big_valid, max_len=40,
                              compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                              initial_segment=8, compact=True)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n], np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n], np.asarray(ref[1])[:, :n],
                               atol=1e-5)
