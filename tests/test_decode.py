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


def test_generate_progress_streaming_with_compaction(setup):
    """generate(progress_cb=) under batch compaction: the master-buffer
    snapshots stream in INPUT row order even as finished rows are compacted
    out of the live batch (the fin_master/row_map mapping), the finished
    mask is monotone, and streaming changes no output."""
    params, mem, mem_valid = setup
    big_mem = jnp.concatenate([mem, mem * 0.5, mem * -0.3, mem * 1.7], axis=0)
    big_valid = jnp.concatenate([mem_valid] * 4, axis=0)
    b = big_mem.shape[0]
    kwargs = dict(max_len=40, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32, initial_segment=8, compact=True)
    ref = decode_lib.generate(params, CFG, big_mem, big_valid, **kwargs)
    events = []
    out = decode_lib.generate(
        params, CFG, big_mem, big_valid, segment_steps=6,
        progress_cb=lambda s, t, fin: events.append((s.copy(), t, fin.copy())),
        **kwargs)

    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    assert events, "no progress events"
    final = np.asarray(out[0])
    prev_fin = np.zeros(b, bool)
    saw_partial = False
    for seqs, t, fin in events:
        assert seqs.shape[0] == b and fin.shape == (b,)
        assert (~prev_fin | fin).all(), "finished mask must be monotone"
        prev_fin = fin
        saw_partial |= bool(fin.any() and not fin.all())
        k = min(t, final.shape[1])
        for row in range(b):
            row_final, row_seen = final[row, :k], seqs[row, :k]
            keep = row_final != CFG.pad_idx
            np.testing.assert_array_equal(row_seen[keep], row_final[keep])
    # the scenario must actually exercise mixed finish states (else the
    # fin_master mapping is untested)
    assert saw_partial, "no event with mixed finished/live rows"


# ---------------------------------------------------------------------------
# grouped memory (GRPO rollout groups share each image's cross K/V,
# reference expands the latent instead: models.py:883-891)
# ---------------------------------------------------------------------------

def test_grouped_mem_rollouts_match_expanded(setup):
    """mem_group=G sampled rollouts == decoding a jnp.repeat-expanded latent
    with replicated memory (same rng -> identical tokens)."""
    params, mem, mem_valid = setup
    g = 4
    kwargs = dict(max_len=24, initial_segment=8, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32, compact=False,
                  sampling=decode_lib.SamplingConfig(top_k=5, temperature=1.2),
                  rng=jax.random.PRNGKey(11))
    ref = decode_lib.generate(params, CFG, jnp.repeat(mem, g, axis=0),
                              jnp.repeat(mem_valid, g, axis=0), **kwargs)
    out = decode_lib.generate(params, CFG, mem, mem_valid, mem_group=g,
                              **kwargs)
    assert out[0].shape[0] == mem.shape[0] * g
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-5, rtol=1e-5)


def test_grouped_mem_greedy_with_compaction(setup):
    """Greedy grouped decode with group-granular batch compaction matches the
    expanded replicated-memory decode row for row."""
    params, mem, mem_valid = setup
    g = 4
    kwargs = dict(max_len=40, initial_segment=8, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32)
    ref = decode_lib.generate(params, CFG, jnp.repeat(mem, g, axis=0),
                              jnp.repeat(mem_valid, g, axis=0),
                              compact=False, **kwargs)
    out = decode_lib.generate(params, CFG, mem, mem_valid, mem_group=g,
                              compact=True, **kwargs)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-5)


def test_boundary_compaction_with_segment_steps(setup):
    """compact=True with explicit segment_steps: compaction may fire at any
    segment boundary (not just cache growth) and must not change outputs."""
    params, mem, mem_valid = setup
    big_mem = jnp.concatenate([mem, mem * 0.5, mem * -0.3, mem * 1.7], axis=0)
    big_valid = jnp.concatenate([mem_valid] * 4, axis=0)
    kwargs = dict(max_len=40, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32, initial_segment=8)
    ref = decode_lib.generate(params, CFG, big_mem, big_valid,
                              compact=False, **kwargs)
    out = decode_lib.generate(params, CFG, big_mem, big_valid,
                              compact=True, segment_steps=6, **kwargs)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=1e-5)


def test_grouped_mem_int8_falls_back(setup):
    """int8 caches don't support grouped memory; generate must transparently
    expand and still return B*G valid rows."""
    params, mem, mem_valid = setup
    g = 2
    seqs, lps, mask = decode_lib.generate(
        params, CFG, mem, mem_valid, mem_group=g, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8, initial_segment=8)
    assert seqs.shape[0] == mem.shape[0] * g
    assert bool(mask[:, 0].all())


# ---------------------------------------------------------------------------
# beam search (capability extension; reference is greedy-only, models.py:600)
# ---------------------------------------------------------------------------

def test_beam_size_1_matches_greedy(setup):
    params, mem, mem_valid = setup
    ref_seqs, ref_lps, ref_mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=24,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32, initial_segment=8)
    seqs, lps, mask = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=1, max_len=24,
        length_penalty=0.0, initial_segment=8, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32)
    n = min(ref_seqs.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(np.asarray(seqs)[:, :n],
                                  np.asarray(ref_seqs)[:, :n])
    valid = np.asarray(mask)[:, :n]
    np.testing.assert_allclose(np.asarray(lps)[:, :n][valid],
                               np.asarray(ref_lps)[:, :n][valid],
                               atol=1e-4, rtol=1e-4)


def test_beam_exhaustive_matches_bruteforce():
    """On a tiny model, a beam wide enough to be exhaustive (K >= V^(T-2))
    must find exactly the global max-log-prob sequence, with eos-frozen
    scoring identical to canonical sequence probability."""
    cfg = DecoderConfig(max_lmx_seq_len=8, vocab_size=8, num_layers=1,
                        hidden_dim=8, num_heads=1, mlp_dim=8, dropout=0.0,
                        pad_idx=1, bos_idx=0, eos_idx=2)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(3), cfg)
    mem = jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.hidden_dim))
    v, max_len = cfg.vocab_size, 4

    # brute force: score all V^3 generated triples through the dense forward
    trips = np.stack(np.meshgrid(*[np.arange(v)] * (max_len - 1),
                                 indexing="ij"), -1).reshape(-1, max_len - 1)
    full = np.concatenate([np.zeros((len(trips), 1), np.int64), trips], axis=1)
    logits = omr_decoder.forward(params, cfg, jnp.asarray(full[:, :-1]),
                                 jnp.broadcast_to(mem, (len(full), 4, cfg.hidden_dim)),
                                 None, None)
    lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    step_lps = np.take_along_axis(lp, full[:, 1:, None], axis=2)[:, :, 0]
    # canonical score: stop accumulating after the first <eos>
    alive = np.cumsum(full[:, 1:] == cfg.eos_idx, axis=1) \
        - (full[:, 1:] == cfg.eos_idx)
    scores = np.where(alive == 0, step_lps, 0.0).sum(-1)
    best_brute = scores.max()

    _, lps, mask = decode_lib.beam_generate(
        params, cfg, mem, None, beam_size=v * v, max_len=max_len,
        length_penalty=0.0, compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    beam_score = np.where(np.asarray(mask), np.asarray(lps), 0.0).sum()
    np.testing.assert_allclose(beam_score, best_brute, atol=1e-4)


def test_beam_all_beams_consistency(setup):
    """return_all_beams: shapes, best-beam selection, and per-token lps
    summing to the reported score."""
    params, mem, mem_valid = setup
    seqs, lps, mask, all_seqs, all_scores = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=4, max_len=20,
        length_penalty=0.0, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32, return_all_beams=True)
    assert all_seqs.shape[:2] == (mem.shape[0], 4)
    beam_score = np.where(np.asarray(mask), np.asarray(lps), 0.0).sum(-1)
    best = np.asarray(all_scores).argmax(-1)
    np.testing.assert_allclose(
        beam_score, np.asarray(all_scores)[np.arange(mem.shape[0]), best],
        atol=1e-3)


def test_beam_int8_size_1_matches_greedy_int8(setup):
    """int8 beam search (per-op path: BeamState carries gatherable scale
    planes) at K=1 must be token-identical to int8 greedy decode."""
    params, mem, mem_valid = setup
    ref, _, _ = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=24,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8, initial_segment=8)
    seqs, _, _ = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=1, max_len=24,
        length_penalty=0.0, initial_segment=8, compute_dtype=jnp.float32,
        cache_dtype=jnp.int8)
    n = min(ref.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(np.asarray(seqs)[:, :n],
                                  np.asarray(ref)[:, :n])


def test_beam_int8_matches_fp32_beam(setup):
    """Wide int8 beam (with segment growth, exercising scale-plane padding
    and per-step parent scale gathers) agrees with the fp32 beam on the
    test model, like the greedy int8 test above."""
    params, mem, mem_valid = setup
    ref, _, ref_mask = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=3, max_len=24,
        length_penalty=0.0, initial_segment=8, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32)
    q, _, _ = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=3, max_len=24,
        length_penalty=0.0, initial_segment=8, compute_dtype=jnp.float32,
        cache_dtype=jnp.int8)
    n = min(ref.shape[1], q.shape[1])
    agree = (np.asarray(ref)[:, :n] == np.asarray(q)[:, :n]).mean()
    assert agree > 0.9, agree


def test_beam_batch_rows_independent(setup):
    """Batched beam search must equal per-row beam search (mask handling,
    latent expansion, and cache reordering don't leak across rows)."""
    params, mem, mem_valid = setup
    batched = decode_lib.beam_generate(
        params, CFG, mem, mem_valid, beam_size=3, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    for i in range(mem.shape[0]):
        single = decode_lib.beam_generate(
            params, CFG, mem[i:i + 1], mem_valid[i:i + 1], beam_size=3,
            max_len=16, compute_dtype=jnp.float32, cache_dtype=jnp.float32)
        n = min(batched[0].shape[1], single[0].shape[1])
        m = np.asarray(batched[2])[i, :n]
        np.testing.assert_array_equal(np.asarray(batched[0])[i, :n][m],
                                      np.asarray(single[0])[0, :n][m])


def test_beam_segment_growth_matches_single_segment(setup):
    params, mem, mem_valid = setup
    a = decode_lib.beam_generate(params, CFG, mem, mem_valid, beam_size=3,
                                 max_len=20, initial_segment=4,
                                 compute_dtype=jnp.float32,
                                 cache_dtype=jnp.float32)
    b = decode_lib.beam_generate(params, CFG, mem, mem_valid, beam_size=3,
                                 max_len=20, initial_segment=20,
                                 compute_dtype=jnp.float32,
                                 cache_dtype=jnp.float32)
    n = min(a[0].shape[1], b[0].shape[1])
    np.testing.assert_array_equal(np.asarray(a[0])[:, :n], np.asarray(b[0])[:, :n])


def test_beam_finds_non_greedy_optimum():
    """Hand-built trap: token A is locally best at step 1 but leads to a low-
    probability continuation; beam search must recover the globally better
    path that greedy misses."""
    cfg = DecoderConfig(max_lmx_seq_len=8, vocab_size=8, num_layers=1,
                        hidden_dim=8, num_heads=1, mlp_dim=8, dropout=0.0,
                        pad_idx=1, bos_idx=0, eos_idx=2)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(5), cfg)
    mem = jax.random.normal(jax.random.PRNGKey(6), (1, 4, cfg.hidden_dim))

    # Search seeds for a model where greedy != beam(4) and beam wins on score.
    for seed in range(40):
        params = omr_decoder.init_decoder_params(jax.random.PRNGKey(seed), cfg)
        g_seqs, g_lps, g_mask = decode_lib.generate(
            params, cfg, mem, None, max_len=6,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32)
        b_seqs, b_lps, b_mask = decode_lib.beam_generate(
            params, cfg, mem, None, beam_size=4, max_len=6,
            length_penalty=0.0, compute_dtype=jnp.float32,
            cache_dtype=jnp.float32)
        n = min(g_seqs.shape[1], b_seqs.shape[1])
        if not np.array_equal(np.asarray(g_seqs)[:, :n], np.asarray(b_seqs)[:, :n]):
            g = np.where(np.asarray(g_mask), np.asarray(g_lps), 0.0).sum()
            b = np.where(np.asarray(b_mask), np.asarray(b_lps), 0.0).sum()
            assert b >= g - 1e-5, (b, g, seed)
            return
    pytest.skip("no greedy-vs-beam divergence found in seed sweep")
