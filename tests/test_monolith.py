"""Parity tests for the monolithic decode-step Pallas kernel.

Mirrors the reference's cached-vs-uncached equivalence strategy (reference:
tests/test_kv_caching.py — cached components validated against the plain
forward on identical weights): the monolith layer-stack kernel, run in the
Pallas interpreter on CPU, must reproduce the per-op XLA decode step and the
full generate() loop bit-for-bit in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acai_omr_tpu.models import decode
from acai_omr_tpu.models.omr_decoder import DecoderConfig, init_decoder_params
from acai_omr_tpu.ops import pallas_monolith

CFG = DecoderConfig(max_lmx_seq_len=64, vocab_size=33, num_layers=2,
                    hidden_dim=256, num_heads=4, mlp_dim=1024, eos_idx=2)
B, M, T_CACHE = 4, 32, 32


@pytest.fixture(autouse=True)
def _test_mode():
    pallas_monolith.set_test_mode(force=True, interpret=True)
    yield
    pallas_monolith.set_test_mode(force=False, interpret=False)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_decoder_params(key, CFG)
    latent = jax.random.normal(jax.random.PRNGKey(1), (B, M, CFG.hidden_dim),
                               jnp.float32)
    valid = jnp.arange(M)[None, :] < jnp.asarray([M, M - 5, 17, M])[:, None]
    return params, latent, valid


def hd_to_te(c):
    """(L, B, H, Dh, T) -> (L, B, T, E)."""
    l, b, h, dh, t = c.shape
    return jnp.transpose(c, (0, 1, 4, 2, 3)).reshape(l, b, t, h * dh)


def te_to_hd(c, h):
    l, b, t, e = c.shape
    return jnp.transpose(c.reshape(l, b, t, h, e // h), (0, 1, 3, 4, 2))


def test_step_parity_vs_xla(setup):
    """One monolith step == the per-op XLA step (logits + cache append)."""
    params, latent, valid = setup
    mem_hd = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.float32)
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.float32, layout="te")

    # prefill caches with a few decoded positions via the XLA path
    pos = 5
    state = decode.init_decode_state(CFG, B, 16, T_CACHE,
                                     cache_dtype=jnp.float32)
    state = decode.decode_segment(params, CFG, state, mem_hd, pos,
                                  compute_dtype=jnp.float32)
    assert int(state.t) == pos + 1 or bool(jnp.all(state.finished))
    t = state.t

    prev_tok = jnp.take_along_axis(state.seqs, (t - 1)[None, None], axis=1)[:, 0]
    x = decode._embed_token(params, prev_tok, t - 1, jnp.float32)

    caches = {"k": state.k_cache, "v": state.v_cache}
    ref_logits, ref_caches = decode._decode_step_logits(
        params, CFG, x, t, dict(caches), mem_hd, jnp.float32)

    mono = pallas_monolith.prepack(params, CFG, jnp.float32)
    bias_col = mem_hd.bias.reshape(B, M, 1).astype(jnp.float32)
    x_out, k_te, v_te = pallas_monolith.decode_layers(
        mono, x, t - 1, hd_to_te(state.k_cache), hd_to_te(state.v_cache),
        mem_te.k, mem_te.v, bias_col, num_heads=CFG.num_heads)
    from acai_omr_tpu.ops import nn
    x_out = nn.layernorm(params["final_norm"], x_out, eps=1e-6)
    logits = nn.dense(params["unembed"], x_out).astype(jnp.float32)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-4)
    # appended K/V columns match the XLA writes (only positions <= pos valid)
    k_back = te_to_hd(k_te, CFG.num_heads)
    v_back = te_to_hd(v_te, CFG.num_heads)
    np.testing.assert_allclose(
        np.asarray(k_back[..., :pos + 1]),
        np.asarray(ref_caches["k"][..., :pos + 1]), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(v_back[..., :pos + 1]),
        np.asarray(ref_caches["v"][..., :pos + 1]), atol=2e-5, rtol=1e-5)


def test_generate_parity_full_loop(setup):
    """Full generate(): monolith path == per-op path (tokens identical)."""
    params, latent, valid = setup

    pallas_monolith.set_test_mode(force=False, interpret=True)
    seqs_ref, lps_ref, mask_ref = decode.generate(
        params, CFG, latent, valid, max_len=48, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    pallas_monolith.set_test_mode(force=True, interpret=True)
    seqs, lps, mask = decode.generate(
        params, CFG, latent, valid, max_len=48, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    assert seqs.shape == seqs_ref.shape
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_ref))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_ref),
                               atol=2e-4, rtol=1e-4)


def test_generate_parity_sampled(setup):
    """Sampled rollouts (GRPO path) agree across the two step backends."""
    params, latent, valid = setup
    kwargs = dict(max_len=32, initial_segment=16, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32,
                  sampling=decode.SamplingConfig(top_k=5, temperature=1.3),
                  rng=jax.random.PRNGKey(7))

    pallas_monolith.set_test_mode(force=False, interpret=True)
    seqs_ref, lps_ref, _ = decode.generate(params, CFG, latent, valid, **kwargs)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    seqs, lps, _ = decode.generate(params, CFG, latent, valid, **kwargs)

    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_ref))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_ref),
                               atol=2e-4, rtol=1e-4)


def test_beam_generate_parity(setup):
    """Beam search: monolith path == per-op path (tokens + scores)."""
    params, latent, valid = setup
    kwargs = dict(beam_size=3, max_len=32, initial_segment=16,
                  compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    pallas_monolith.set_test_mode(force=False, interpret=True)
    seqs_ref, lps_ref, _ = decode.beam_generate(params, CFG, latent, valid,
                                                **kwargs)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    seqs, lps, _ = decode.beam_generate(params, CFG, latent, valid, **kwargs)

    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_ref))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_ref),
                               atol=2e-4, rtol=1e-4)


def test_grouped_mem_generate_parity(setup):
    """Grouped memory (GRPO rollouts / beams): the monolith kernel's shared
    single-memory cross attention == the per-op grouped einsum path."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    g = 4
    kwargs = dict(mem_group=g, max_len=32, initial_segment=16, compact=False,
                  compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                  sampling=decode.SamplingConfig(top_k=5, temperature=1.3),
                  rng=jax.random.PRNGKey(5))

    pallas_monolith.set_test_mode(force=False, interpret=True)
    seqs_ref, lps_ref, _ = decode.generate(params, CFG, lat, val, **kwargs)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    seqs, lps, _ = decode.generate(params, CFG, lat, val, **kwargs)

    assert seqs.shape[0] == 2 * g
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_ref))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_ref),
                               atol=2e-4, rtol=1e-4)


def test_grouped_mem_matches_replicated_monolith(setup):
    """On the monolith kernel itself: grouped shared-memory decode ==
    replicated-memory decode of the expanded latent (greedy)."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    g = 4
    kwargs = dict(max_len=32, initial_segment=16, compact=False,
                  compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    ref = decode.generate(params, CFG, jnp.repeat(lat, g, axis=0),
                          jnp.repeat(val, g, axis=0), **kwargs)
    out = decode.generate(params, CFG, lat, val, mem_group=g, **kwargs)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=2e-4, rtol=1e-4)


def test_int8_step_quantized_append_and_logits(setup):
    """int8 monolith step: appended K/V dequantize to the fp32 projections
    within half a quantization step, and logits track the fp32 path."""
    params, latent, valid = setup
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.int8, layout="te")
    mem_f32 = decode.precompute_memory_kv(params, CFG, latent, valid,
                                          jnp.float32, jnp.float32, layout="te")
    assert mem_te.k.dtype == jnp.int8 and mem_te.k_scale.shape == \
        (CFG.num_layers, B, M, CFG.num_heads)

    mono = pallas_monolith.prepack(params, CFG, jnp.float32)
    pos = 3
    tt = pallas_monolith.time_tile(jnp.int8)
    t_cache = tt * 2
    x = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.hidden_dim),
                          jnp.float32)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)

    # scale planes ride lane-packed in bf16 (group == the kernel row tile)
    g = pallas_monolith.scale_pack_group(B, t_cache, M, CFG.hidden_dim,
                                         CFG.num_heads)
    pack = lambda s: pallas_monolith.pack_scales(s.astype(jnp.bfloat16), g)
    state = decode.init_decode_state(CFG, B, 16, t_cache,
                                     cache_dtype=jnp.int8, monolith=True,
                                     scale_group=g)
    x8, k8, v8, ks8p, vs8p = pallas_monolith.decode_layers(
        mono, x, pos, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
        bias_col, num_heads=CFG.num_heads, k_scale=state.k_scale,
        v_scale=state.v_scale, mem_k_scale=pack(mem_te.k_scale),
        mem_v_scale=pack(mem_te.v_scale))
    ks8 = pallas_monolith.unpack_scales(ks8p.astype(jnp.float32), g)
    vs8 = pallas_monolith.unpack_scales(vs8p.astype(jnp.float32), g)

    statef = decode.init_decode_state(CFG, B, 16, t_cache,
                                      cache_dtype=jnp.float32, monolith=True)
    xf, kf, vf = pallas_monolith.decode_layers(
        mono, x, pos, statef.k_cache, statef.v_cache, mem_f32.k, mem_f32.v,
        bias_col, num_heads=CFG.num_heads)

    # appended column dequantizes to the fp32 K within scale/2 per head
    h, dh = CFG.num_heads, CFG.head_dim
    kq = np.asarray(k8[:, :, pos, :], np.float32).reshape(
        CFG.num_layers, B, h, dh)
    ks = np.asarray(ks8[:, :, pos, :])                      # (L, B, H)
    kref = np.asarray(kf[:, :, pos, :]).reshape(CFG.num_layers, B, h, dh)
    # fp32 layer inputs diverge slightly after layer 0 (quantized attention
    # feeds later layers), so check layer 0 tightly
    np.testing.assert_allclose(kq[0] * ks[0][..., None], kref[0],
                               atol=float(ks[0].max()) / 2 + 1e-6)
    # untouched cache positions stay zero
    assert not np.asarray(k8[:, :, pos + 1:, :]).any()
    # hidden state tracks the fp32 path within quantization noise
    xf_n, x8_n = np.asarray(xf, np.float32), np.asarray(x8, np.float32)
    rel = np.abs(x8_n - xf_n).mean() / (np.abs(xf_n).mean() + 1e-9)
    assert rel < 0.05, rel


def test_int8_w8a8_step_close(setup):
    """W8A8 (int8 weights + per-row int8 activations) tracks the fp32 path
    within combined quantization noise on one full layer-stack step."""
    params, latent, valid = setup
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.int8, layout="te")
    mem_f32 = decode.precompute_memory_kv(params, CFG, latent, valid,
                                          jnp.float32, jnp.float32,
                                          layout="te")
    tt = pallas_monolith.time_tile(jnp.int8)
    t_cache = tt * 2
    g = pallas_monolith.scale_pack_group(B, t_cache, M, CFG.hidden_dim,
                                         CFG.num_heads)
    pack = lambda s: pallas_monolith.pack_scales(s.astype(jnp.bfloat16), g)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.hidden_dim),
                          jnp.float32)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)

    mono8 = pallas_monolith.prepack(params, CFG, jnp.float32,
                                    quantize_weights=True)
    assert mono8["w_qkv"].dtype == jnp.int8
    assert mono8["wscale"].shape == (CFG.num_layers, 6, CFG.mlp_dim)
    state = decode.init_decode_state(CFG, B, 16, t_cache,
                                     cache_dtype=jnp.int8, monolith=True,
                                     scale_group=g)
    x8 = pallas_monolith.decode_layers(
        mono8, x, 3, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
        bias_col, num_heads=CFG.num_heads, k_scale=state.k_scale,
        v_scale=state.v_scale, mem_k_scale=pack(mem_te.k_scale),
        mem_v_scale=pack(mem_te.v_scale))[0]

    monof = pallas_monolith.prepack(params, CFG, jnp.float32)
    statef = decode.init_decode_state(CFG, B, 16, t_cache,
                                      cache_dtype=jnp.float32, monolith=True)
    xf = pallas_monolith.decode_layers(
        monof, x, 3, statef.k_cache, statef.v_cache, mem_f32.k, mem_f32.v,
        bias_col, num_heads=CFG.num_heads)[0]

    xf_n, x8_n = np.asarray(xf, np.float32), np.asarray(x8, np.float32)
    rel = np.abs(x8_n - xf_n).mean() / (np.abs(xf_n).mean() + 1e-9)
    assert rel < 0.08, rel


def test_int8_generate_runs_and_is_close(setup):
    """Full int8-monolith generate runs through growth/compaction and stays
    close to the fp32 decode (random weights: tokens may diverge late, but
    the machinery must produce valid masked sequences)."""
    params, latent, valid = setup
    seqs, lps, mask = decode.generate(
        params, CFG, latent, valid, max_len=48, initial_segment=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    assert seqs.shape[0] == B and seqs.shape[1] <= 48
    assert mask.dtype == bool and bool(mask[:, 0].all())
    # log-probs are valid (<= 0) wherever mask is set
    assert float(jnp.max(jnp.where(mask, lps, -1.0))) <= 1e-6


def test_sharded_int8_generate_with_growth(setup):
    """shard_map int8 decode through a cache-growth boundary: the host loop
    must unpack/repad/repack the lane-packed scale planes (and repack the
    memory planes when the row-tile group changes). Tokens must match the
    single-device monolith decode (greedy decode is row-independent)."""
    from acai_omr_tpu.parallel import mesh as mesh_lib
    params, latent, valid = setup
    kwargs = dict(max_len=48, initial_segment=32,
                  compute_dtype=jnp.float32, cache_dtype=jnp.int8)

    ref = decode.generate(params, CFG, latent, valid, **kwargs)

    mesh = mesh_lib.make_mesh(2, 1, devices=jax.devices()[:2])
    got = decode.sharded_generate(params, CFG, latent, valid, mesh, **kwargs)

    n = min(ref[0].shape[1], got[0].shape[1])
    np.testing.assert_array_equal(np.asarray(got[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_scale_pack_roundtrip():
    """Lane-packing of int8 scale planes is a pure layout permutation."""
    s = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 32, 4))
    for g in (1, 2, 4, 8):
        p = pallas_monolith.pack_scales(s, g)
        assert p.shape == (3, 8 // g, 32, g * 4)
        np.testing.assert_array_equal(
            np.asarray(pallas_monolith.unpack_scales(p, g)), np.asarray(s))
        # packed lane l = b_in_group * H + h
        np.testing.assert_array_equal(
            np.asarray(p[1, 0, :, 4:8]) if g > 1 else np.asarray(p[1, 0, :, :4]),
            np.asarray(s[1, 1 if g > 1 else 0]))


def test_row_tile_picker():
    assert pallas_monolith.pick_row_tile(32, 512, 512, 1024, 2) == 4
    assert pallas_monolith.pick_row_tile(1, 512, 512, 1024, 2) == 1
    assert pallas_monolith.pick_row_tile(32, 1536, 512, 1024, 2) == 2
    assert pallas_monolith.pick_row_tile(64, 256, 512, 1024, 2) == 8
    # W8A8 int8 rides the manual-CDMA plan: explicit S-slot scratch plus the
    # bt²-sized masks/logits (the terms that OOMed the measured bt=16
    # compile — see _MAX_BT / _cdma_vmem)
    assert pallas_monolith.pick_row_tile(32, 512, 512, 1024, 1) == 8
    assert pallas_monolith.pick_cdma_plan(32, 512, 512, 1024, 1) == (8, 3)
    # long cache segments shed slots before shrinking the tile: at 1536 the
    # S=3 scratch would exceed VMEM at bt=8 (a scoped-VMEM OOM waiting to
    # happen on hardware before the plan modeled it), S=2 keeps bt=8
    assert pallas_monolith.pick_cdma_plan(32, 1536, 512, 1024, 1) == (8, 2)
    assert pallas_monolith.pick_row_tile(8, 512, 512, 1024, 1) == 8
    # the experiment knob raises the cap, but the model still rejects bt=16
    # at the flagship shape (measured OOM); smaller shapes may admit it
    old = pallas_monolith._MAX_BT
    pallas_monolith._MAX_BT = 16
    try:
        assert pallas_monolith.pick_row_tile(32, 512, 512, 1024, 1) == 8
        assert pallas_monolith.pick_row_tile(32, 256, 256, 1024, 1) == 16
        assert pallas_monolith.pick_row_tile(32, 512, 512, 1024, 1,
                                             w8a8=False) == 8
    finally:
        pallas_monolith._MAX_BT = old


def test_int8_bt16_parity_vs_bt8():
    """The W8A8 row tile bt=16 is bit-identical to bt=8: every kernel stage
    (per-row quantization, block-diagonal attention with exact 0/NEG_INF
    masking, per-row FF/LN) is row-independent, so the tile size must not
    change results — validates the wider weight-prefetch window tile."""
    cfg = DecoderConfig(max_lmx_seq_len=64, vocab_size=33, num_layers=2,
                        hidden_dim=256, num_heads=4, mlp_dim=1024, eos_idx=2)
    b, m = 16, 32
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    latent = jax.random.normal(jax.random.PRNGKey(1), (b, m, cfg.hidden_dim),
                               jnp.float32)
    valid = jnp.arange(m)[None, :] < jnp.asarray([m, m - 5, 17, m] * 4)[:, None]
    mem_te = decode.precompute_memory_kv(params, cfg, latent, valid,
                                         jnp.float32, jnp.int8, layout="te")
    mono8 = pallas_monolith.prepack(params, cfg, jnp.float32,
                                    quantize_weights=True)
    t_cache = pallas_monolith.time_tile(jnp.int8)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.hidden_dim),
                          jnp.float32)
    bias_col = mem_te.bias.reshape(b, m, 1).astype(jnp.float32)

    outs = {}
    for max_bt in (8, 16):
        old = pallas_monolith._MAX_BT
        pallas_monolith._MAX_BT = max_bt
        try:
            g = pallas_monolith.scale_pack_group(b, t_cache, m,
                                                 cfg.hidden_dim, cfg.num_heads)
            assert g == max_bt
            pack = lambda s: pallas_monolith.pack_scales(
                s.astype(jnp.bfloat16), g)
            state = decode.init_decode_state(cfg, b, 16, t_cache,
                                             cache_dtype=jnp.int8,
                                             monolith=True, scale_group=g)
            x8, k8, v8, ks8, vs8 = pallas_monolith.decode_layers(
                mono8, x, 3, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
                bias_col, num_heads=cfg.num_heads, k_scale=state.k_scale,
                v_scale=state.v_scale, mem_k_scale=pack(mem_te.k_scale),
                mem_v_scale=pack(mem_te.v_scale))
            outs[max_bt] = (
                np.asarray(x8), np.asarray(k8), np.asarray(v8),
                np.asarray(pallas_monolith.unpack_scales(
                    ks8.astype(jnp.float32), g)),
                np.asarray(pallas_monolith.unpack_scales(
                    vs8.astype(jnp.float32), g)))
        finally:
            pallas_monolith._MAX_BT = old
    for a, c in zip(outs[8], outs[16]):
        np.testing.assert_array_equal(a, c)


def test_manual_wdma_bit_identical(setup):
    """The manual layer-ahead weight-prefetch mode is a pure DMA-scheduling
    change: forced on vs forced off must be bit-identical on the bf16 path
    (the int8 path runs manual by default under "auto" and is covered by the
    int8 parity tests above)."""
    params, latent, valid = setup
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.float32,
                                         layout="te")
    x = jax.random.normal(jax.random.PRNGKey(7), (B, CFG.hidden_dim),
                          jnp.float32)
    mono = pallas_monolith.prepack(params, CFG, jnp.float32)
    state = decode.init_decode_state(CFG, B, 16, T_CACHE,
                                     cache_dtype=jnp.float32, monolith=True)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)

    outs = {}
    for flag in (False, True):
        pallas_monolith.set_manual_wdma(flag)
        try:
            res = pallas_monolith.decode_layers(
                mono, x, 3, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
                bias_col, num_heads=CFG.num_heads)
            outs[flag] = tuple(np.asarray(r) for r in res)
        finally:
            pallas_monolith.set_manual_wdma("auto")
    for a, c in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, c)


def test_manual_cdma_bit_identical(setup):
    """The manual cache-stream prefetch mode (double-buffered scratch fed a
    grid step ahead) is a pure DMA-scheduling change: forced on vs forced off
    must be bit-identical on the bf16 path (the int8 path runs it by default
    under "auto" and is covered by the int8 parity tests above)."""
    params, latent, valid = setup
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.float32,
                                         layout="te")
    x = jax.random.normal(jax.random.PRNGKey(7), (B, CFG.hidden_dim),
                          jnp.float32)
    mono = pallas_monolith.prepack(params, CFG, jnp.float32)
    state = decode.init_decode_state(CFG, B, 16, T_CACHE,
                                     cache_dtype=jnp.float32, monolith=True)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)

    outs = {}
    for flag in (False, True):
        pallas_monolith.set_manual_cdma(flag)
        try:
            res = pallas_monolith.decode_layers(
                mono, x, 3, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
                bias_col, num_heads=CFG.num_heads)
            outs[flag] = tuple(np.asarray(r) for r in res)
        finally:
            pallas_monolith.set_manual_cdma("auto")
    for a, c in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, c)


def test_manual_cdma_grouped_bf16_bit_identical(setup):
    """cdma forced on vs off on the grouped-memory bf16 path (shared (M, E)
    block per tile) — covers the grouped prefetch indexing."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    g = 4
    kwargs = dict(mem_group=g, max_len=32, initial_segment=16, compact=False,
                  compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    outs = {}
    for flag in (False, True):
        pallas_monolith.set_manual_cdma(flag)
        try:
            outs[flag] = decode.generate(params, CFG, lat, val, **kwargs)
        finally:
            pallas_monolith.set_manual_cdma("auto")
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_array_equal(np.asarray(outs[False][1]),
                                  np.asarray(outs[True][1]))


def test_chunk_skip_bit_identical(setup):
    """The dead-row DMA skip (ACAI_MONOLITH_CHUNK_SKIP, default off — it
    measured SLOWER end-to-end, see docs/PERF.md) must be a pure scheduling
    change when forced on: skipped chunks cover only rows the attention
    masks to exp=0, so int8 outputs are bit-identical at any pos. Cache
    > 128 so the 128-row chunking actually engages (both a skipped-chunk
    pos and an all-chunks-stream pos)."""
    params, latent, valid = setup
    t_cache = 160  # 5 int8 time tiles, 2 chunks (c=0, c=128)
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.int8, layout="te")
    g = pallas_monolith.scale_pack_group(B, t_cache, M, CFG.hidden_dim,
                                         CFG.num_heads)
    pack = lambda s: pallas_monolith.pack_scales(s.astype(jnp.bfloat16), g)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, CFG.hidden_dim),
                          jnp.float32)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)
    mono = pallas_monolith.prepack(params, CFG, jnp.float32)
    state = decode.init_decode_state(CFG, B, 16, t_cache,
                                     cache_dtype=jnp.int8, monolith=True,
                                     scale_group=g)

    for pos in (3, 140):  # chunk 1 skipped; all chunks stream
        outs = {}
        for flag in (False, True):
            pallas_monolith.set_chunk_skip(flag)
            try:
                res = pallas_monolith.decode_layers(
                    mono, x, pos, state.k_cache, state.v_cache, mem_te.k,
                    mem_te.v, bias_col, num_heads=CFG.num_heads,
                    k_scale=state.k_scale, v_scale=state.v_scale,
                    mem_k_scale=pack(mem_te.k_scale),
                    mem_v_scale=pack(mem_te.v_scale))
                outs[flag] = tuple(np.asarray(r) for r in res)
            finally:
                pallas_monolith.set_chunk_skip("0")
        for a, c in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, c)


def test_grouped_mem_int8_matches_replicated_monolith(setup):
    """int8 grouped cross-attention (shared (M, E) block + narrow shared
    scale planes) is bit-identical to replicated int8 decode of the expanded
    latent: same int8 products accumulate in int32, masked rows contribute
    exact zeros, and the narrow mem planes carry the same bf16-rounded
    scales the packed planes do."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    g = 4
    kwargs = dict(max_len=32, initial_segment=16, compact=False,
                  compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    pallas_monolith.set_test_mode(force=True, interpret=True)
    ref = decode.generate(params, CFG, jnp.repeat(lat, g, axis=0),
                          jnp.repeat(val, g, axis=0), **kwargs)
    out = decode.generate(params, CFG, lat, val, mem_group=g, **kwargs)
    assert out[0].shape[0] == 2 * g
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=2e-4,
                               rtol=1e-4)


def test_grouped_mem_int8_sampled_with_compaction(setup):
    """Grouped int8 rollout decode (the GRPO path: sampled, compaction on)
    matches the replicated layout — exercises the grouped-int8 segment
    boundary moves (group-selected raw mem planes, re-packed self planes)."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    g = 4
    kwargs = dict(max_len=48, initial_segment=16, segment_steps=8,
                  compute_dtype=jnp.float32, cache_dtype=jnp.int8,
                  sampling=decode.SamplingConfig(top_k=5, temperature=1.3),
                  rng=jax.random.PRNGKey(5))
    pallas_monolith.set_test_mode(force=True, interpret=True)
    ref = decode.generate(params, CFG, jnp.repeat(lat, g, axis=0),
                          jnp.repeat(val, g, axis=0), compact=False, **kwargs)
    out = decode.generate(params, CFG, lat, val, mem_group=g, compact=True,
                          **kwargs)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_beam_int8_monolith_k1_matches_greedy_int8(setup):
    """K=1 int8 beam search on the monolith == greedy int8 monolith decode,
    token-identical: the beam path rides the same lane-packed self scale
    planes and packed memory planes the greedy path streams (previously int8
    beams fell back to the per-op kernels — VERDICT round 1, weak #5)."""
    params, latent, valid = setup
    kwargs = dict(max_len=48, initial_segment=16,
                  compute_dtype=jnp.float32, cache_dtype=jnp.int8)
    ref = decode.generate(params, CFG, latent, valid, compact=False, **kwargs)
    out = decode.beam_generate(params, CFG, latent, valid, beam_size=1,
                               length_penalty=0.0, **kwargs)
    n = min(ref[0].shape[1], out[0].shape[1])
    np.testing.assert_array_equal(np.asarray(out[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(out[1])[:, :n],
                               np.asarray(ref[1])[:, :n], atol=2e-4,
                               rtol=1e-4)


def test_beam_int8_monolith_segment_invariance(setup):
    """Wide int8-monolith beam run through cache growth == the same beam run
    in one segment (token + score identical). Exercises the full composition
    matrix corner (beam x int8 x grouped): per-step beam reordering on
    lane-packed planes (unpack -> parent gather -> repack), the shared
    narrow memory planes (mem_group=K), and the growth move (unpack -> pad
    T -> repack at the new segment's pack group)."""
    params, latent, valid = setup
    lat, val = latent[:2], valid[:2]
    k = 4  # b*k=8 rows -> pack group 4: beams permute within a packed group
    kwargs = dict(beam_size=k, compute_dtype=jnp.float32,
                  cache_dtype=jnp.int8)
    one = decode.beam_generate(params, CFG, lat, val, max_len=48,
                               initial_segment=48, **kwargs)
    seg = decode.beam_generate(params, CFG, lat, val, max_len=48,
                               initial_segment=16, segment_steps=8, **kwargs)
    n = min(one[0].shape[1], seg[0].shape[1])
    np.testing.assert_array_equal(np.asarray(seg[0])[:, :n],
                                  np.asarray(one[0])[:, :n])
    np.testing.assert_allclose(np.asarray(seg[1])[:, :n],
                               np.asarray(one[1])[:, :n], atol=2e-4,
                               rtol=1e-4)
    # outputs are valid masked sequences with log-probs <= 0
    mask = np.asarray(seg[2])
    assert mask[:, 0].all()
    assert float(np.max(np.where(mask, np.asarray(seg[1]), -1.0))) <= 1e-6


def test_sharded_grouped_int8_generate(setup):
    """shard_map grouped int8 decode (GRPO rollout sharding with quantized
    caches): per-shard monolith kernels on the packed-self / shared-mem
    plane layouts, through a cache-growth boundary; greedy tokens must
    match the single-device grouped int8 decode."""
    from acai_omr_tpu.parallel import mesh as mesh_lib
    params, latent, valid = setup
    g = 2
    kwargs = dict(max_len=48, initial_segment=32, mem_group=g,
                  compute_dtype=jnp.float32, cache_dtype=jnp.int8)

    ref = decode.generate(params, CFG, latent, valid, compact=False, **kwargs)

    mesh = mesh_lib.make_mesh(2, 1, devices=jax.devices()[:2])
    got = decode.sharded_generate(params, CFG, latent, valid, mesh, **kwargs)

    assert got[0].shape[0] == latent.shape[0] * g
    n = min(ref[0].shape[1], got[0].shape[1])
    np.testing.assert_array_equal(np.asarray(got[0])[:, :n],
                                  np.asarray(ref[0])[:, :n])


def test_pick_row_tile_sub_128_lane_self_consistent(monkeypatch):
    """When the manual-CDMA plan would pick a bt whose int8 scale planes
    are narrower than one 128-lane tile (bt*H < 128), the kernel falls back
    to BlockSpec delivery — pick_row_tile must re-budget with the window
    model so the host pack group (scale_pack_group, same function) and the
    kernel's tile choice stay consistent (round-4 review finding)."""
    monkeypatch.setattr(pallas_monolith, "_MANUAL_CDMA", "auto", raising=False)
    # beam-4-like shape: b=4 rows, 16 heads -> any bt < 8 gives bt*16 < 128
    for b, h in ((4, 16), (2, 16), (8, 4)):
        bt = pallas_monolith.pick_row_tile(b, 512, 512, 1024, 1,
                                           num_heads=h)
        grp = pallas_monolith.scale_pack_group(b, 512, 512, 1024, h)
        assert bt == grp, (b, h, bt, grp)
        if (bt * h) % 128:
            # the re-budget path ran: the window model must agree for the
            # same args no matter how many times it is consulted
            assert pallas_monolith.pick_row_tile(
                b, 512, 512, 1024, 1, num_heads=h, manual_cdma=False) == bt


def test_weight_mode_plan_consistency_under_env_combos(monkeypatch):
    """The host scale-pack planning and the kernel's weight mode must agree
    for every (W8A8, TP_W8A8, W4A8) env combination (round-5 review: two
    split-brain bugs where the host planned one weight mode's VMEM budget
    while the kernel ran another).

    1. An EXPLICIT w8a8= (the TP pack-group sites) pins the mode: the env
       W4A8 policy must not silently re-plan those calls for int4 — TP
       shards never run int4 (weight_quant_mode).
    2. weight_quant_mode's tp branch requires _W8A8 AND ACAI_TP_W8A8, like
       the host expression want_w8a8() and want_tp_w8a8().
    """
    args = (16, 512, 512, 1024)   # b, t, m, e at flagship-ish widths

    # int4 env policy on: explicit-w8a8 call sites must plan exactly as
    # they do with the policy off (they resolve to W8A8/bf16, never int4)
    for w8 in (True, False):
        monkeypatch.setattr(pallas_monolith, "_W4A8", False)
        base = pallas_monolith.pick_row_tile(*args, 1, num_heads=16, w8a8=w8)
        monkeypatch.setattr(pallas_monolith, "_W4A8", True)
        got = pallas_monolith.pick_row_tile(*args, 1, num_heads=16, w8a8=w8)
        assert got == base, (w8, got, base)
    # ... while env-policy calls (w8a8 unspecified) DO follow int4
    assert pallas_monolith._weights_vmem_for(True, None, None)[2] is True
    monkeypatch.setattr(pallas_monolith, "_W4A8", False)

    # tp branch: "int8" only when BOTH _W8A8 and _TP_W8A8 (the host packs
    # with want_w8a8() and want_tp_w8a8())
    import jax.numpy as jnp
    for w8, tpw8 in ((True, True), (True, False), (False, True),
                     (False, False)):
        monkeypatch.setattr(pallas_monolith, "_W8A8", w8)
        monkeypatch.setattr(pallas_monolith, "_TP_W8A8", tpw8)
        kernel_mode = pallas_monolith.weight_quant_mode(jnp.int8,
                                                        tp_mono=True)
        host_w8a8 = (pallas_monolith.want_w8a8(jnp.int8)
                     and pallas_monolith.want_tp_w8a8())
        assert (kernel_mode == "int8") == host_w8a8, (w8, tpw8, kernel_mode)


def test_prepack_int4_pack_roundtrip(setup):
    """The int4 nibble pack is exactly invertible: floor-divide unpack of the
    packed bytes (the kernel's unpack_int4 scheme, tools/int4_probe.py EXACT
    variant) reconstructs the per-half per-column quantized values, and
    dequant matches direct fake-quantization."""
    params, _, _ = setup
    mono4 = pallas_monolith.prepack(params, CFG, jnp.float32,
                                    quantize_weights="int4")
    assert mono4["wscale4"].shape == (CFG.num_layers, 6, CFG.mlp_dim)
    for m_idx, name in enumerate(("w_qkv", "w_self_out", "w_cross_q",
                                  "w_cross_out", "w_ff1", "w_ff2")):
        wp = np.asarray(mono4[name], np.float32)   # packed along pack axis
        assert mono4[name].dtype == jnp.int8
        hi = np.floor(wp / 16.0)
        lo = wp - 16.0 * hi - 8.0
        assert lo.min() >= -8 and lo.max() <= 7
        assert hi.min() >= -8 and hi.max() <= 7
        cout = {"w_qkv": 3 * CFG.hidden_dim, "w_ff1": CFG.mlp_dim}.get(
            name, CFG.hidden_dim)
        cin = CFG.mlp_dim if name == "w_ff2" else CFG.hidden_dim
        s = np.asarray(mono4["wscale4"], np.float32)[
            :, m_idx:m_idx + 1, :cout]                     # (L, 1, OUT)
        # halves stack along the packed axis (ff2 packs OUTPUT columns)
        if pallas_monolith.int4_pack_axis(cin, cout) == 0:
            q_unpacked = np.concatenate([lo, hi], axis=1)
        else:
            q_unpacked = np.concatenate([lo, hi], axis=2)
        deq = q_unpacked * s
        # reference fake-quant: per-half per-column symmetric int4
        blocks = params["blocks"]
        src = {"w_qkv": blocks["self_attn"]["in_kernel"],
               "w_self_out": blocks["self_attn"]["out"]["kernel"],
               # prepack slices the cross in_kernel to its q columns
               "w_cross_q": blocks["cross_attn"]["in_kernel"]
               [:, :, :CFG.hidden_dim],
               "w_cross_out": blocks["cross_attn"]["out"]["kernel"],
               "w_ff1": blocks["linear1"]["kernel"],
               "w_ff2": blocks["linear2"]["kernel"]}[name]
        w = np.asarray(src, np.float32)
        l, cin2, co = w.shape
        amax = np.abs(w).max(axis=1, keepdims=True)        # per column
        sref = (np.maximum(amax, 1e-8) / 7.0).astype(jnp.bfloat16) \
            .astype(np.float32)
        qref = np.clip(np.round(w / sref), -7, 7)
        if pallas_monolith.int4_pack_axis(cin2, co) == 0:
            np.testing.assert_array_equal(lo, qref[:, :cin2 // 2])
            np.testing.assert_array_equal(hi, qref[:, cin2 // 2:])
        else:
            np.testing.assert_array_equal(lo, qref[:, :, :co // 2])
            np.testing.assert_array_equal(hi, qref[:, :, co // 2:])
        np.testing.assert_allclose(deq, qref * sref, rtol=0, atol=1e-6)


def test_int8_w4a8_step_close(setup):
    """W4A8 (nibble-packed int4 weights + per-half per-row int8 activations)
    tracks the fp32 path within combined quantization noise on one full
    layer-stack step (VERDICT r4 #1; reference decode protocol
    kv_caching.py:258-302 — the reference decodes bf16 only)."""
    params, latent, valid = setup
    mem_te = decode.precompute_memory_kv(params, CFG, latent, valid,
                                         jnp.float32, jnp.int8, layout="te")
    mem_f32 = decode.precompute_memory_kv(params, CFG, latent, valid,
                                          jnp.float32, jnp.float32,
                                          layout="te")
    tt = pallas_monolith.time_tile(jnp.int8)
    t_cache = tt * 2
    g = pallas_monolith.scale_pack_group(B, t_cache, M, CFG.hidden_dim,
                                         CFG.num_heads, w4a8=True)
    pack = lambda s: pallas_monolith.pack_scales(s.astype(jnp.bfloat16), g)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.hidden_dim),
                          jnp.float32)
    bias_col = mem_te.bias.reshape(B, M, 1).astype(jnp.float32)

    mono4 = pallas_monolith.prepack(params, CFG, jnp.float32,
                                    quantize_weights="int4")
    assert mono4["w_qkv"].shape == (CFG.num_layers, CFG.hidden_dim // 2,
                                    3 * CFG.hidden_dim)
    state = decode.init_decode_state(CFG, B, 16, t_cache,
                                     cache_dtype=jnp.int8, monolith=True,
                                     scale_group=g)
    x4 = pallas_monolith.decode_layers(
        mono4, x, 3, state.k_cache, state.v_cache, mem_te.k, mem_te.v,
        bias_col, num_heads=CFG.num_heads, k_scale=state.k_scale,
        v_scale=state.v_scale, mem_k_scale=pack(mem_te.k_scale),
        mem_v_scale=pack(mem_te.v_scale))[0]

    monof = pallas_monolith.prepack(params, CFG, jnp.float32)
    statef = decode.init_decode_state(CFG, B, 16, t_cache,
                                      cache_dtype=jnp.float32, monolith=True)
    xf = pallas_monolith.decode_layers(
        monof, x, 3, statef.k_cache, statef.v_cache, mem_f32.k, mem_f32.v,
        bias_col, num_heads=CFG.num_heads)[0]

    xf_n, x4_n = np.asarray(xf, np.float32), np.asarray(x4, np.float32)
    rel = np.abs(x4_n - xf_n).mean() / (np.abs(xf_n).mean() + 1e-9)
    assert rel < 0.15, rel


def test_erf_poly_accuracy():
    """Both erf forms — the A&S rational (default) and the exp/div-free
    two-branch polynomial (ACAI_ERF_POLY=1; measured slower on v5e, kept
    for hardware where the tradeoff inverts) — match math.erf to <1e-6
    everywhere, far below every kernel parity tolerance (round-5 VPU
    study, docs/PERF.md)."""
    import math
    z = np.linspace(-6.0, 6.0, 120001).astype(np.float32)
    ref = np.vectorize(math.erf)(z)
    got = np.asarray(pallas_monolith._erf_poly(jnp.asarray(z)))
    assert np.abs(got - ref).max() < 1e-6
    got_rat = np.asarray(pallas_monolith._erf_rational(jnp.asarray(z)))
    assert np.abs(got_rat - ref).max() < 1e-6
