"""Parity tests for the fused training-layer kernel (forward + backward).

Mirrors the reference's cached-vs-uncached equivalence strategy (reference:
tests/test_kv_caching.py): the fused Pallas decoder stack, run in the Pallas
interpreter on CPU in fp32, must reproduce the per-op XLA
``transformer.decoder_stack`` — outputs AND gradients (the backward kernel is
hand-written, so grad parity against ``jax.grad`` of the XLA path is the
load-bearing check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acai_omr_tpu.ops import nn, transformer
from acai_omr_tpu.ops import pallas_train_layer as ptl

L, B, T, M, E, H, F = 2, 4, 32, 128, 256, 4, 512


@pytest.fixture(autouse=True)
def _test_mode():
    ptl.set_test_mode(force=True, interpret=True)
    yield
    ptl.set_test_mode(force=False, interpret=False)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.decoder_layer_init, key, L,
                                     E, F)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    memory = jax.random.normal(ks[1], (B, M, E), jnp.float32)
    self_valid = jnp.arange(T)[None, :] < jnp.asarray([T, T - 7, 9, T])[:, None]
    mem_valid = jnp.arange(M)[None, :] < jnp.asarray([M, 40, M - 1, 33])[:, None]
    mem_kv = transformer.precompute_memory_kv(stacked, memory)
    return stacked, x, memory, self_valid, mem_valid, mem_kv


def xla_ref(stacked, x, memory, self_valid, mem_valid, mem_kv):
    # force=False while tracing the reference: otherwise decoder_stack's
    # dispatch would route the "reference" through the fused kernel too and
    # the parity assertions would compare the kernel against itself.
    ptl.set_test_mode(force=False, interpret=True)
    try:
        return transformer.decoder_stack(
            stacked, x, memory,
            nn.MaskSpec(key_valid=self_valid, causal=True),
            nn.MaskSpec(key_valid=mem_valid),
            H, 0.0, None, True, mem_kv=mem_kv)
    finally:
        ptl.set_test_mode(force=True, interpret=True)


@pytest.mark.parametrize("row_tile", [B, 2])
def test_forward_parity(setup, row_tile):
    stacked, x, memory, self_valid, mem_valid, mem_kv = setup
    ref = xla_ref(stacked, x, memory, self_valid, mem_valid, mem_kv)
    out = ptl.decoder_stack_fused(stacked, x, mem_kv, self_valid, mem_valid,
                                  H, row_tile=row_tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("row_tile", [B, 2])
def test_gradient_parity(setup, row_tile):
    """d(loss)/d(params, x, mem_kv) from the hand-written backward kernel
    matches jax.grad of the XLA stack."""
    stacked, x, memory, self_valid, mem_valid, mem_kv = setup
    w = jax.random.normal(jax.random.PRNGKey(7), (B, T, E), jnp.float32)

    def loss_ref(stacked_, x_, mem_kv_):
        out = xla_ref(stacked_, x_, memory, self_valid, mem_valid, mem_kv_)
        return jnp.sum(out * w)

    def loss_fused(stacked_, x_, mem_kv_):
        out = ptl.decoder_stack_fused(stacked_, x_, mem_kv_, self_valid,
                                      mem_valid, H, row_tile=row_tile)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(stacked, x, mem_kv)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(stacked, x, mem_kv)

    flat_ref, tree_ref = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), bb in zip(flat_ref, flat_fused):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-4 * max(scale, 1.0),
            rtol=2e-3, err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_grouped_cross_dispatch_parity(setup):
    """cross_group>1 (GRPO rollout updates, reference models.py:883-891)
    dispatches to the fused kernel with per-rollout repeated mem_kv rows;
    outputs and grads must match the grouped XLA path."""
    stacked, x, memory, self_valid, mem_valid, _ = setup
    g = 2
    mem_u, mv_u = memory[::g], mem_valid[::g]
    w = jax.random.normal(jax.random.PRNGKey(9), (B, T, E), jnp.float32)

    def run(stacked_, x_):
        mkv_u = transformer.precompute_memory_kv(stacked_, mem_u)
        out = transformer.decoder_stack(
            stacked_, x_, mem_u,
            nn.MaskSpec(key_valid=self_valid, causal=True),
            nn.MaskSpec(key_valid=mv_u),
            H, 0.0, None, True, mem_kv=mkv_u, cross_group=g)
        return jnp.sum(out * w)

    def run_ref(stacked_, x_):
        ptl.set_test_mode(force=False, interpret=True)
        try:
            return run(stacked_, x_)
        finally:
            ptl.set_test_mode(force=True, interpret=True)

    lf, gf = jax.value_and_grad(run, argnums=(0, 1))(stacked, x)
    lr, gr = jax.value_and_grad(run_ref, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(gr)
    flat_fused = jax.tree_util.tree_leaves(gf)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), bb in zip(flat_ref, flat_fused):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-4 * max(scale, 1.0),
            rtol=2e-3, err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


# ---------------------------------------------------------------------------
# encoder variant (cross=False)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def enc_setup():
    key = jax.random.PRNGKey(5)
    stacked = transformer.stack_init(transformer.encoder_layer_init, key, L,
                                     E, F)
    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    x = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    valid = jnp.arange(T)[None, :] < jnp.asarray([T, T - 7, 9, T])[:, None]
    return stacked, x, valid


def xla_enc_ref(stacked, x, valid):
    ptl.set_test_mode(force=False, interpret=True)  # see xla_ref
    try:
        return transformer.encoder_stack(
            stacked, x, nn.MaskSpec(key_valid=valid), H, 0.0, None, True)
    finally:
        ptl.set_test_mode(force=True, interpret=True)


@pytest.mark.parametrize("row_tile", [B, 2])
def test_encoder_forward_parity(enc_setup, row_tile):
    stacked, x, valid = enc_setup
    ref = xla_enc_ref(stacked, x, valid)
    out = ptl.encoder_stack_fused(stacked, x, valid, H, row_tile=row_tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("row_tile", [B, 1])
def test_encoder_gradient_parity(enc_setup, row_tile):
    stacked, x, valid = enc_setup
    w = jax.random.normal(jax.random.PRNGKey(8), (B, T, E), jnp.float32)

    def loss_ref(stacked_, x_):
        return jnp.sum(xla_enc_ref(stacked_, x_, valid) * w)

    def loss_fused(stacked_, x_):
        out = ptl.encoder_stack_fused(stacked_, x_, valid, H,
                                      row_tile=row_tile)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(stacked, x)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(stacked, x)

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), bb in zip(flat_ref, flat_fused):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-4 * max(scale, 1.0),
            rtol=2e-3, err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_encoder_grouped_heads_parity():
    """dh=32 (MAE-decoder regime): masked full-lane head groups must match
    the per-head XLA stack, forward and gradients."""
    e, heads = 256, 8  # dh = 32 -> groups of 4 heads
    key = jax.random.PRNGKey(11)
    stacked = transformer.stack_init(transformer.encoder_layer_init, key, L,
                                     e, F)
    x = jax.random.normal(jax.random.PRNGKey(12), (B, T, e), jnp.float32)
    valid = jnp.arange(T)[None, :] < jnp.asarray([T, T - 5, 11, T])[:, None]
    w = jax.random.normal(jax.random.PRNGKey(13), (B, T, e), jnp.float32)

    def loss_ref(stacked_, x_):
        ptl.set_test_mode(force=False, interpret=True)
        try:
            out = transformer.encoder_stack(
                stacked_, x_, nn.MaskSpec(key_valid=valid), heads,
                0.0, None, True)
        finally:
            ptl.set_test_mode(force=True, interpret=True)
        return jnp.sum(out * w)

    def loss_fused(stacked_, x_):
        out = ptl.encoder_stack_fused(stacked_, x_, valid, heads, row_tile=2)
        return jnp.sum(out * w)

    assert ptl.enabled_for_enc(B, T, e, heads)
    g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(stacked, x)
    g_fused = jax.value_and_grad(loss_fused, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(float(g_fused[0]), float(g_ref[0]),
                               rtol=1e-4)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref[1])
    flat_fused = jax.tree_util.tree_leaves(g_fused[1])
    for (path, a), bb in zip(flat_ref, flat_fused):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-4 * max(scale, 1.0),
            rtol=2e-3, err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU-interpreter rule; "
                           "covered on-chip by tools/fused_train_ab.py")
def test_dropout_forward_backward_consistency(setup):
    """With dropout on, the same rng reproduces the same output (PRNG is
    deterministic) and gradients are finite; masks differ across seeds."""
    stacked, x, memory, self_valid, mem_valid, mem_kv = setup
    rng = jax.random.PRNGKey(3)

    def run(r):
        return ptl.decoder_stack_fused(stacked, x, mem_kv, self_valid,
                                       mem_valid, H, dropout_rate=0.5,
                                       rng=r, deterministic=False,
                                       row_tile=B)

    o1, o2 = run(rng), run(rng)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = run(jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def loss(x_):
        out = ptl.decoder_stack_fused(stacked, x_, mem_kv, self_valid,
                                      mem_valid, H, dropout_rate=0.3,
                                      rng=rng, deterministic=False,
                                      row_tile=B)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_split_backward_matches_monolithic(setup):
    """The split backward (grid (nl, 2, nt), ACAI_BWD_SPLIT) must produce
    exactly the monolithic `_bwd_kernel`'s gradients: same op order, and the
    removed `_chain` gates added exactly +0.0 (docs/PERF.md floor study)."""
    stacked, x, memory, self_valid, mem_valid, mem_kv = setup

    orig = ptl._BWD_SPLIT

    def loss(split, stacked_, x_, mem_kv_):
        ptl.set_bwd_split(split)
        try:
            out = ptl.decoder_stack_fused(stacked_, x_, mem_kv_, self_valid,
                                          mem_valid, H, row_tile=2)
        finally:
            ptl.set_bwd_split(orig)
        return jnp.sum(out * jnp.cos(out))

    g_mono = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
        stacked, x, mem_kv)
    g_split = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(
        stacked, x, mem_kv)
    for a, b in zip(jax.tree.leaves(g_mono), jax.tree.leaves(g_split)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_split_backward_matches_monolithic_encoder(enc_setup):
    stacked, x, valid = enc_setup

    orig = ptl._BWD_SPLIT

    def loss(split, stacked_, x_):
        ptl.set_bwd_split(split)
        try:
            out = ptl.encoder_stack_fused(stacked_, x_, valid, H, row_tile=2)
        finally:
            ptl.set_bwd_split(orig)
        return jnp.sum(out * jnp.cos(out))

    g_mono = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1))(stacked, x)
    g_split = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1))(stacked, x)
    for a, b in zip(jax.tree.leaves(g_mono), jax.tree.leaves(g_split)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG has no CPU-interpret lowering")
def test_dropout_gradient_tile_invariant(setup):
    """With dropout ACTIVE, gradients must be EXACTLY invariant to the
    backward row-tile choice: the per-image dropout masks are seeded by the
    global image index, so any tile decomposition regenerates the masks the
    forward applied (round-4 review: per-TILE masks keyed on the tile index
    and tile shape silently applied DIFFERENT dropout in the two passes
    whenever bt != bt_bwd — the default at flagship shapes — corrupting
    every gradient). Verified on-chip: max|grad(bt_bwd=1)-grad(bt_bwd=4)|
    == 0.0 after the fix. (A finite-difference oracle is NOT usable here:
    fp32 TPU matmul rounding at these magnitudes swamps eps-scale
    differences — the deterministic control read ratio 1.22 against a
    gradient proven exact by the XLA parity tests.)"""
    import os
    stacked, x, memory, self_valid, mem_valid, mem_kv = setup
    rng = jax.random.PRNGKey(7)

    def loss(x_, bt_bwd):
        os.environ["ACAI_FUSED_BT_BWD"] = str(bt_bwd)
        jax.clear_caches()
        ptl._make_fused.cache_clear()
        out = ptl.decoder_stack_fused(stacked, x_, mem_kv, self_valid,
                                      mem_valid, H, dropout_rate=0.3,
                                      rng=rng, deterministic=False)
        return jnp.sum(out * jnp.sin(out))

    try:
        g1 = jax.grad(lambda x_: loss(x_, 1))(x)
        g4 = jax.grad(lambda x_: loss(x_, 4))(x)
    finally:
        os.environ.pop("ACAI_FUSED_BT_BWD", None)
        ptl._make_fused.cache_clear()
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g4))
