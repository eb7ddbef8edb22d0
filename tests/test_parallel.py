"""Mesh/sharding/trainer tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from acai_omr_tpu.models import vitomr
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig
from acai_omr_tpu.parallel import mesh as mesh_lib
from acai_omr_tpu.parallel import sharding, trainer

CFG = ViTOMRConfig(
    encoder=EncoderConfig(patch_size=4, pe_max_height=8, pe_max_width=8,
                          num_layers=4, hidden_dim=16, num_heads=2, mlp_dim=32,
                          dropout=0.0, fine_tune_depth=2),
    decoder=DecoderConfig(max_lmx_seq_len=32, vocab_size=11, num_layers=2,
                          hidden_dim=16, num_heads=2, mlp_dim=32, dropout=0.0),
    transition_head_dim=24, transition_head_dropout=0.0)


def test_mesh_and_param_placement():
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh(4, 2)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)
    sharded = sharding.shard_params(mesh, params)
    # linear1 kernels shard their output dim over model axis
    spec = sharded["decoder"]["blocks"]["linear1"]["kernel"].sharding.spec
    assert spec == P(None, None, mesh_lib.MODEL_AXIS)
    # norms replicate
    spec = sharded["decoder"]["final_norm"]["scale"].sharding.spec
    assert spec == P()
    # vocab-sized unembed (11) doesn't divide 2 -> falls back to replication
    spec = sharded["decoder"]["unembed"]["kernel"].sharding.spec
    assert spec == P()


def test_llrd_scales_structure():
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)
    scales = trainer.encoder_llrd_scales(params, CFG, fine_tune_lr_ratio=0.1,
                                         decay_factor=0.9)
    blk = np.asarray(
        jax.tree.leaves({"k": scales["encoder"]["blocks"]["self_attn"]["in_kernel"]})[0]
    ).reshape(-1)
    # 4 layers, fine_tune_depth=2: layers 0,1 frozen (0), layer 2 = 0.1*0.9,
    # layer 3 (deepest) = 0.1
    np.testing.assert_allclose(blk, [0.0, 0.0, 0.09, 0.1], rtol=1e-6)
    assert scales["decoder"]["unembed"]["kernel"] == 1.0
    assert scales["transition_head"]["linear1"]["kernel"] == 1.0
    assert scales["encoder"]["final_norm"]["scale"] == 0.1
    # projection/PE at min layer scale
    np.testing.assert_allclose(scales["encoder"]["projection"]["kernel"], 0.09)


def test_frozen_layers_do_not_move():
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)
    tx = trainer.adamw(1e-2, weight_decay=0.1, scale_tree_fn=lambda p:
                       trainer.encoder_llrd_scales(p, CFG, 0.1, 0.9))
    state = trainer.create_train_state(params, tx)

    def loss_fn(p, batch, rng):
        s = sum(jnp.sum(x ** 2) for x in jax.tree.leaves(p))
        return s, {}

    step = trainer.make_train_step(loss_fn, tx, donate=False)
    new_state, metrics = step(state, {}, jax.random.PRNGKey(0))

    old_blk = np.asarray(params["encoder"]["blocks"]["self_attn"]["in_kernel"])
    new_blk = np.asarray(new_state.params["encoder"]["blocks"]["self_attn"]["in_kernel"])
    # frozen layers 0-1 identical (incl. no weight decay drift)
    np.testing.assert_array_equal(new_blk[:2], old_blk[:2])
    # fine-tune layers moved
    assert np.abs(new_blk[2:] - old_blk[2:]).max() > 0
    # decoder moved
    assert np.abs(np.asarray(new_state.params["decoder"]["unembed"]["kernel"]) -
                  np.asarray(params["decoder"]["unembed"]["kernel"])).max() > 0


def test_accum_step_matches_single_large_batch():
    """Accumulated microbatch grads == one big batch (linear loss)."""
    key = jax.random.PRNGKey(0)
    params = {"w": jnp.ones((4,))}
    tx = trainer.adamw(1e-1, weight_decay=0.0)

    def loss_fn(p, batch, rng):
        return jnp.mean(jnp.sum(p["w"] * batch["x"], axis=-1)), {}

    x = jax.random.normal(key, (4, 2, 4))  # 4 microbatches of 2
    accum_step = trainer.make_accum_train_step(loss_fn, tx, 4, donate=False)
    s1 = trainer.create_train_state(params, tx)
    s1, m1 = accum_step(s1, {"x": x}, key)

    big_step = trainer.make_train_step(loss_fn, tx, donate=False)
    s2 = trainer.create_train_state(params, tx)
    s2, m2 = big_step(s2, {"x": x.reshape(8, 4)}, key)

    np.testing.assert_allclose(np.asarray(s1.params["w"]),
                               np.asarray(s2.params["w"]), atol=1e-6)


def test_host_grad_accumulation_matches_fused():
    """Host-driven accumulation (sum of window grads, reference semantics)
    across differently-shaped microbatches equals summing grads directly."""
    params = {"w": jnp.ones((4,))}
    tx = trainer.adamw(1e-1, weight_decay=0.0)

    def loss_fn(p, batch, rng):
        return jnp.mean(jnp.sum(p["w"] * batch["x"], axis=-1)), {}

    key = jax.random.PRNGKey(0)
    # two microbatches with DIFFERENT batch sizes (bucket shapes differ)
    mb1 = {"x": jax.random.normal(key, (2, 4))}
    mb2 = {"x": jax.random.normal(jax.random.PRNGKey(1), (5, 4))}

    grad_fn = trainer.make_grad_fn(loss_fn)
    apply_fn = trainer.make_apply_fn(tx)
    # apply_fn donates its state: give each state its own param buffers so
    # the donated first state can't invalidate `params` (shared by the oracle)
    state = trainer.create_train_state(jax.tree.map(jnp.array, params), tx)
    acc = None
    for mb in (mb1, mb2):
        _, g = grad_fn(state.params, mb, key)
        acc = trainer.accumulate_grads(acc, g)
    state = apply_fn(state, acc, jnp.float32(1.0))

    # oracle: grads of the sum of per-microbatch mean losses
    def total_loss(p):
        return (jnp.mean(jnp.sum(p["w"] * mb1["x"], -1))
                + jnp.mean(jnp.sum(p["w"] * mb2["x"], -1)))
    og = jax.grad(total_loss)(params)
    s2 = trainer.create_train_state(jax.tree.map(jnp.array, params), tx)
    s2 = apply_fn(s2, og, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               np.asarray(s2.params["w"]), atol=1e-6)


def test_grad_acc_fn_matches_eager_accumulation():
    """make_grad_acc_fn (donated-accumulator fused add) == grad_fn +
    accumulate_grads, bit for bit, across differently-shaped microbatches."""
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((3,))}

    def loss_fn(p, batch, rng):
        return (jnp.mean(jnp.sum(p["w"] * batch["x"], axis=-1))
                + jnp.sum(p["b"] ** 2)), {}

    key = jax.random.PRNGKey(0)
    mb1 = {"x": jax.random.normal(key, (2, 4))}
    mb2 = {"x": jax.random.normal(jax.random.PRNGKey(1), (5, 4))}
    mb3 = {"x": jax.random.normal(jax.random.PRNGKey(2), (2, 4))}

    grad_fn = trainer.make_grad_fn(loss_fn)
    grad_acc_fn = trainer.make_grad_acc_fn(loss_fn)

    acc = None
    for mb in (mb1, mb2, mb3):
        _, g = grad_fn(params, mb, key)
        acc = trainer.accumulate_grads(acc, g)

    _, fused = grad_fn(params, mb1, key)
    for mb in (mb2, mb3):
        _, fused = grad_acc_fn(params, mb, key, fused)

    for a, b in zip(jax.tree.leaves(acc), jax.tree.leaves(fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_step_matches_host_driven_window():
    """make_window_step_fn (one jit: scan microbatches + apply) produces the
    same parameters as the host-driven grad_fn/accumulate/apply window when
    given the same per-microbatch rng keys."""
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((3,))}
    tx = trainer.adamw(1e-1, weight_decay=0.0)
    accum = 3

    def loss_fn(p, batch, rng):
        noise = jax.random.normal(rng, ())
        return (jnp.mean(jnp.sum(p["w"] * batch["x"], axis=-1))
                + jnp.sum(p["b"] ** 2) + 0.01 * noise * jnp.sum(p["w"])), {}

    mbs = [{"x": jax.random.normal(jax.random.PRNGKey(i), (2, 4))}
           for i in range(accum)]
    key = jax.random.PRNGKey(7)
    sks = jax.random.split(key, accum)

    # host-driven oracle window with the same keys
    grad_fn = trainer.make_grad_fn(loss_fn)
    apply_fn = trainer.make_apply_fn(tx)
    s1 = trainer.create_train_state(jax.tree.map(jnp.array, params), tx)
    acc = None
    for mb, sk in zip(mbs, sks):
        _, g = grad_fn(s1.params, mb, sk)
        acc = trainer.accumulate_grads(acc, g)
    s1 = apply_fn(s1, acc, jnp.float32(1.0))

    window_fn = trainer.make_window_step_fn(loss_fn, tx, accum)
    s2 = trainer.create_train_state(jax.tree.map(jnp.array, params), tx)
    s2, losses = window_fn(s2, trainer.stack_microbatches(mbs), key,
                           jnp.float32(1.0))

    assert losses.shape == (accum,)
    assert int(s2.step) == 1
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-6)


def test_sharded_grad_fn_matches_single_device():
    """shard_map DP grads (exact sum/weight reduction) == single-device grads
    of the masked-mean loss, with uneven valid-token counts across shards."""
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import mesh as mesh_lib
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=32,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    b, l_img, t = 8, 12, 10
    rng = np.random.default_rng(0)
    # ragged valid-token counts so per-shard means would NOT average to the
    # global mean — the exact sum/weight reduction must still match
    lmx_valid = np.arange(t)[None, :] < rng.integers(3, t, size=(b, 1))
    targets = rng.integers(3, tok.vocab_size, size=(b, t)).astype(np.int32)
    targets[~lmx_valid] = tok.pad_idx
    batch = {
        "patches": jnp.asarray(rng.random((b, l_img, 256), np.float32)),
        "pe_idx": jnp.asarray(rng.integers(0, 48, size=(b, l_img, 4)), jnp.int32),
        "pe_w": jnp.asarray(rng.random((b, l_img, 4), np.float32)),
        "valid": jnp.ones((b, l_img), bool),
        "inputs": jnp.asarray(rng.integers(3, tok.vocab_size, size=(b, t)), jnp.int32),
        "targets": jnp.asarray(targets),
        "lmx_valid": jnp.asarray(lmx_valid),
        # tf_prob=1 -> no gumbel mixing -> the step is rng-independent, so
        # the per-shard rng fold cannot perturb the comparison
        "tf_prob": jnp.float32(1.0),
        "tau": jnp.float32(1.0),
    }

    ref_fn = trainer.make_grad_fn(tf_train.make_loss_fn(
        cfg, {"use_hard_sampling": False}, jnp.float32))
    ref_loss, ref_grads = ref_fn(params, batch, jax.random.PRNGKey(5))

    mesh = mesh_lib.make_mesh(8, 1)
    dp_fn = trainer.make_sharded_grad_fn(tf_train.make_sum_loss_fn(
        cfg, {"use_hard_sampling": False}, jnp.float32), mesh)
    dp_loss, dp_grads = dp_fn(params, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(dp_grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# pipeline parallelism
# ---------------------------------------------------------------------------

def _pp_batch(cfg, b=8, t=12, m=10):
    from acai_omr_tpu.models import omr_decoder
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
    seqs_in = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                 cfg.vocab_size)
    seqs_tgt = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0,
                                  cfg.vocab_size)
    lens = jnp.asarray([t, t - 2, t, t - 4, t, t, t - 1, t])[:b]
    lmx_valid = jnp.arange(t)[None] < lens[:, None]
    latent = jax.random.normal(jax.random.PRNGKey(3), (b, m, cfg.hidden_dim))
    latent_valid = jnp.ones((b, m), bool)
    return params, (seqs_in, seqs_tgt, lmx_valid, latent, latent_valid)


def test_pipeline_grads_match_unpipelined():
    """DP=2 x PP=4 pipelined teacher-forced loss AND grads == the
    single-device forward (jax.grad pipelines the backward through the
    ppermute transposes)."""
    from acai_omr_tpu.models import omr_decoder
    from acai_omr_tpu.parallel import pipeline

    cfg = DecoderConfig(max_lmx_seq_len=32, vocab_size=31, num_layers=4,
                        hidden_dim=32, num_heads=4, mlp_dim=48, dropout=0.0,
                        pad_idx=1, bos_idx=0, eos_idx=2)
    params, batch = _pp_batch(cfg)
    seqs_in, seqs_tgt, lmx_valid, latent, latent_valid = batch

    def ref_loss(p):
        logits = omr_decoder.forward(p, cfg, seqs_in, latent, lmx_valid,
                                     latent_valid,
                                     compute_dtype=jnp.float32)
        s, n = vitomr.omr_ce_loss(logits, seqs_tgt, cfg.pad_idx, 0.0, "sum")
        return s / jnp.maximum(n, 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

    mesh = mesh_lib.make_mesh(2, 4)  # (data, stage)
    pp = pipeline.stage_params(params, cfg, mesh, mesh_lib.MODEL_AXIS)
    grad_fn = pipeline.make_pp_grad_fn(
        cfg, mesh, stage_axis=mesh_lib.MODEL_AXIS,
        data_axis=mesh_lib.DATA_AXIS, n_micro=2)
    pl, pg = grad_fn(pp, batch)

    np.testing.assert_allclose(float(pl), float(ref_l), atol=1e-5)
    err = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                       ref_g, pipeline.unstage_params(pg))
    assert max(jax.tree.leaves(err)) < 1e-5


def test_pipeline_train_step_reduces_loss():
    """A few pipelined optimizer steps reduce the CE loss; params stay
    stage-sharded throughout."""
    import optax
    from acai_omr_tpu.parallel import pipeline

    cfg = DecoderConfig(max_lmx_seq_len=32, vocab_size=31, num_layers=4,
                        hidden_dim=32, num_heads=4, mlp_dim=48, dropout=0.0,
                        pad_idx=1, bos_idx=0, eos_idx=2)
    params, batch = _pp_batch(cfg)
    mesh = mesh_lib.make_mesh(2, 4)  # (data, stage)
    pp = pipeline.stage_params(params, cfg, mesh, mesh_lib.MODEL_AXIS)
    tx = optax.adam(1e-3)
    state = trainer.TrainState(jnp.int32(0), pp, tx.init(pp))
    step = pipeline.make_pp_train_step(
        cfg, tx, mesh, stage_axis=mesh_lib.MODEL_AXIS,
        data_axis=mesh_lib.DATA_AXIS, n_micro=2, donate=False)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    spec = state.params["blocks"]["linear1"]["kernel"].sharding.spec
    assert spec[0] == mesh_lib.MODEL_AXIS


def test_sequence_parallel_constraint_is_exact():
    """Megatron-SP activation sharding (sequence over the model axis between
    TP regions) is a pure GSPMD hint: loss and grads match the
    unconstrained DP x TP step."""
    from acai_omr_tpu.ops import nn
    from jax.sharding import NamedSharding

    mesh = mesh_lib.make_mesh(4, 2)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)
    params_s = sharding.shard_params(mesh, params)

    rng = np.random.default_rng(0)
    b, l_img, t = 8, 16, 8
    batch = dict(
        patches=jnp.asarray(rng.random((b, l_img, 16), dtype=np.float32)),
        pe_idx=jnp.asarray(rng.integers(0, 64, (b, l_img, 4)), dtype=jnp.int32),
        pe_w=jnp.asarray(rng.random((b, l_img, 4), dtype=np.float32)),
        valid=jnp.ones((b, l_img), bool),
        inputs=jnp.asarray(rng.integers(3, 11, (b, t)), dtype=jnp.int32),
        targets=jnp.asarray(rng.integers(3, 11, (b, t)), dtype=jnp.int32),
        lmx_valid=jnp.ones((b, t), bool))
    dsh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    batch = jax.tree.map(lambda x: jax.device_put(x, dsh), batch)

    def loss(p, batch):
        logits = vitomr.forward_teacher_forced(
            p, CFG, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["inputs"], batch["lmx_valid"],
            compute_dtype=jnp.float32)
        return vitomr.omr_ce_loss(logits, batch["targets"],
                                  CFG.decoder.pad_idx)

    l0, g0 = jax.jit(jax.value_and_grad(loss))(params_s, batch)
    with nn.activation_sharding(sharding.sequence_parallel(mesh)):
        l1, g1 = jax.jit(jax.value_and_grad(loss))(params_s, batch)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), g0, g1)))
    assert err < 1e-5, err


def test_activation_sharding_skipped_under_shard_map():
    """The GSPMD activation-sharding hook must be a no-op inside shard_map
    bodies (manual axes reject with_sharding_constraint): a DP sharded grad
    fn traced with the hook active must run and match the unhooked one.
    Regression: this used to raise ValueError whenever the fused kernels
    were gated off (always on CPU)."""
    from acai_omr_tpu.ops import nn

    mesh = mesh_lib.make_mesh(4, 2)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)

    rng = np.random.default_rng(1)
    b, l_img, t = 8, 16, 8
    batch = dict(
        patches=jnp.asarray(rng.random((b, l_img, 16), dtype=np.float32)),
        pe_idx=jnp.asarray(rng.integers(0, 64, (b, l_img, 4)), dtype=jnp.int32),
        pe_w=jnp.asarray(rng.random((b, l_img, 4), dtype=np.float32)),
        valid=jnp.ones((b, l_img), bool),
        inputs=jnp.asarray(rng.integers(3, 11, (b, t)), dtype=jnp.int32),
        targets=jnp.asarray(rng.integers(3, 11, (b, t)), dtype=jnp.int32),
        lmx_valid=jnp.ones((b, t), bool))

    def sum_loss(p, batch, rng):
        logits = vitomr.forward_teacher_forced(
            p, CFG, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["inputs"], batch["lmx_valid"],
            compute_dtype=jnp.float32)
        return vitomr.omr_ce_loss(logits, batch["targets"],
                                  CFG.decoder.pad_idx, reduction="sum")

    ref_loss, ref_grads = trainer.make_sharded_grad_fn(sum_loss, mesh)(
        params, batch, jax.random.PRNGKey(2))
    with nn.activation_sharding(sharding.sequence_parallel(mesh)):
        loss, grads = trainer.make_sharded_grad_fn(sum_loss, mesh)(
            params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), ref_grads, grads)))
    assert err < 1e-6, err


def test_sharded_grad_fn_all_padding_batch_no_nan():
    """A globally all-padding batch must produce zero loss and FINITE (zero)
    grads through the exact sum/weight DP reduction (regression: grads
    divided by the raw global weight 0 -> NaN)."""
    mesh = mesh_lib.make_mesh(8, 1)
    params = vitomr.init_vitomr_params(jax.random.PRNGKey(0), CFG)

    rng = np.random.default_rng(2)
    b, l_img, t = 8, 16, 8
    pad = CFG.decoder.pad_idx
    batch = dict(
        patches=jnp.asarray(rng.random((b, l_img, 16), dtype=np.float32)),
        pe_idx=jnp.asarray(rng.integers(0, 64, (b, l_img, 4)), dtype=jnp.int32),
        pe_w=jnp.asarray(rng.random((b, l_img, 4), dtype=np.float32)),
        valid=jnp.ones((b, l_img), bool),
        inputs=jnp.full((b, t), pad, dtype=jnp.int32),
        targets=jnp.full((b, t), pad, dtype=jnp.int32),
        lmx_valid=jnp.zeros((b, t), bool))

    def sum_loss(p, batch, rng):
        logits = vitomr.forward_teacher_forced(
            p, CFG, batch["patches"], batch["pe_idx"], batch["pe_w"],
            batch["valid"], batch["inputs"], batch["lmx_valid"],
            compute_dtype=jnp.float32)
        return vitomr.omr_ce_loss(logits, batch["targets"], pad,
                                  reduction="sum")

    loss, grads = trainer.make_sharded_grad_fn(sum_loss, mesh)(
        params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)) and float(loss) == 0.0
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
