"""GRPO reward math (hand-computed expectations), objective, curriculum, and a
tiny end-to-end grpo_update smoke test (reference patterns:
tests/test_omr_grpo_train.py parametrized reward tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acai_omr_tpu.train import grpo_rewards as R
from acai_omr_tpu.train import omr_grpo_train as G

PAD = 1


def test_token_f1_hand_computed():
    rollouts = np.array([[0, 5, 6, 7, 2, PAD],
                         [0, 5, 9, 2, PAD, PAD]])
    targets = np.array([[0, 5, 6, 7, 2, PAD],
                        [0, 5, 6, 7, 2, PAD]])
    f1 = R.calc_token_f1(rollouts, targets, PAD)
    np.testing.assert_allclose(f1[0], 1.0, atol=1e-6)
    # row 1: preds 4 non-pad, targets 5 non-pad, position-matches: 0,5,eos@3? t[3]=7 vs r[3]=2 no
    # matches at positions 0 (0==0), 1 (5==5) -> tp=2
    p, r = 2 / 4, 2 / 5
    np.testing.assert_allclose(f1[1], 2 * p * r / (p + r + 1e-8), atol=1e-5)


def test_repeat_penalty_non_overlapping():
    # perfect 2-gram loop: [5,6,5,6,5,6] -> 2 adjacent equal 2-grams of 2 opportunities
    rollouts = np.array([[5, 6, 5, 6, 5, 6]])
    pen2 = R._n_gram_penalty(rollouts, 2, PAD)
    np.testing.assert_allclose(pen2, [1.0], atol=1e-6)
    # pad-containing windows are excluded from numerator AND denominator
    # (reference formula: opportunities = non-pad adjacent windows)
    rollouts = np.array([[5, 6, 5, 6, PAD, PAD]])
    pen2 = R._n_gram_penalty(rollouts, 2, PAD)
    np.testing.assert_allclose(pen2, [1.0], atol=1e-6)  # 1 repeat / 1 opportunity
    # 1-gram repeats
    rollouts = np.array([[5, 5, 5, 2, PAD, PAD]])
    pen1 = R._n_gram_penalty(rollouts, 1, PAD)
    np.testing.assert_allclose(pen1, [2 / 3], atol=1e-5)


def test_len_penalty_threshold_and_clip():
    mask = np.ones((3, 100), dtype=bool)
    mask[0, 50:] = False   # len 50
    mask[1, 56:] = False   # len 56
    mask[2, :] = True      # len 100
    targets = np.full((3, 52), 5)
    # delta=10: |50-52|=2 < 10 -> 0; |56-52|=4 -> 0; |100-52|=48 -> exp(ln2/50*48)-1
    pen = R.calc_len_penalty(mask, targets, PAD, delta=10, tau=50)
    np.testing.assert_allclose(pen[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(pen[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(pen[2], np.exp(np.log(2) / 50 * 48) - 1, rtol=1e-5)
    # clipped at 1.0
    mask2 = np.ones((1, 300), dtype=bool)
    pen = R.calc_len_penalty(mask2, np.full((1, 10), 5), PAD, delta=5, tau=50)
    np.testing.assert_allclose(pen, [1.0])


def test_wellformedness():
    cat = np.array([False, False, True])
    minor = np.array([0.0, 4.0, 0.0])
    w = R.calc_wellformedness(cat, minor, gamma=3.0, alpha_w=0.25)
    np.testing.assert_allclose(w, [1.0, np.exp(-1.0), -3.0], rtol=1e-6)


def test_group_advantages_normalization():
    rewards = np.array([[1.0, 2.0, 3.0, 4.0]])
    adv = R.group_advantages(rewards)
    assert adv.shape == (4,)
    np.testing.assert_allclose(adv.mean(), 0.0, atol=1e-6)
    # Bessel-corrected std (torch .std default)
    np.testing.assert_allclose(adv, (rewards[0] - 2.5) / (rewards.std(ddof=1) + 1e-8))


def test_grpo_objective_hand_computed():
    """Exact expected ratios with ragged rollouts (reference test pattern:
    test_omr_grpo_train.py:154-187)."""
    V = 5
    rollouts = jnp.asarray([[0, 3, 2, PAD], [0, 4, 3, 2]])
    # rollout lens 3, 4 -> input lens 2, 3
    input_valid = jnp.asarray([[True, True, False], [True, True, True]])
    # theta logits deterministic: uniform -> log prob = -log(V)
    theta_logits = jnp.zeros((2, 3, V))
    old_lp = jnp.full((2, 4), -np.log(V))
    adv = jnp.asarray([1.0, -1.0])
    obj = G.calc_grpo_objective(theta_logits, rollouts, input_valid, old_lp,
                                adv, epsilon=0.2, num_groups=2)
    # ratios all exactly 1 -> unclipped = clipped = adv; per-rollout mean = adv
    # mean over groups = (1 + -1)/2 = 0
    np.testing.assert_allclose(float(obj), 0.0, atol=1e-6)

    # advantage positive, theta more confident than old -> ratio clipped at 1.2
    logits2 = jnp.full((1, 1, V), 0.0).at[0, 0, 3].set(10.0)
    roll2 = jnp.asarray([[0, 3]])
    valid2 = jnp.asarray([[True]])
    old2 = jnp.full((1, 2), -np.log(V))
    obj2 = G.calc_grpo_objective(logits2, roll2, valid2, old2,
                                 jnp.asarray([1.0]), 0.2, 1)
    np.testing.assert_allclose(float(obj2), 1.2, rtol=1e-4)


def test_entropy_bonus_uniform_is_one():
    logits = jnp.zeros((2, 3, 7))
    valid = jnp.ones((2, 3), dtype=bool)
    bonus = G.calc_entropy_bonus(logits, valid, 7)
    np.testing.assert_allclose(float(bonus), 1.0, rtol=1e-5)


def test_curriculum_scheduler():
    import copy
    cfg = R.GRPOConfig(copy.deepcopy(G.INITIAL_ROLLOUT_CONFIG),
                       copy.deepcopy(G.INITIAL_REWARD_CONFIG),
                       copy.deepcopy(G.INITIAL_LOSS_CONFIG),
                       copy.deepcopy(G.INITIAL_UPDATE_CONFIG), 100, 100)
    sched = G.CurriculumScheduler(cfg, exploration_steps=2, total_steps=12)
    for _ in range(2):
        sched.step()
    assert cfg.rollout_config.max_actions == 768  # unchanged in exploration
    for _ in range(11):  # progress hits 1.0 at step_count == total_steps
        sched.step()
    assert cfg.rollout_config.max_actions == G.MAX_MAX_ACTIONS
    assert cfg.rollout_config.top_k == G.MIN_TOP_K
    np.testing.assert_allclose(cfg.rollout_config.temperature, G.MIN_TEMPERATURE)
    np.testing.assert_allclose(cfg.loss_config.lambda_ce, G.MIN_LAMBDA_CE)


def test_curriculum_scheduler_clamps_past_horizon():
    """Steps past the anneal horizon hold the FINAL values (round-4 advisor
    finding: unclamped progress p>1 annealed lambda_ce below its 0.01 floor
    — sign-flipping the CE term into gradient ascent around p~1.12 — and
    entropy_beta negative)."""
    import copy
    cfg = R.GRPOConfig(copy.deepcopy(G.INITIAL_ROLLOUT_CONFIG),
                       copy.deepcopy(G.INITIAL_REWARD_CONFIG),
                       copy.deepcopy(G.INITIAL_LOSS_CONFIG),
                       copy.deepcopy(G.INITIAL_UPDATE_CONFIG), 100, 100)
    sched = G.CurriculumScheduler(cfg, exploration_steps=2, total_steps=12)
    for _ in range(40):  # 3x past the horizon
        sched.step()
    np.testing.assert_allclose(cfg.loss_config.lambda_ce, G.MIN_LAMBDA_CE)
    np.testing.assert_allclose(cfg.loss_config.entropy_beta,
                               G.MIN_ENTROPY_BETA)
    # the failure mode was SIGN-level (lambda_ce < 0 => gradient ascent on
    # CE); the clamp holds both at their floors modulo fp round-off
    assert cfg.loss_config.lambda_ce > 0.5 * G.MIN_LAMBDA_CE
    assert cfg.loss_config.entropy_beta >= 0.0
    assert cfg.rollout_config.max_actions == G.MAX_MAX_ACTIONS
    assert cfg.rollout_config.top_k == G.MIN_TOP_K


def test_prepare_rollouts_right_shift():
    rollouts = np.array([[0, 5, 2, PAD, PAD], [0, 5, 6, 7, 2]])
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)
    inputs, valid = G.prepare_rollouts_for_policy_theta(rollouts, mask, PAD)
    np.testing.assert_array_equal(inputs, [[0, 5, PAD, PAD], [0, 5, 6, 7]])
    np.testing.assert_array_equal(valid, [[1, 1, 0, 0], [1, 1, 1, 1]])


def test_grpo_update_smoke(rng):
    """End-to-end outer step on a tiny model with real TEDn rewards."""
    import copy
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter rest quarter"
    xml, _ = delinearize(lmx)
    img = rng.random((1, 48, 64), dtype=np.float32)
    examples = [(img, tok.encode(lmx), xml)] * 2

    grpo_config = R.GRPOConfig(
        rollout_config=R.RolloutConfig(group_size=2, max_actions=16, top_k=5,
                                       temperature=1.1),
        reward_config=copy.deepcopy(G.INITIAL_REWARD_CONFIG),
        loss_config=copy.deepcopy(G.INITIAL_LOSS_CONFIG),
        update_config=R.UpdateConfig(epsilon=0.2, update_epochs=2,
                                     max_grad_norm=1.0),
        mini_validation_freq=10, checkpoint_freq=10)

    tx = trainer.adamw(1e-4, weight_decay=0.0, max_grad_norm=1.0,
                       scale_tree_fn=G.grpo_frozen_scales)
    state = trainer.create_train_state(params, tx)
    update_step = G.make_grpo_update_step(cfg, tx, 2, 0.2, jnp.float32)

    new_state, metrics = G.grpo_update(
        state.params, state, update_step, cfg, grpo_config, examples, tok,
        jax.random.PRNGKey(1), compute_dtype=jnp.float32, reward_workers=2)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["reward"])
    # encoder frozen: unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state.params["encoder"]["projection"]["kernel"]),
        np.asarray(params["encoder"]["projection"]["kernel"]))
    # decoder moved
    assert np.abs(np.asarray(new_state.params["decoder"]["unembed"]["kernel"]) -
                  np.asarray(params["decoder"]["unembed"]["kernel"])).max() > 0


def test_grpo_update_mesh_rollouts_smoke(rng):
    """grpo_update with a mesh: rollout decode shards over the 8 virtual
    devices (sharded_generate) and the step still trains."""
    import copy
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import mesh as mesh_lib
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter rest quarter"
    xml, _ = delinearize(lmx)
    img = rng.random((1, 48, 64), dtype=np.float32)
    examples = [(img, tok.encode(lmx), xml)] * 8  # one image group per device

    grpo_config = R.GRPOConfig(
        rollout_config=R.RolloutConfig(group_size=2, max_actions=16, top_k=5,
                                       temperature=1.1),
        reward_config=copy.deepcopy(G.INITIAL_REWARD_CONFIG),
        loss_config=copy.deepcopy(G.INITIAL_LOSS_CONFIG),
        update_config=R.UpdateConfig(epsilon=0.2, update_epochs=1,
                                     max_grad_norm=1.0),
        mini_validation_freq=10, checkpoint_freq=10)

    tx = trainer.adamw(1e-4, weight_decay=0.0, max_grad_norm=1.0,
                       scale_tree_fn=G.grpo_frozen_scales)
    state = trainer.create_train_state(params, tx)
    update_step = G.make_grpo_update_step(cfg, tx, 8, 0.2, jnp.float32)

    new_state, metrics = G.grpo_update(
        state.params, state, update_step, cfg, grpo_config, examples, tok,
        jax.random.PRNGKey(1), compute_dtype=jnp.float32, reward_workers=2,
        mesh=mesh_lib.make_mesh(8, 1))
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["reward"])


def test_grpo_update_encode_ahead_exact(rng):
    """The encode-ahead chain (next_examples -> preencoded) produces a
    bit-identical update to encoding inside the step: the encoder +
    transition head are frozen (grpo_frozen_scales), so batch N+1's latents
    dispatched during batch N are update-invariant."""
    import copy
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter rest quarter"
    xml, _ = delinearize(lmx)
    img = rng.random((1, 48, 64), dtype=np.float32)
    examples = [(img, tok.encode(lmx), xml)] * 2

    grpo_config = R.GRPOConfig(
        rollout_config=R.RolloutConfig(group_size=2, max_actions=16, top_k=5,
                                       temperature=1.1),
        reward_config=copy.deepcopy(G.INITIAL_REWARD_CONFIG),
        loss_config=copy.deepcopy(G.INITIAL_LOSS_CONFIG),
        update_config=R.UpdateConfig(epsilon=0.2, update_epochs=1,
                                     max_grad_norm=1.0),
        mini_validation_freq=10, checkpoint_freq=10)

    tx = trainer.adamw(1e-4, weight_decay=0.0, max_grad_norm=1.0,
                       scale_tree_fn=G.grpo_frozen_scales)
    update_step = G.make_grpo_update_step(cfg, tx, 2, 0.2, jnp.float32)

    def run(preencode: bool):
        state = trainer.create_train_state(params, tx)
        pre = None
        if preencode:
            # what the epoch loop's previous iteration would have dispatched
            # (same frozen params, same batchify)
            pre = G._encode_examples(state.params, cfg, examples, jnp.float32)
        new_state, metrics = G.grpo_update(
            state.params, state, update_step, cfg, grpo_config, examples,
            tok, jax.random.PRNGKey(1), compute_dtype=jnp.float32,
            reward_workers=2, preencoded=pre,
            next_examples=examples)
        assert metrics["preencoded_next"] is not None
        assert "phase_times" in metrics
        return new_state

    a = run(False)
    b = run(True)
    for ka, kb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))


def test_grpo_update_trains_cross_kv_weights(rng):
    """The cross-attention K/V projection weights must receive gradient from
    the GRPO objective itself, not only from the CE anchor — the per-layer
    K/V precompute has to sit INSIDE the differentiated chunk loss
    (regression: a step-level precompute passed the K/V in as data, silently
    zeroing their GRPO gradient; reference trains them like any decoder
    weight, models.py:840-1049)."""
    import optax
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-3, weight_decay=0.0)
    state = trainer.create_train_state(params, tx)
    step = G.make_grpo_update_step(cfg, tx, num_groups=2, epsilon=0.2,
                                   compute_dtype=jnp.float32,
                                   rollout_microbatches=2)
    r, t, bu, m, e = 4, 8, 2, 4, cfg.decoder.hidden_dim
    batch = {
        "rollouts": jnp.asarray(rng.integers(3, 20, (r, t + 1)), jnp.int32),
        "rollout_inputs": jnp.asarray(rng.integers(3, 20, (r, t)), jnp.int32),
        "rollout_input_valid": jnp.ones((r, t), bool),
        "old_log_probs": jnp.asarray(-rng.random((r, t + 1), np.float32)),
        "advantages": jnp.asarray(rng.standard_normal(r), jnp.float32),
        "img_latent": jnp.asarray(rng.standard_normal((bu, m, e)), jnp.float32),
        "latent_valid": jnp.ones((bu, m), bool),
        "entropy_beta": jnp.float32(0.0),
        "lambda_ce": jnp.float32(0.0),
        # NOTE: no gold_* keys -> no CE anchor; any K/V movement must come
        # from the GRPO objective
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    old_kv = np.asarray(params["decoder"]["blocks"]["cross_attn"]["in_kernel"])[:, :, e:]
    new_kv = np.asarray(
        new_state.params["decoder"]["blocks"]["cross_attn"]["in_kernel"])[:, :, e:]
    assert np.abs(new_kv - old_kv).max() > 0


def test_mini_validate_smoke(rng):
    import copy
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=6, pe_max_width=8,
                              num_layers=2, hidden_dim=16, num_heads=2,
                              mlp_dim=24, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=16,
                                             num_heads=2, mlp_dim=24,
                                             dropout=0.0),
        transition_head_dim=24, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter rest quarter"
    xml, _ = delinearize(lmx)
    dataset = [(rng.random((1, 48, 64), dtype=np.float32), tok.encode(lmx), xml)
               for _ in range(3)]
    grpo_config = R.GRPOConfig(
        rollout_config=R.RolloutConfig(group_size=1, max_actions=12, top_k=5,
                                       temperature=1.0),
        reward_config=G.INITIAL_REWARD_CONFIG,
        loss_config=G.INITIAL_LOSS_CONFIG,
        update_config=G.INITIAL_UPDATE_CONFIG,
        mini_validation_freq=1, checkpoint_freq=10)
    out = G.mini_validate(params, cfg, grpo_config, dataset, tok,
                          jax.random.PRNGKey(0), batch_size=2, max_examples=3,
                          compute_dtype=jnp.float32, reward_workers=2)
    assert np.isfinite(out["reward"]) and np.isfinite(out["ce_loss"])
    assert out["components"] is not None


def test_grouped_cross_attention_matches_expanded(rng):
    """cross_group=G with unique memory rows == expanded (repeat) memories:
    the GRPO update's grouped cross-attention is output-identical while
    projecting 1/G the K/V (reference latent expansion: models.py:883-891)."""
    from acai_omr_tpu.ops import transformer as T
    from acai_omr_tpu.models import omr_decoder
    from acai_omr_tpu.models.omr_decoder import DecoderConfig

    cfg = DecoderConfig(max_lmx_seq_len=16, vocab_size=11, num_layers=2,
                        hidden_dim=16, num_heads=2, mlp_dim=24, dropout=0.0,
                        pad_idx=1, bos_idx=0, eos_idx=2)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(5), cfg)
    u, g, t, m = 2, 3, 8, 12
    seqs = jnp.asarray(rng.integers(3, 11, (u * g, t)), jnp.int32)
    uniq_mem = jnp.asarray(rng.standard_normal((u, m, 16)), jnp.float32)
    uniq_valid = jnp.asarray(rng.random((u, m)) > 0.2)
    lmx_valid = jnp.asarray(rng.random((u * g, t)) > 0.2)

    base = omr_decoder.forward(params, cfg, seqs, jnp.repeat(uniq_mem, g, 0),
                               lmx_valid, jnp.repeat(uniq_valid, g, 0))
    grouped = omr_decoder.forward(params, cfg, seqs, uniq_mem, lmx_valid,
                                  uniq_valid, cross_group=g)
    np.testing.assert_allclose(np.asarray(base), np.asarray(grouped),
                               atol=1e-6, rtol=1e-6)
    mkv = T.precompute_memory_kv(params["blocks"], uniq_mem)
    g2 = omr_decoder.forward(params, cfg, seqs, uniq_mem, lmx_valid,
                             uniq_valid, cross_group=g, mem_kv=mkv, remat=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(g2),
                               atol=2e-5, rtol=1e-5)


def test_grpo_sharded_update_step_matches_single(rng):
    """make_grpo_update_step(mesh=...) — rollouts sharded over 8 virtual
    devices with exact psum reduction — must produce the same updated params
    as the single-device step."""
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.parallel import mesh as mesh_lib
    from acai_omr_tpu.parallel import trainer

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

    bg, g, t, m_len = 8, 2, 8, 6
    r = bg * g
    e = cfg.decoder.hidden_dim
    pad = tok.pad_idx
    rollouts = rng.integers(3, tok.vocab_size, size=(r, t)).astype(np.int32)
    rollouts[:, 0] = tok.bos_idx
    valid = np.arange(t)[None, :] < rng.integers(4, t + 1, size=(r, 1))
    rollouts[~valid] = pad
    inputs, input_valid = G.prepare_rollouts_for_policy_theta(
        rollouts, valid, pad)
    gold = rng.integers(3, tok.vocab_size, size=(bg, t)).astype(np.int32)
    gold_in = np.concatenate(
        [np.full((bg, 1), tok.bos_idx, np.int32), gold[:, :-1]], axis=1)
    batch = {
        "rollouts": jnp.asarray(rollouts),
        "rollout_inputs": jnp.asarray(inputs),
        "rollout_input_valid": jnp.asarray(input_valid),
        "old_log_probs": jnp.asarray(-rng.random((r, t), np.float32)),
        "advantages": jnp.asarray(rng.standard_normal(r).astype(np.float32)),
        "img_latent": jnp.asarray(rng.standard_normal((bg, m_len, e)).astype(np.float32)),
        "latent_valid": jnp.ones((bg, m_len), bool),
        "entropy_beta": jnp.float32(0.01),
        "lambda_ce": jnp.float32(0.5),
        "gold_inputs": jnp.asarray(gold_in),
        "gold_targets": jnp.asarray(gold),
        "gold_input_valid": jnp.ones((bg, t), bool),
        "unexpanded_img_latent": jnp.asarray(rng.standard_normal((bg, m_len, e)).astype(np.float32)),
        "unexpanded_latent_valid": jnp.ones((bg, m_len), bool),
    }

    # SGD: the update is linear in the grads, so the comparison measures the
    # gradients themselves (AdamW's g/sqrt(v) would amplify benign fp
    # reassociation noise from the different chunking order into sign flips
    # on near-zero grads)
    import optax
    tx = optax.sgd(1e-2)
    key = jax.random.PRNGKey(7)

    s1 = trainer.create_train_state(params, tx)
    step1 = G.make_grpo_update_step(cfg, tx, bg, 0.2, jnp.float32)
    s1, m1 = step1(s1, batch, key)

    s8 = trainer.create_train_state(params, tx)
    step8 = G.make_grpo_update_step(cfg, tx, bg, 0.2, jnp.float32,
                                    mesh=mesh_lib.make_mesh(8, 1))
    s8, m8 = step8(s8, batch, key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m8["ce_loss"]), float(m1["ce_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m8["grad_norm"]), float(m1["grad_norm"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


def test_group_advantages_single_rollout_group_no_nan():
    """group_size=1 has no relative signal — advantages must be exactly
    zero, not NaN from the Bessel-corrected std of one sample."""
    from acai_omr_tpu.train.grpo_rewards import group_advantages

    adv = group_advantages(np.array([[3.0], [5.0]]))
    assert adv.shape == (2,)
    assert np.all(adv == 0.0), adv


def test_curriculum_static_knobs_quantized():
    """max_actions/top_k/temperature are JIT-static (buffer shapes /
    SamplingConfig): the anneal must take few distinct values, not one per
    step, or every GRPO step recompiles the rollout decode + update step."""
    import copy
    from acai_omr_tpu.train import omr_grpo_train as grpo
    from acai_omr_tpu.train.grpo_rewards import (GRPOConfig, LossConfig,
                                                 RolloutConfig, UpdateConfig)

    cfgobj = GRPOConfig(
        rollout_config=RolloutConfig(group_size=4, max_actions=768,
                                     top_k=50, temperature=1.1),
        reward_config=copy.deepcopy(grpo.INITIAL_REWARD_CONFIG),
        loss_config=LossConfig(entropy_beta=0.05, lambda_ce=0.1),
        update_config=UpdateConfig(epsilon=0.2, update_epochs=2,
                                   max_grad_norm=1.0),
        mini_validation_freq=100, checkpoint_freq=100)
    cur = grpo.CurriculumScheduler(cfgobj, exploration_steps=0,
                                   total_steps=200)
    seen = set()
    for _ in range(200):
        cur.step()
        rc = cfgobj.rollout_config
        seen.add((rc.max_actions, rc.top_k, round(rc.temperature, 6)))
    assert len(seen) <= grpo.CurriculumScheduler.STATIC_LEVELS + 1, len(seen)
