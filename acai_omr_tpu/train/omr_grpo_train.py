"""GRPO RL fine-tuning (stage 3 of 3).

Capability parity with the reference GRPO trainer (reference:
acai_omr/train/omr_grpo_train.py:1-630): group-relative policy optimization
over KV-cached sampled rollouts with the composite LMX reward, PPO-style
clipped objective + entropy bonus + teacher-forced CE anchor, curriculum
schedule over rollout/loss hyperparameters, frozen encoder + transition head.

TPU-first differences:
* "old policy" is simply the parameter snapshot used for the rollout — no
  module deep-copies (reference:571-576, 425-426);
* rollouts run in the compiled decode while-loop; rewards run on the host
  C++ TEDn kernel thread pool. The phases are inherently sequential per
  batch (update needs advantages <- rewards <- rollouts, and the NEXT
  rollout needs the updated policy), but the NEXT batch's encoder pass —
  update-invariant because GRPO freezes the encoder + transition head — is
  dispatched before reward scoring starts, so the device crunches
  encode(N+1) while the host scores batch N (encode-ahead; measured
  breakdown in tools/grpo_outer_bench.py / docs/PERF.md);
* the inner update is one jitted step with per-layer remat (the reference's
  checkpoint_sequential, models.py:470-478).
"""

from __future__ import annotations

import functools
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.tokenizer import LmxTokenizer
from ..models import omr_decoder, vitomr as vitomr_lib
from ..models.vitomr import ViTOMRConfig
from ..ops import transformer
from ..parallel import trainer
from ..utils import checkpoint as ckpt_lib
from ..utils.metrics import MetricsWriter
from .grpo_rewards import (GRPOConfig, LossConfig, RewardConfig,
                           RolloutConfig, UpdateConfig,
                           group_advantages, reward_rollouts)

MODEL_DIR_PATH = Path("grpo_omr_train")

# reference hyperparameters (omr_grpo_train.py:21-83)
TRAIN_BATCH_SIZE = 16
MINI_VALIDATION_SIZE = 1000
LR = 1e-6
ADAMW_BETAS = (0.9, 0.95)
ADAMW_WEIGHT_DECAY = 0.0
EPOCHS = 1
LR_END_FACTOR = 0.1
EXPLORATION_STEPS = 30
MAX_MAX_ACTIONS = 1536
MIN_TOP_K = 10
MIN_TEMPERATURE = 0.6
MIN_ENTROPY_BETA = 0.0
MIN_LAMBDA_CE = 0.01

INITIAL_ROLLOUT_CONFIG = RolloutConfig(group_size=8, max_actions=768,
                                       top_k=50, temperature=1.1)
INITIAL_REWARD_CONFIG = RewardConfig(
    lambda_tedn=7, lambda_well_formed=1.5, lambda_f1=2.5, lambda_repeat=2,
    lambda_len=2, alpha_tedn=0.01, alpha_well_formed=0.25, gamma=3, delta=5,
    tau=50)
INITIAL_LOSS_CONFIG = LossConfig(entropy_beta=0.05, lambda_ce=0.1)
INITIAL_UPDATE_CONFIG = UpdateConfig(epsilon=0.2, update_epochs=2,
                                     max_grad_norm=1.0)


class CurriculumScheduler:
    """Anneals rollout length up and top-k/temperature/entropy/CE down after an
    exploration phase (reference: omr_grpo_train.py:85-118)."""

    def __init__(self, grpo_config: GRPOConfig, exploration_steps: int,
                 total_steps: int, max_max_actions=MAX_MAX_ACTIONS,
                 min_top_k=MIN_TOP_K, min_temperature=MIN_TEMPERATURE,
                 min_beta=MIN_ENTROPY_BETA, min_lambda_ce=MIN_LAMBDA_CE):
        self.cfg = grpo_config
        self.step_count = 0
        self.exploration_steps = exploration_steps
        self.anneal_steps = max(total_steps - exploration_steps, 1)
        rc, lc = grpo_config.rollout_config, grpo_config.loss_config
        self.init = (rc.max_actions, rc.top_k, rc.temperature,
                     lc.entropy_beta, lc.lambda_ce)
        self.bounds = (max_max_actions, min_top_k, min_temperature, min_beta,
                       min_lambda_ce)

    # number of discrete levels for the JIT-STATIC knobs (max_actions sets
    # buffer shapes; top_k/temperature ride SamplingConfig, a static
    # argname of decode_segment): a fresh value per step would recompile
    # the rollout decode AND the update step every outer step (~80 s each
    # through the axon tunnel — round-4 review). entropy_beta/lambda_ce
    # ride the batch as arrays and anneal continuously.
    STATIC_LEVELS = 8

    def step(self):
        if self.step_count < self.exploration_steps:
            self.step_count += 1
            return
        # clamp: steps past the anneal horizon must hold the final values —
        # unclamped p>1 would anneal lambda_ce below its floor (sign-flipping
        # the CE term into gradient ascent) and entropy_beta negative
        # (round-4 advisor finding).
        p = min((self.step_count - self.exploration_steps) / self.anneal_steps,
                1.0)
        pq = min(int(p * self.STATIC_LEVELS),
                 self.STATIC_LEVELS) / self.STATIC_LEVELS
        i, b = self.init, self.bounds
        rc, lc = self.cfg.rollout_config, self.cfg.loss_config
        rc.max_actions = int(i[0] + pq * (b[0] - i[0]))
        rc.top_k = int(i[1] - pq * (i[1] - b[1]))
        rc.temperature = i[2] - pq * (i[2] - b[2])
        lc.entropy_beta = i[3] - p * (i[3] - b[3])
        lc.lambda_ce = i[4] - p * (i[4] - b[4])
        self.step_count += 1


def expand_target_lmx_seqs(target_lmx_seqs, group_size, pad_idx):
    """Ragged target id seqs -> (R, T) padded array broadcast across groups
    (reference: omr_grpo_train.py:121-129)."""
    tmax = max(len(s) for s in target_lmx_seqs)
    b = len(target_lmx_seqs)
    out = np.full((b, tmax), pad_idx, dtype=np.int32)
    for i, s in enumerate(target_lmx_seqs):
        out[i, :len(s)] = s
    return np.repeat(out, group_size, axis=0)


def prepare_rollouts_for_policy_theta(rollouts: np.ndarray,
                                      rollout_mask: np.ndarray, pad_idx: int):
    """Right-shift rollouts + validity mask for the teacher-forced pass
    (reference: models.py:941-949). Returns (inputs, input_valid)."""
    rollout_lens = rollout_mask.sum(-1, keepdims=True)
    shifted_lens = rollout_lens - 1
    cols = np.arange(rollouts.shape[1] - 1)[None, :]
    input_valid = cols < shifted_lens
    inputs = rollouts[:, :-1].copy()
    inputs[~input_valid] = pad_idx
    return inputs, input_valid


# ---------------------------------------------------------------------------
# objective (jitted update step)
# ---------------------------------------------------------------------------

def calc_grpo_objective(theta_logits, rollouts, input_valid, old_log_probs,
                        advantages, epsilon, num_groups):
    """Clipped PPO-style objective over ragged rollouts (reference:
    omr_grpo_train.py:240-262). input_valid is True at positions where a
    prediction is made (complement of the reference's attention mask)."""
    theta_lp = jax.nn.log_softmax(theta_logits.astype(jnp.float32), axis=-1)
    left_shifted = rollouts[:, 1:]
    theta_lp = jnp.take_along_axis(theta_lp, left_shifted[..., None], axis=-1)[..., 0]
    old_lp = old_log_probs[:, 1:]
    ratios = jnp.exp(theta_lp - old_lp)
    unclipped = ratios * advantages[:, None]
    clipped = jnp.clip(ratios, 1 - epsilon, 1 + epsilon) * advantages[:, None]
    obj = jnp.minimum(unclipped, clipped)
    obj = jnp.where(input_valid, obj, 0.0)
    lens = jnp.maximum(input_valid.sum(-1), 1)
    per_rollout = obj.sum(-1) / lens
    return per_rollout.sum() / num_groups


def calc_entropy_bonus(theta_logits, input_valid, vocab_size):
    """Average policy entropy normalized to [0,1] (reference: :265-282)."""
    logits = theta_logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    lp = jax.nn.log_softmax(logits, axis=-1)
    ent = -(probs * lp).sum(-1)
    ent = jnp.where(input_valid, ent, 0.0)
    lens = jnp.maximum(input_valid.sum(-1), 1)
    per_rollout = ent.sum(-1) / lens
    return per_rollout.mean() / jnp.log(vocab_size)


def calc_grpo_objective_sum(theta_logits, rollouts, input_valid, old_log_probs,
                            advantages, epsilon):
    """Sum over rollouts of the per-rollout clipped objective mean (the
    /num_groups normalization is applied by the caller) — the decomposable
    form used for rollout microbatching."""
    theta_lp = jax.nn.log_softmax(theta_logits.astype(jnp.float32), axis=-1)
    left_shifted = rollouts[:, 1:]
    theta_lp = jnp.take_along_axis(theta_lp, left_shifted[..., None], axis=-1)[..., 0]
    old_lp = old_log_probs[:, 1:]
    ratios = jnp.exp(theta_lp - old_lp)
    unclipped = ratios * advantages[:, None]
    clipped = jnp.clip(ratios, 1 - epsilon, 1 + epsilon) * advantages[:, None]
    obj = jnp.where(input_valid, jnp.minimum(unclipped, clipped), 0.0)
    lens = jnp.maximum(input_valid.sum(-1), 1)
    return (obj.sum(-1) / lens).sum()


def calc_entropy_sum(theta_logits, input_valid):
    """Sum over rollouts of per-rollout mean entropy (unnormalized)."""
    logits = theta_logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    lp = jax.nn.log_softmax(logits, axis=-1)
    ent = jnp.where(input_valid, -(probs * lp).sum(-1), 0.0)
    lens = jnp.maximum(input_valid.sum(-1), 1)
    return (ent.sum(-1) / lens).sum()


def make_grpo_update_step(cfg: ViTOMRConfig, tx, num_groups: int,
                          epsilon: float, compute_dtype=jnp.bfloat16,
                          rollout_microbatches: int = 16, mesh=None,
                          axis: str = "data"):
    """One jitted GRPO inner update.

    The teacher-forced pass over all B*G rollouts with long cross-attention
    memories doesn't fit HBM in one backward at reference scale (128 rollouts,
    ~1k-patch latents); the objective is sum-decomposable over rollouts, so
    gradients are accumulated over ``rollout_microbatches`` chunks via
    lax.scan (each chunk remat'd per layer), then the CE-anchor gradient is
    added and one optimizer step applied. Exactly the reference objective
    (omr_grpo_train.py:345-370), restructured for memory.

    ``batch["img_latent"]``/``latent_valid`` may be UNEXPANDED (B unique
    rows with rollouts of one image contiguous — the rollout group size G is
    inferred from rollouts/memory row counts): the per-layer cross K/V are
    projected once per UNIQUE row per chunk (1/G the projection work —
    rollouts replicate memories, reference models.py:883-891) and
    cross-attention folds the group into the query axis
    (ops/transformer.decoder_layer cross_group). The projection happens
    inside the differentiated chunk loss so the cross K/V weights train
    under the GRPO objective like any other decoder weight. Expanded
    latents (G=1 per row) remain supported.

    ``rollout_microbatches`` defaults to 16 (8 rollouts/chunk at reference
    scale) so each chunk's fused-training-kernel saved activations fit the
    HBM budget even at max_actions=1536 (pallas_train_layer.saves_fit) —
    the fused path measures 2.07x/rollout-row over the grouped XLA stack
    (tools/fused_grpo_ab.py); chunk counts whose footprint exceeds the
    budget silently fall back to the rematerializing XLA path.
    """
    vocab_size = cfg.decoder.vocab_size

    def rollout_loss(params, mb, total_rollouts, entropy_beta, rng):
        # static shapes at trace time: G = rollout rows per unique memory row
        cg = mb["rollout_inputs"].shape[0] // mb["img_latent"].shape[0]
        # the chunk's UNIQUE memory rows are projected to cross K/V here,
        # INSIDE the differentiated function: the projection must sit in the
        # grad graph or the cross-attention K/V weights would only ever be
        # trained by the CE anchor (they are ordinary trainable decoder
        # params in the reference, models.py:840-1049)
        mem_kv = transformer.precompute_memory_kv(
            params["decoder"]["blocks"],
            mb["img_latent"].astype(compute_dtype))
        theta_logits = omr_decoder.forward(
            params["decoder"], cfg.decoder, mb["rollout_inputs"],
            mb["img_latent"], mb["rollout_input_valid"], mb["latent_valid"],
            compute_dtype=compute_dtype, rng=rng, deterministic=True,
            remat=True, mem_kv=mem_kv, cross_group=cg)
        obj_sum = calc_grpo_objective_sum(
            theta_logits, mb["rollouts"], mb["rollout_input_valid"],
            mb["old_log_probs"], mb["advantages"], epsilon)
        ent_sum = calc_entropy_sum(theta_logits, mb["rollout_input_valid"])
        obj = obj_sum / num_groups
        ent_bonus = ent_sum / total_rollouts / jnp.log(vocab_size)
        return -(obj + entropy_beta * ent_bonus), (obj, ent_bonus)

    def ce_loss_sum(params, batch):
        mem_kv = transformer.precompute_memory_kv(
            params["decoder"]["blocks"],
            batch["unexpanded_img_latent"].astype(compute_dtype))
        gold_logits = omr_decoder.forward(
            params["decoder"], cfg.decoder, batch["gold_inputs"],
            batch["unexpanded_img_latent"], batch["gold_input_valid"],
            batch["unexpanded_latent_valid"], compute_dtype=compute_dtype,
            deterministic=True, remat=True, mem_kv=mem_kv)
        return vitomr_lib.omr_ce_loss(gold_logits, batch["gold_targets"],
                                      cfg.decoder.pad_idx, reduction="sum")

    rollout_keys = ("rollouts", "rollout_inputs", "rollout_input_valid",
                    "old_log_probs", "advantages", "img_latent", "latent_valid")
    n_shards = 1 if mesh is None else mesh.shape[axis]

    def grads_and_sums(params, batch, rng):
        """Chunked objective grads + CE-anchor sums over this shard's rows.

        Every returned value is a shard-decomposition of the global
        quantity: summing (psum) across shards and applying the global
        normalizers reproduces the single-device math exactly (obj/ent are
        already divided by the GLOBAL num_groups / rollout count; the CE
        mean is reassembled from (sum, count))."""
        r_local = batch["rollouts"].shape[0]
        r_total = r_local * n_shards
        b_mem = batch["img_latent"].shape[0]
        if r_local % b_mem:
            raise ValueError(f"rollout rows {r_local} not a multiple of "
                             f"memory rows {b_mem}")
        m = max(rollout_microbatches // n_shards, 1)
        while m > 1 and (r_local % m or b_mem % m):
            # largest feasible microbatch count <= the requested one: the
            # m=1 fallback ran the WHOLE batch in one backward, which the
            # docstring itself says OOMs HBM at reference scale
            m -= 1
        micro = {}
        for k in rollout_keys:
            lead = batch[k].shape[0]
            micro[k] = batch[k].reshape((m, lead // m) + batch[k].shape[1:])
        rngs = jax.random.split(rng, m)

        def body(carry, xs):
            grads_acc, obj_acc, ent_acc = carry
            mb, r = xs
            (loss_m, (obj, ent)), g = jax.value_and_grad(
                rollout_loss, has_aux=True)(params, mb,
                                            jnp.float32(r_total),
                                            batch["entropy_beta"], r)
            grads_acc = jax.tree.map(jnp.add, grads_acc, g)
            return (grads_acc, obj_acc + obj, ent_acc + ent), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, obj, ent), _ = jax.lax.scan(body, (zero, 0.0, 0.0), (micro, rngs))

        ce_s = ce_n = jnp.float32(0.0)
        ce_grads = None
        if "gold_inputs" in batch:
            (ce_s, ce_n), ce_grads = jax.value_and_grad(
                lambda p: ce_loss_sum(p, batch), has_aux=True)(params)
        return grads, obj, ent, ce_s, ce_n, ce_grads

    def finish(state, batch, grads, obj, ent, ce_s, ce_n, ce_grads):
        ce = jnp.float32(0.0)
        if ce_grads is not None:
            ce = ce_s / jnp.maximum(ce_n, 1.0)
            grads = jax.tree.map(
                lambda g, cg: g + batch["lambda_ce"] * cg
                / jnp.maximum(ce_n, 1.0), grads, ce_grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        loss = -(obj + batch["entropy_beta"] * ent - batch["lambda_ce"] * ce)
        metrics = {"loss": loss, "grpo_objective": obj, "entropy_bonus": ent,
                   "ce_loss": ce, "grad_norm": optax.global_norm(grads)}
        return trainer.TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        def step(state, batch, rng):
            grads, obj, ent, ce_s, ce_n, ce_grads = grads_and_sums(
                state.params, batch, rng)
            return finish(state, batch, grads, obj, ent, ce_s, ce_n, ce_grads)

        return jax.jit(step)

    # --- shard_map DP: rollouts (and gold images) shard over the data axis;
    # each device runs the single-chip chunked grad step (fused Pallas
    # kernels included — GSPMD can't partition them) and the sums psum to
    # the exact global objective/CE means
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(params, batch, rng):
        # independent per-shard randomness (the update is deterministic today,
        # but the rngs thread into the decoder forward — keep shards decorrelated
        # if dropout/regularizers are ever enabled, like the DP trainer does)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grads, obj, ent, ce_s, ce_n, ce_grads = grads_and_sums(
            params, batch, rng)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        obj = jax.lax.psum(obj, axis)
        ent = jax.lax.psum(ent, axis)
        ce_s = jax.lax.psum(ce_s, axis)
        ce_n = jax.lax.psum(ce_n, axis)
        if ce_grads is not None:
            ce_grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), ce_grads)
            return grads, obj, ent, ce_s, ce_n, ce_grads
        return grads, obj, ent, ce_s, ce_n

    def sharded_step(state, batch, rng):
        specs = trainer._batch_specs(batch, axis)
        f = shard_map(local, mesh=mesh, in_specs=(P(), specs, P()),
                      out_specs=P(), check_vma=False)
        outs = f(state.params, batch, rng)
        grads, obj, ent, ce_s, ce_n = outs[:5]
        ce_grads = outs[5] if len(outs) > 5 else None
        return finish(state, batch, grads, obj, ent, ce_s, ce_n, ce_grads)

    return jax.jit(sharded_step)


# ---------------------------------------------------------------------------
# outer update per minibatch
# ---------------------------------------------------------------------------

def _encode_examples(params, cfg, batch_examples, compute_dtype):
    """Batchify + dispatch the (frozen) encoder for a batch of examples.

    Dispatch is async: the returned device arrays are futures the host can
    hold while doing other work (TEDn scoring) — encode-ahead overlap."""
    from ..models import vit_encoder

    pb = vit_encoder.batchify([ex[0] for ex in batch_examples], cfg.encoder)
    return vitomr_lib.encode_image_jit(
        params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
        jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
        compute_dtype=compute_dtype)


def grpo_update(old_params, state, update_step, cfg: ViTOMRConfig,
                grpo_config: GRPOConfig, batch_examples, tokenizer,
                rng, writer: MetricsWriter | None = None, step_idx: int = 0,
                compute_dtype=jnp.bfloat16, reward_workers: int = 16,
                mesh=None, next_examples=None, preencoded=None):
    """One outer GRPO step on a minibatch of (img, lmx_ids, musicxml) examples
    (reference: grpo_update, omr_grpo_train.py:308-376). Returns (state,
    metrics dict). ``mesh``: shard the rollout decode across the mesh's data
    axis (one image group per device slot; len(batch_examples) must divide
    evenly).

    ``next_examples``: encode-ahead overlap — the NEXT batch's images are
    batchified and their encode dispatched right after this batch's rollouts
    land, so the device crunches encode(N+1) while the host runs TEDn reward
    scoring for batch N. Exact because GRPO freezes the encoder and
    transition head (grpo_frozen_scales): latents are update-invariant. The
    dispatched (latent, valid) pair comes back in metrics["preencoded_next"];
    pass it to the next call as ``preencoded``."""
    rc, rwc, lc, uc = grpo_config.get_configs()
    pad_idx = cfg.decoder.pad_idx
    target_seqs = [np.asarray(ex[1], np.int32) for ex in batch_examples]
    target_xml = [ex[2] for ex in batch_examples]
    num_groups = len(batch_examples)
    g = rc.group_size
    t_start = time.perf_counter()

    # --- rollout with the old-policy snapshot (no grad) -------------------
    if preencoded is not None:
        unexp_latent, unexp_valid = preencoded
    else:
        unexp_latent, unexp_valid = _encode_examples(
            old_params, cfg, batch_examples, compute_dtype)
    # grouped rollout decode: cross K/V projected/streamed once per unique
    # image (decode mem_group) instead of per rollout — no latent expansion
    rng, roll_rng = jax.random.split(rng)
    # (A/B note: segment_steps=64 — compaction at every 64-step boundary —
    # measured NEUTRAL warm and adds compile churn for the extra compacted
    # shapes; growth-boundary compaction stays the default. docs/PERF.md.)
    roll_kwargs = {}
    if getattr(rc, "cache_dtype", "bf16") == "int8":
        roll_kwargs["cache_dtype"] = jnp.int8   # grouped int8 rollout decode
    rollouts, old_lp, rollout_mask = vitomr_lib.forward_rollout_policy(
        old_params, cfg, unexp_latent, unexp_valid, roll_rng,
        max_actions=rc.max_actions, top_k=rc.top_k, temperature=rc.temperature,
        group_size=g, mesh=mesh, compute_dtype=compute_dtype, **roll_kwargs)
    rollouts = np.asarray(rollouts)
    old_lp = np.asarray(old_lp)
    rollout_mask = np.asarray(rollout_mask)
    t_rollout = time.perf_counter()  # the asarray pulls are a device sync

    # encode-ahead: dispatch the NEXT batch's encoder pass now (async) so it
    # overlaps the host-side reward scoring below
    preencoded_next = None
    if next_examples is not None:
        preencoded_next = _encode_examples(old_params, cfg, next_examples,
                                           compute_dtype)

    # --- rewards (host, native TEDn) --------------------------------------
    target_lmx = expand_target_lmx_seqs(target_seqs, g, pad_idx)
    raw_rewards, components = reward_rollouts(
        rwc, rollouts, rollout_mask, target_lmx, target_xml, num_groups, g,
        tokenizer.idxs_to_tokens, pad_idx, reward_workers)
    advantages = group_advantages(raw_rewards)
    if grpo_config.update_config.shuffle_advantages:
        # control arm: see UpdateConfig.shuffle_advantages. The fresh
        # fixed-seed rng gives a deterministic (but data-independent)
        # permutation per call — credit assignment is destroyed either way.
        advantages = np.random.default_rng(12345).permutation(advantages)
    t_reward = time.perf_counter()

    rollout_inputs, input_valid = prepare_rollouts_for_policy_theta(
        rollouts, rollout_mask, pad_idx)
    # bucket the update width to a 128-multiple so the jitted update step's
    # shapes recur across batches — rollouts trim to the longest sequence,
    # which otherwise recompiles the step (~80 s through the axon tunnel at
    # reference scale) for nearly every new batch. Padding is loss-neutral:
    # pad tokens with input_valid=False contribute nothing to the objective.
    # cap at ceil128(max_actions) bounded by the decoder budget: capping at
    # the raw max_actions re-introduced a per-curriculum-step recompile
    # exactly when rollouts hit max length (round-4 review); the budget
    # bound keeps padded inputs inside max_lmx_seq_len
    tb = min(-(-rollout_inputs.shape[1] // 128) * 128,
             -(-rc.max_actions // 128) * 128,
             cfg.decoder.max_lmx_seq_len - 1)
    if tb > rollout_inputs.shape[1]:
        dt = tb - rollout_inputs.shape[1]
        rollout_inputs = np.pad(rollout_inputs, ((0, 0), (0, dt)),
                                constant_values=pad_idx)
        input_valid = np.pad(input_valid, ((0, 0), (0, dt)))
        rollouts = np.pad(rollouts, ((0, 0), (0, tb + 1 - rollouts.shape[1])),
                          constant_values=pad_idx)
        old_lp = np.pad(old_lp, ((0, 0), (0, tb + 1 - old_lp.shape[1])))

    batch = {
        "rollouts": jnp.asarray(rollouts),
        "rollout_inputs": jnp.asarray(rollout_inputs),
        "rollout_input_valid": jnp.asarray(input_valid),
        "old_log_probs": jnp.asarray(old_lp),
        "advantages": jnp.asarray(advantages, dtype=jnp.float32),
        # UNEXPANDED memory rows: the update step projects cross K/V once
        # per unique image and folds the G rollouts into the cross query
        # axis (make_grpo_update_step group_size)
        "img_latent": unexp_latent,
        "latent_valid": unexp_valid,
        "entropy_beta": jnp.float32(lc.entropy_beta),
        "lambda_ce": jnp.float32(lc.lambda_ce),
    }
    if lc.lambda_ce:
        gold_inputs, gold_targets, gold_valid = \
            omr_decoder.batchify_and_split_lmx_seqs(
                target_seqs, pad_idx, max_len=cfg.decoder.max_lmx_seq_len)
        batch.update(
            gold_inputs=jnp.asarray(gold_inputs),
            gold_targets=jnp.asarray(gold_targets),
            gold_input_valid=jnp.asarray(gold_valid),
            unexpanded_img_latent=unexp_latent,
            unexpanded_latent_valid=unexp_valid)

    # --- inner updates -----------------------------------------------------
    t_glue = time.perf_counter()
    # accumulate metrics on device; one ~29 ms host pull for all of them
    loss_acc = ce_acc = None
    for _ in range(uc.update_epochs):
        rng, step_rng = jax.random.split(rng)
        state, metrics = update_step(state, batch, step_rng)
        loss_acc = metrics["loss"] if loss_acc is None else loss_acc + metrics["loss"]
        ce_acc = metrics["ce_loss"] if ce_acc is None else ce_acc + metrics["ce_loss"]

    pulled = np.asarray(jnp.stack([loss_acc, ce_acc,
                                   raw_rewards.mean().astype(jnp.float32)]))
    total_loss, total_ce, avg_reward = (float(pulled[0]), float(pulled[1]),
                                        float(pulled[2]))
    t_update = time.perf_counter()
    out = {
        "loss": total_loss / uc.update_epochs,
        "ce_loss": total_ce / uc.update_epochs,
        "reward": avg_reward,
        "reward_components": components.avg_over_rollouts(),
        # phase breakdown, seconds. Boundaries coincide with real host<->device
        # syncs already present (the rollout asarray pulls; the metrics pull),
        # so the attribution costs nothing extra.
        "phase_times": {
            "rollout": t_rollout - t_start,
            "reward": t_reward - t_rollout,
            "host_glue": t_glue - t_reward,
            "update": t_update - t_glue,
        },
        "preencoded_next": preencoded_next,
    }
    if writer is not None:
        writer.scalar("train/loss", out["loss"], step_idx)
        writer.scalar("train/reward", avg_reward, step_idx)
        writer.scalars("train/reward/components",
                       out["reward_components"].to_dict(), step_idx)
    return state, out


def set_up_grpo(cfg_tf: ViTOMRConfig, tf_params) -> tuple[ViTOMRConfig, dict]:
    """Stage-2 -> stage-3 handoff: same params, encoder fine-tune split
    dissolved (full encoder frozen at update time) and dropout zeroed
    (reference: GRPOViTOMR.__init__, models.py:843-859). Pure config surgery —
    the stacked layout needs no state-dict renumbering."""
    import dataclasses
    enc = dataclasses.replace(cfg_tf.encoder, dropout=0.0, fine_tune_depth=0)
    dec = dataclasses.replace(cfg_tf.decoder, dropout=0.0)
    cfg = ViTOMRConfig(encoder=enc, decoder=dec,
                       transition_head_dim=cfg_tf.transition_head_dim,
                       transition_head_dropout=0.0)
    return cfg, tf_params


def grpo_frozen_scales(params) -> dict:
    """Freeze encoder + transition head; train the decoder only
    (reference: models.py:850-853)."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: 1.0 if trainer.key_path_names(kp)[0] == "decoder"
        else 0.0, params)


@functools.partial(jax.jit,
                   static_argnames=("dcfg", "pad_idx", "compute_dtype"))
def _decoder_ce_jit(dec_params, dcfg, inputs, latent, lmx_valid,
                    latent_valid, targets, pad_idx, compute_dtype):
    """Jitted teacher-forced decoder CE for EAGER call sites (mini_validate).

    Called un-jitted, the 12-layer forward dispatches hundreds of ops
    through the axon tunnel per validation batch — the same pathology
    encode_image_jit exists to avoid (round-5 review)."""
    logits = omr_decoder.forward(dec_params, dcfg, inputs, latent, lmx_valid,
                                 latent_valid, compute_dtype=compute_dtype,
                                 deterministic=True)
    return vitomr_lib.omr_ce_loss(logits, targets, pad_idx)


def mini_validate(state_params, cfg: ViTOMRConfig,
                  grpo_config: GRPOConfig, dataset, tokenizer, rng,
                  batch_size: int = 32, max_examples: int = 128,
                  compute_dtype=jnp.bfloat16, reward_workers: int = 16):
    """Reward + teacher-forced CE over a validation subset (reference:
    validation loops, omr_grpo_train.py:455-501): one rollout per example
    (group_size=1), mean raw reward and CE loss."""
    from ..models import vit_encoder

    rc, rwc, _, _ = grpo_config.get_configs()
    pad_idx = cfg.decoder.pad_idx
    total_reward, total_ce, n = 0.0, 0.0, 0
    comp_sum = None
    for i in range(0, min(len(dataset), max_examples), batch_size):
        batch = [dataset[j] for j in range(i, min(i + batch_size, len(dataset),
                                                  max_examples))]
        imgs = [ex[0] for ex in batch]
        seqs = [np.asarray(ex[1], np.int32) for ex in batch]
        xmls = [ex[2] for ex in batch]
        pb = vit_encoder.batchify(imgs, cfg.encoder)
        latent, valid = vitomr_lib.encode_image_jit(
            state_params, cfg, jnp.asarray(pb.patches), jnp.asarray(pb.pe_idx),
            jnp.asarray(pb.pe_w), jnp.asarray(pb.valid),
            compute_dtype=compute_dtype)
        rng, r = jax.random.split(rng)
        rollouts, _, mask = vitomr_lib.forward_rollout_policy(
            state_params, cfg, latent, valid, r, max_actions=rc.max_actions,
            top_k=rc.top_k, temperature=rc.temperature,
            compute_dtype=compute_dtype)
        rollouts, mask = np.asarray(rollouts), np.asarray(mask)
        targets = expand_target_lmx_seqs(seqs, 1, pad_idx)
        rewards, comps = reward_rollouts(
            rwc, rollouts, mask, targets, xmls, len(batch), 1,
            tokenizer.idxs_to_tokens, pad_idx, reward_workers)
        gold_inputs, gold_targets, gold_valid = \
            omr_decoder.batchify_and_split_lmx_seqs(
                seqs, pad_idx, max_len=cfg.decoder.max_lmx_seq_len)
        ce = float(_decoder_ce_jit(
            state_params["decoder"], cfg.decoder, jnp.asarray(gold_inputs),
            latent, jnp.asarray(gold_valid), valid,
            jnp.asarray(gold_targets), pad_idx, compute_dtype))
        total_reward += float(rewards.mean()) * len(batch)
        total_ce += ce * len(batch)
        n += len(batch)
        # example-weighted like reward/CE (an equal-weight-per-batch mean
        # over-weighted ragged tail batches 8x — round-5 review)
        avg = comps.avg_over_rollouts() * len(batch)
        comp_sum = avg if comp_sum is None else comp_sum + avg
    comps = comp_sum / max(n, 1) if comp_sum is not None else None
    return {"reward": total_reward / max(n, 1), "ce_loss": total_ce / max(n, 1),
            "components": comps}


def build_datasets():
    """Stage-3 dataset mix with musicxml targets for TEDn (reference:
    omr_grpo_train.py __main__)."""
    from ..config import (GRAND_STAFF_ROOT_DIR, OLIMPIC_SYNTHETIC_ROOT_DIR,
                          OMR_MAX_IMG_SEQ_LEN, PATCH_SIZE, PE_MAX_HEIGHT,
                          PE_MAX_WIDTH)
    from ..data import datasets as ds_lib
    from ..data import transforms as tf_lib

    tokenizer = LmxTokenizer()
    base = tf_lib.Compose([
        tf_lib.to_float_chw,
        tf_lib.DynamicResize(PATCH_SIZE, OMR_MAX_IMG_SEQ_LEN, PE_MAX_HEIGHT,
                             PE_MAX_WIDTH, crop_imgs=False)])
    lmx_tf = tokenizer.encode
    grand_staff = ds_lib.GrandStaffLMXDataset(
        GRAND_STAFF_ROOT_DIR, "samples.train.txt", img_transform=base,
        lmx_transform=lmx_tf, include_musicxml=True)
    train = ds_lib.ConcatDataset([
        ds_lib.GrandStaffOMRTrainWrapper(grand_staff, 0.3,
                                         transform=tf_lib.default_camera_augment(1.0)),
        ds_lib.OlimpicDataset(OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.train.txt",
                              img_transform=base, lmx_transform=lmx_tf,
                              include_musicxml=True),
    ])
    val = ds_lib.OlimpicDataset(OLIMPIC_SYNTHETIC_ROOT_DIR, "samples.dev.txt",
                                img_transform=base, lmx_transform=lmx_tf,
                                include_musicxml=True)
    return tokenizer, train, val


def grpo_train(cfg: ViTOMRConfig, params, dataset, tokenizer: LmxTokenizer, *,
               grpo_config: GRPOConfig | None = None, epochs: int = EPOCHS,
               batch_size: int = TRAIN_BATCH_SIZE, lr: float = LR,
               model_dir: Path = MODEL_DIR_PATH, seed: int = 0,
               compute_dtype=jnp.bfloat16, reward_workers: int = 16,
               exploration_steps: int = EXPLORATION_STEPS,
               val_dataset=None, mini_validation_size: int = MINI_VALIDATION_SIZE):
    """Outer GRPO loop: per batch, refresh the old-policy snapshot and run
    ``grpo_update`` (reference: epoch_train_loop, omr_grpo_train.py:404-453).

    dataset items: (img (C,H,W) float array, lmx token ids, musicxml str).
    """
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=False)
    (model_dir / "checkpoints").mkdir()

    if grpo_config is None:
        import copy
        grpo_config = GRPOConfig(
            rollout_config=copy.deepcopy(INITIAL_ROLLOUT_CONFIG),
            reward_config=copy.deepcopy(INITIAL_REWARD_CONFIG),
            loss_config=copy.deepcopy(INITIAL_LOSS_CONFIG),
            update_config=copy.deepcopy(INITIAL_UPDATE_CONFIG),
            mini_validation_freq=100, checkpoint_freq=100)

    n = len(dataset)
    steps_per_epoch = max(n // batch_size, 1)
    total_steps = epochs * steps_per_epoch
    schedule = optax.linear_schedule(lr, lr * LR_END_FACTOR,
                                     total_steps * grpo_config.update_config.update_epochs)
    tx = trainer.adamw(schedule, betas=ADAMW_BETAS,
                       weight_decay=ADAMW_WEIGHT_DECAY,
                       max_grad_norm=grpo_config.update_config.max_grad_norm,
                       scale_tree_fn=grpo_frozen_scales)
    params = jax.tree.map(jnp.array, params)
    state = trainer.create_train_state(params, tx)
    # data-parallel over all attached devices when the image batch shards
    # evenly (SURVEY §2.5(a): batch-sharded GRPO step) — rollout decode and
    # the chunked update both run per shard (Pallas kernels intact)
    from ..parallel import mesh as mesh_lib
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh() if (n_dev > 1 and batch_size % n_dev == 0) \
        else None
    update_step = make_grpo_update_step(
        cfg, tx, batch_size, grpo_config.update_config.epsilon, compute_dtype,
        mesh=mesh)

    # the INITIAL rollout budget must respect the decoder's scoring budget
    # too, not just the anneal target: rollouts wider than
    # max_lmx_seq_len - 1 crash omr_decoder.forward at the first update
    # step, AFTER the expensive rollout + TEDn work (round-5 review)
    rc0 = grpo_config.rollout_config
    if rc0.max_actions > cfg.decoder.max_lmx_seq_len - 1:
        print(f"[grpo] clamping rollout max_actions {rc0.max_actions} -> "
              f"{cfg.decoder.max_lmx_seq_len - 1} (decoder budget)")
        rc0.max_actions = cfg.decoder.max_lmx_seq_len - 1
    curriculum = CurriculumScheduler(
        grpo_config, exploration_steps, total_steps,
        # never anneal rollouts past what the decoder can score
        max_max_actions=min(MAX_MAX_ACTIONS, cfg.decoder.max_lmx_seq_len - 1))
    writer = MetricsWriter(str(model_dir / "tb"), str(model_dir / "stats.csv"))
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)

    def emergency_checkpoint():
        # crash-resilient save, like stages 1+2 (round-5 review: a crash at
        # outer step checkpoint_freq-1 lost every step since the last
        # periodic save — minutes of rollout+reward+update work)
        try:
            ckpt_lib.save_train_state(
                model_dir / "checkpoints" / "emergency", state)
            print(f"Saved emergency checkpoint to "
                  f"{model_dir}/checkpoints/emergency")
        except Exception:
            pass

    step_idx = 0
    stats = []
    for epoch in range(epochs):
        order = np_rng.permutation(n)
        starts = list(range(0, n - batch_size + 1, batch_size))

        def load_batch(si):
            # LAZY per-batch loading with a one-batch lookahead window: the
            # old eager list comprehension materialized the WHOLE epoch
            # (every decoded image + musicxml string) before step 1 — tens
            # of GB of host RAM and a long stall at reference scale
            # (round-4 review). Encode-ahead only ever needs batch si+1.
            if si >= len(starts):
                return None
            sidx = starts[si]
            return [dataset[int(j)] for j in order[sidx:sidx + batch_size]]

        batch_examples = load_batch(0)
        next_examples = load_batch(1)
        preencoded = None  # encode-ahead chain (frozen encoder => exact)
        try:
            for bi in range(len(starts)):
                old_params = state.params  # snapshot = old policy (refreshed per batch)
                rng, step_rng = jax.random.split(rng)
                t0 = time.perf_counter()
                state, metrics = grpo_update(
                    old_params, state, update_step, cfg, grpo_config,
                    batch_examples, tokenizer, step_rng, writer, step_idx,
                    compute_dtype, reward_workers, mesh=mesh,
                    next_examples=next_examples,
                    preencoded=preencoded)
                batch_examples = next_examples
                next_examples = load_batch(bi + 2)
                preencoded = metrics.pop("preencoded_next")
                metrics["seconds"] = time.perf_counter() - t0
                stats.append(metrics)
                curriculum.step()
                step_idx += 1
                if step_idx % grpo_config.checkpoint_freq == 0:
                    ckpt_lib.save_train_state(
                        model_dir / "checkpoints" / f"step_{step_idx}", state)
                if (val_dataset is not None
                        and step_idx % grpo_config.mini_validation_freq == 0):
                    rng, val_rng = jax.random.split(rng)
                    val = mini_validate(state.params, cfg, grpo_config,
                                        val_dataset, tokenizer, val_rng,
                                        max_examples=mini_validation_size,
                                        compute_dtype=compute_dtype,
                                        reward_workers=reward_workers)
                    writer.scalar("mini_val/reward", val["reward"], step_idx)
                    writer.scalar("mini_val/ce_loss", val["ce_loss"], step_idx)
                    if val["components"] is not None:
                        writer.scalars("mini_val/reward/components",
                                       val["components"].to_dict(), step_idx)
                    # surface mini-val in the returned stats too (not just
                    # TB): evidence artifacts must be reconstructible from
                    # the return value alone (tools/grpo_evidence_run.py)
                    metrics["mini_val"] = {
                        "step": step_idx, "reward": val["reward"],
                        "ce_loss": val["ce_loss"],
                        "components": (val["components"].to_dict()
                                       if val["components"] is not None
                                       else None),
                    }
        except (KeyboardInterrupt, Exception):
            emergency_checkpoint()
            raise
        writer.flush()

    ckpt_lib.save_pytree(model_dir / "grpo_vitomr", state.params)
    return state.params, stats


if __name__ == "__main__":
    from ..utils import fast_prng
    fast_prng.enable()
    from ..utils import checkpoint as ckpt_lib2
    from .omr_teacher_force_train import set_up_vitomr

    tokenizer, train_ds, val_ds = build_datasets()
    cfg_tf = set_up_vitomr(tokenizer)
    tf_params = ckpt_lib2.load_params("tf_omr_train/vitomr")
    cfg, params = set_up_grpo(cfg_tf, tf_params)
    grpo_train(cfg, params, train_ds, tokenizer, val_dataset=val_ds)
