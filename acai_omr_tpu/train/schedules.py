"""LR and curriculum schedules, exact to the reference's torch schedulers.

Reference uses LinearLR(start_factor=5e-3) warmup chained into
CosineAnnealingLR (reference: acai_omr/utils/utils.py:204-222), stepped either
per-epoch (MAE) or per-optimizer-step (seq2seq). Here schedules are pure
``step -> lr`` functions consumed by optax.
"""

from __future__ import annotations


def cosine_anneal_with_warmup(base_lr: float, warmup_steps: int,
                              total_steps: int, final_lr: float,
                              start_factor: float = 5e-3):
    """LinearLR warmup then cosine anneal, matching torch SequentialLR
    semantics: factor interpolates start_factor -> 1 over ``warmup_steps``,
    then cosine from base_lr to final_lr over the remaining steps."""
    anneal_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        warm_lr = base_lr * (start_factor + (1.0 - start_factor) * warm_frac)
        t = jnp.clip((step - warmup_steps) / anneal_steps, 0.0, 1.0)
        cos_lr = final_lr + (base_lr - final_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm_lr, cos_lr)

    return schedule


def linear_anneal(init_value: float, min_value: float, step: int,
                  anneal_steps: int) -> float:
    """Teacher-forcing probability anneal (reference:
    omr_teacher_force_train.py:79-80)."""
    progress = step / max(anneal_steps, 1)
    return max(init_value - (init_value - min_value) * progress, min_value)


def exp_anneal(init_value: float, min_value: float, step: int,
               anneal_steps: int) -> float:
    """Gumbel tau exponential anneal (omr_teacher_force_train.py:81)."""
    progress = step / max(anneal_steps, 1)
    return max(init_value * (min_value / init_value) ** progress, min_value)


class TFSchedule:
    """Scheduled-sampling curriculum: tf_prob 1->0 linear, tau 5->0.1 exp,
    hard sampling after ``soft_steps`` (reference:
    omr_teacher_force_train.py:64-83)."""

    def __init__(self, init_tf_prob=1.0, min_tf_prob=0.0, init_tau=5.0,
                 min_tau=0.1, soft_steps=0, anneal_steps=1):
        self.init_tf_prob = init_tf_prob
        self.min_tf_prob = min_tf_prob
        self.init_tau = init_tau
        self.min_tau = min_tau
        self.soft_steps = soft_steps
        self.anneal_steps = anneal_steps

    def at(self, step: int):
        tf_prob = linear_anneal(self.init_tf_prob, self.min_tf_prob, step,
                                self.anneal_steps)
        tau = exp_anneal(self.init_tau, self.min_tau, step, self.anneal_steps)
        use_hard = step >= self.soft_steps
        return tf_prob, tau, use_hard
