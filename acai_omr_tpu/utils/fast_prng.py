"""Opt into the TPU hardware PRNG for training.

JAX's default threefry PRNG is counter-based software RNG — safe and
splittable, but expensive on TPU: at seq2seq training scale the dropout
masks alone cost ~75 ms/step (21% of the whole gradient step, measured on
v5e, B=8, img 1024). The ``rbg`` implementation uses the hardware RNG and
recovers all of it (353 -> 276 ms/step) with statistically equivalent
dropout/sampling draws.

Called by the training entry points (pre_train / omr_teacher_force_train /
omr_grpo_train ``__main__`` and tools/e2e_pipeline_run.py) — NOT at library
import, so test suites and inference keep the default threefry streams.
Disable with ACAI_FAST_PRNG=0.
"""

import os

import jax


def enable() -> bool:
    """Switch jax's default PRNG impl to the hardware ``rbg`` generator.

    ``ACAI_FAST_PRNG=unsafe`` selects ``unsafe_rbg`` instead: key *splits*
    also bypass threefry (new keys are drawn from the hardware RNG rather
    than derived), trading split determinism guarantees for ~2 ms/step of
    threefry at seq2seq scale — an A/B knob, not the default.
    """
    mode = os.environ.get("ACAI_FAST_PRNG", "1")
    if mode == "0":
        return False
    impl = "unsafe_rbg" if mode == "unsafe" else "rbg"
    jax.config.update("jax_default_prng_impl", impl)
    return True
