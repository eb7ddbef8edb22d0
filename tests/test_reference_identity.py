"""Code-level end-to-end identity vs the reference implementation.

Loads OUR randomly initialized params into the reference's own torch modules
(reverse converter, models/torch_compat.py) and runs both stacks side by side
on CPU — the reference's actual ``ViTOMR.cached_greedy_generate`` +
``CachedTransformerDecoder`` (reference models.py:600-615,
kv_caching.py:258-302) vs ``decode.generate(pe_offset=1)``, plus
teacher-forced CE and MAE loss equality (reference models.py:722-736,
784-796, 249-288). Skipped when /root/reference is not mounted.
"""

import pytest

from tools import reference_identity as ri

pytestmark = pytest.mark.skipif(not ri.available(),
                                reason="reference repo not mounted")


def test_state_dict_roundtrip():
    r = ri.check_roundtrip(tiny=True)
    assert r["status"] == "ok", r
    assert r["max_abs_diff"] == 0.0


def test_greedy_token_identity():
    r = ri.check_greedy_identity(tiny=True)
    assert r["status"] == "ok", r
    assert r["identical_tokens"], r
    assert r["max_avg_log_prob_diff"] < 1e-3


def test_teacher_forced_ce_equality():
    r = ri.check_ce_loss(tiny=True)
    assert r["status"] == "ok", r
    assert r["abs_diff"] < 1e-4


def test_teacher_forced_ce_equality_label_smoothing():
    r = ri.check_ce_loss(tiny=True, label_smoothing=0.1)
    assert r["status"] == "ok", r


def test_mae_loss_equality():
    r = ri.check_mae_loss(tiny=True)
    assert r["status"] == "ok", r
    assert r["abs_diff"] < 1e-4
