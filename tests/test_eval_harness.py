"""Smoke test for the eval/parity harness on a fabricated data root.

Exercises the one previously-unexecuted path in the repo: the full
``eval_model.eval_mae`` / ``eval_vitomr`` loops (reference:
acai_omr/models/eval_model.py:18-166 — dataset builders, bucket sampler,
prefetch loader, checkpoint load, eval_fn) and
``tools.verify_reference_losses._eval_with_params``, against a synthetic
on-disk GrandStaff + OLiMPiC layout with tiny model configs.
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax

from acai_omr_tpu import eval_model
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig
from acai_omr_tpu.utils import checkpoint as ckpt_lib

DATA = Path(__file__).parent / "data"
SAMPLE_LMX = " ".join((DATA / "sample_lmx_0.txt").read_text()
                      .replace("<eos>", "").split()[:14])


def _write_img(path: Path, rng, h=64, w=96):
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (rng.random((h, w)) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


@pytest.fixture()
def data_roots(tmp_path):
    """Fabricated GrandStaff + OLiMPiC synthetic/scanned test splits
    (the reference's on-disk layouts, datasets.py contracts)."""
    rng = np.random.default_rng(0)
    gs = tmp_path / "grandstaff-lmx"
    ids = [f"piece{i}" for i in range(4)]
    (gs / "grandstaff").mkdir(parents=True)
    (gs / "samples.test.txt").write_text("\n".join(ids) + "\n")
    for ex in ids:
        _write_img(gs / "grandstaff" / f"{ex}.jpg", rng)
        _write_img(gs / "grandstaff" / f"{ex}_distorted.jpg", rng)
        (gs / f"{ex}.lmx").write_text(SAMPLE_LMX + "\n")

    roots = {"GRAND_STAFF_ROOT_DIR": gs}
    for name, n in (("OLIMPIC_SYNTHETIC_ROOT_DIR", 3),
                    ("OLIMPIC_SCANNED_ROOT_DIR", 3)):
        root = tmp_path / name.lower()
        root.mkdir()
        oids = [f"score{i}" for i in range(n)]
        (root / "samples.test.txt").write_text("\n".join(oids) + "\n")
        for ex in oids:
            _write_img(root / f"{ex}.png", rng, h=48, w=80)
            (root / f"{ex}.lmx").write_text(SAMPLE_LMX + "\n")
        roots[name] = root
    return roots


@pytest.fixture()
def patched_roots(data_roots, monkeypatch):
    for name, root in data_roots.items():
        monkeypatch.setattr(eval_model, name, str(root))
    return data_roots


TINY_ENC = EncoderConfig(patch_size=16, pe_max_height=60, pe_max_width=200,
                         num_layers=2, hidden_dim=32, num_heads=4, mlp_dim=64,
                         dropout=0.0)


def test_eval_mae_smoke(patched_roots, tmp_path):
    from acai_omr_tpu.models import mae as mae_lib

    cfg = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                    decoder_hidden_dim=32, decoder_num_heads=4,
                    decoder_mlp_dim=64)
    params = mae_lib.init_mae_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "mae_ckpt"
    ckpt_lib.save_pytree(ckpt, params)

    loss = eval_model.eval_mae(str(ckpt), batch_size=4, num_workers=2, cfg=cfg)
    assert np.isfinite(loss) and loss > 0


def test_eval_vitomr_smoke(patched_roots, tmp_path):
    from acai_omr_tpu.models import vitomr as vitomr_lib

    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=TINY_ENC,
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=64,
                                             num_layers=2, hidden_dim=32,
                                             num_heads=4, mlp_dim=64,
                                             dropout=0.0),
        transition_head_dim=48)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "vitomr_ckpt"
    ckpt_lib.save_pytree(ckpt, params)

    loss = eval_model.eval_vitomr(str(ckpt), batch_size=4, num_workers=2,
                                  cfg=cfg)
    assert np.isfinite(loss) and loss > 0


def test_verify_reference_losses_harness(patched_roots):
    """The parity gate's own eval harness (_eval_with_params) executes end to
    end on the fabricated roots — so when trained weights arrive, the only
    untested part is the weights themselves."""
    from acai_omr_tpu.models import mae as mae_lib
    from tools import verify_reference_losses as vrl

    cfg = MaeConfig(encoder=TINY_ENC, mask_ratio=0.75, decoder_num_layers=2,
                    decoder_hidden_dim=32, decoder_num_heads=4,
                    decoder_mlp_dim=64)
    params = mae_lib.init_mae_params(jax.random.PRNGKey(1), cfg)
    loss = vrl._eval_with_params(eval_model, "mae", params, batch_size=4,
                                 cfg=cfg, num_workers=2)
    assert np.isfinite(loss) and loss > 0
