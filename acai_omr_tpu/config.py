"""Central constants for the TPU-native Acai OMR stack.

Mirrors the role of the reference's ``acai_omr/config.py`` (reference:
acai_omr/config.py:1-21): one flat module of constants shared by every layer so
circular imports never arise. Paths are relative to the repo root by default and
overridable via environment variables so the same code runs on dev boxes and TPU
pods.
"""

import os
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

def _env_path(name: str, default: str) -> str:
    return os.environ.get(name, default)

# Dataset roots (same layout as the reference, reference: acai_omr/config.py:3-7)
GRAND_STAFF_ROOT_DIR = _env_path("ACAI_GRAND_STAFF_ROOT", "data/grandstaff-lmx.2024-02-12/grandstaff-lmx")
PRIMUS_PREPARED_ROOT_DIR = _env_path("ACAI_PRIMUS_ROOT", "data/primusPrepared")
DOREMI_PREPARED_ROOT_DIR = _env_path("ACAI_DOREMI_ROOT", "data/doReMiPrepared")
OLIMPIC_SYNTHETIC_ROOT_DIR = _env_path("ACAI_OLIMPIC_SYNTH_ROOT", "data/olimpic-1.0-synthetic.2024-02-12/olimpic-1.0-synthetic")
OLIMPIC_SCANNED_ROOT_DIR = _env_path("ACAI_OLIMPIC_SCAN_ROOT", "data/olimpic-1.0-scanned.2024-02-12/olimpic-1.0-scanned")

# Special LMX tokens (reference: acai_omr/config.py:12-14)
LMX_BOS_TOKEN = "<bos>"
LMX_EOS_TOKEN = "<eos>"
LMX_PAD_TOKEN = "<pad>"

# Vocabulary file: 227 LMX tokens, one per line, specials first.
LMX_VOCAB_PATH = _env_path("ACAI_LMX_VOCAB", str(REPO_ROOT / "lmx_vocab.txt"))

# Checkpoint landing spots (orbax directories rather than .pth files).
PRETRAINED_MAE_PATH = _env_path("ACAI_PRETRAINED_MAE", "mae_pre_train/pretrained_mae")
INFERENCE_VITOMR_PATH = _env_path("ACAI_INFERENCE_VITOMR", "tf_omr_train/vitomr")
DEBUG_PRETRAINED_MAE_PATH = _env_path("ACAI_DEBUG_MAE", "debug_pretrained_mae")
DEBUG_TEACHER_FORCED_PATH = _env_path("ACAI_DEBUG_VITOMR", "debug_teacher_forced_omr_train/debug_vitomr")

# Model shape constants shared by training + inference (reference:
# acai_omr/train/pre_train.py:16-22, omr_teacher_force_train.py:24-27).
PATCH_SIZE = 16
PE_MAX_HEIGHT = 60
PE_MAX_WIDTH = 200
MAE_MAX_SEQ_LEN = 512       # encoder patch budget during MAE pretraining
OMR_MAX_IMG_SEQ_LEN = 1024  # encoder patch budget during seq2seq training/inference
MAX_LMX_SEQ_LEN = 1536      # decoder token budget
NUM_CHANNELS = 1            # sheet-music images are grayscale

# Static shape-bucket granularity: every padded sequence length fed to a jitted
# program is rounded up to a multiple of this, bounding the number of compiled
# programs (TPU-native replacement for torch.nested ragged batches).
SEQ_BUCKET_MULTIPLE = 128
