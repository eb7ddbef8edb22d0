#!/usr/bin/env bash
# Fresh-machine setup for the TPU stack (parity with the reference's
# new_machine_setup.sh, adapted from poetry/CUDA to a TPU VM).
set -euo pipefail

sudo apt-get update
# musescore3 + imagemagick power the MusicXML -> preview-image rendering
# (inference/vitomr_inference.py convert_back_to_img); optional.
sudo apt-get install -y python3.12-venv build-essential nginx musescore3 imagemagick || true

python3 -m venv .venv
source .venv/bin/activate
pip install -U pip
# jax[tpu] pinned by the host image on TPU VMs; elsewhere:
pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || pip install jax
pip install optax orbax-checkpoint flax einops numpy pandas pillow pytest gunicorn

make -C native    # C++ kernels (TEDn, image preprocessing)
python -m pytest tests/ -q
