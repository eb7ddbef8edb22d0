#!/usr/bin/env bash
# Sync the dataset tree to a training host (reference: acai_omr/utils/
# copy_data_dir.sh — rsync of the data/ directory). Usage:
#   ./copy_data_dir.sh user@host:/path/to/dest [extra rsync args...]
set -euo pipefail

DEST=${1:?usage: copy_data_dir.sh user@host:/dest [rsync args...]}
shift || true
SRC_DIR=${DATA_DIR:-data}

rsync -avh --progress --partial "$@" "$SRC_DIR"/ "$DEST"/
