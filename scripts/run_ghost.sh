#!/usr/bin/env bash
# busca_tpu launcher for GHOST(+BUSCA) — mirrors the reference
# scripts/run_ghost.sh flag surface over busca_tpu.eval.run.
TRACKER_NAME="GHOST"
TRACKER_FLAG="ghost"
DETECTOR_FLAGS=""
source "$(dirname "${BASH_SOURCE[0]}")/_run_common.sh"
