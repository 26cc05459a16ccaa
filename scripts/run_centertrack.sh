#!/usr/bin/env bash
# busca_tpu launcher for CenterTrack(+BUSCA) — mirrors the reference
# scripts/run_centertrack.sh flag surface over busca_tpu.eval.run.
TRACKER_NAME="CenterTrack"
TRACKER_FLAG="centertrack"
DETECTOR_FLAGS="--detector centertrack"
source "$(dirname "${BASH_SOURCE[0]}")/_run_common.sh"
