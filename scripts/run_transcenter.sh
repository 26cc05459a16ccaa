#!/usr/bin/env bash
# busca_tpu launcher for TransCenter(+BUSCA) — mirrors the reference
# scripts/run_transcenter.sh flag surface over busca_tpu.eval.run.
TRACKER_NAME="TransCenter"
TRACKER_FLAG="transcenter"
DETECTOR_FLAGS="--detector transcenter"
source "$(dirname "${BASH_SOURCE[0]}")/_run_common.sh"
