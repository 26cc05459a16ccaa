#!/usr/bin/env bash
# busca_tpu launcher for ByteTrack(+BUSCA) — mirrors the reference
# scripts/run_bytetrack.sh flag surface over busca_tpu.eval.run.
TRACKER_NAME="ByteTrack"
TRACKER_FLAG="byte"
DETECTOR_FLAGS="--detector yolox-x"
source "$(dirname "${BASH_SOURCE[0]}")/_run_common.sh"
