#!/usr/bin/env bash
# busca_tpu launcher for StrongSORT(+BUSCA) — mirrors the reference
# scripts/run_strongsort.sh flag surface over busca_tpu.eval.run.
TRACKER_NAME="StrongSORT"
TRACKER_FLAG="strongsort"
DETECTOR_FLAGS=""
source "$(dirname "${BASH_SOURCE[0]}")/_run_common.sh"
