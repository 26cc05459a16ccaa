#!/usr/bin/env bash
# Run the serving container (the reference's run_docker.sh role): unix
# socket shared via a bind mount, weights mounted read-only.
#   WEIGHTS=/path/to/npz ./docker/run_serve.sh --detector yolox-x \
#       --detector-ckpt /weights/yolox_x.npz
set -euo pipefail
TAG=${TAG:-busca-tpu}
SOCK_DIR=${SOCK_DIR:-/tmp/busca-serve}
WEIGHTS=${WEIGHTS:-$PWD/weights}
mkdir -p "$SOCK_DIR"
exec docker run --rm -it \
  ${TPU_FLAGS:---privileged} \
  -v "$SOCK_DIR":/sock \
  -v "$WEIGHTS":/weights:ro \
  "$TAG" --socket /sock/busca.sock "$@"
