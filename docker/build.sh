#!/usr/bin/env bash
# Build the busca_tpu image (the reference's build.sh role).
#   ./docker/build.sh            # CPU-fallback image (CI / laptops)
#   ./docker/build.sh tpu        # Cloud TPU VM image (jax[tpu] wheel)
set -euo pipefail
cd "$(dirname "$0")/.."
TAG=${TAG:-busca-tpu}
if [[ "${1:-cpu}" == "tpu" ]]; then
  docker build --build-arg 'JAX_SPEC=jax[tpu]==0.9.0' -t "$TAG" .
else
  docker build -t "$TAG" .
fi
