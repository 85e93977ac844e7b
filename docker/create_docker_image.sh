#!/bin/bash
#
# Build the ddpm-ood-tpu image (parity with the reference's
# docker/create_docker_image.sh).
#
# $ ./create_docker_image.sh
set -ex
TAG=ddpm-ood-tpu

cd "$(dirname "$0")/.."
docker build --tag "${USER}:${TAG}" -f docker/Dockerfile . \
  --build-arg USER_ID="$(id -u)" \
  --build-arg GROUP_ID="$(id -g)" \
  --build-arg USER="${USER}"
