#!/bin/bash
# Launch a containerized environment with the repo mounted (TPU flavor of
# the reference's start_docker.bash). TPU runtimes are exposed through
# /dev/vfio + the libtpu shared library rather than the NVIDIA runtime.
IMAGE="${SPLATAM_TPU_IMAGE:-python:3.11-slim}"

docker run -it \
    --volume="$(pwd):/SplaTAM-TPU/" \
    --workdir /SplaTAM-TPU \
    --net=host \
    --privileged \
    --device=/dev/vfio:/dev/vfio \
    --env="PJRT_DEVICE=TPU" \
    --ulimit memlock=-1 \
    --ulimit stack=67108864 \
    --name splatam-tpu \
    "$IMAGE" \
    /bin/bash
