#!/bin/bash
# Download the TUM-RGBD sequences used by the benchmark configs.
mkdir -p data/TUM_RGBD
cd data/TUM_RGBD
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg1_desk2 \
           rgbd_dataset_freiburg1_room rgbd_dataset_freiburg2_xyz \
           rgbd_dataset_freiburg3_long_office_household
do
    wget https://cvg.cit.tum.de/rgbd/dataset/${seq%%_*}/${seq}.tgz || \
    wget https://vision.in.tum.de/rgbd/dataset/freiburg1/${seq}.tgz || true
    tar -xvzf ${seq}.tgz
done
