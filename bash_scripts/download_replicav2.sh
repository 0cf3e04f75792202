#!/bin/bash
# Fetch the Replica-V2 (vMAP) capture used by configs/replica_v2.
# Mirrors the reference's download_replicav2.sh source URL.
set -e
mkdir -p data
cd data
wget https://huggingface.co/datasets/kxic/vMAP/resolve/main/vmap.zip
unzip vmap.zip
mkdir -p replica_v2
mv vmap/* replica_v2/
