#!/bin/bash
# Download the NICE-SLAM-processed Replica RGB-D sequences.
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
