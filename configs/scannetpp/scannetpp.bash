#!/bin/bash
# ScanNet++ sweep over both scenes.
for scene in 0 1
do
    export SCENE=${scene}
    echo "Running scene number ${SCENE}"
    python3 -u scripts/splatam.py configs/scannetpp/splatam.py
done
