#!/bin/bash
# ScanNet++ novel-view eval over both scenes (run after the SLAM sweep).
export USE_TRAIN_SPLIT=0
for scene in 0 1
do
    export SCENE=${scene}
    echo "Evaluating NVS for scene number ${SCENE}"
    python3 -u scripts/eval_novel_view.py configs/scannetpp/splatam.py
done
