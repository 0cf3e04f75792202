#!/bin/bash
# Capture a NeRFCapture stream to disk (no SLAM).
sudo sysctl -w net.core.rmem_max=2147483647 2>/dev/null || true
python3 -u scripts/nerfcapture2dataset.py --config ${1:-configs/iphone/dataset.py}
