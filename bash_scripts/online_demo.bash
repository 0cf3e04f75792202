#!/bin/bash
# Live iPhone demo: raise socket buffers for DDS, then run the demo.
# Usage: bash bash_scripts/online_demo.bash configs/iphone/online_demo.py
sudo sysctl -w net.core.rmem_max=2147483647 2>/dev/null || true
sudo sysctl -w net.core.wmem_max=2147483647 2>/dev/null || true
python3 -u scripts/iphone_demo.py --config ${1:-configs/iphone/online_demo.py}
