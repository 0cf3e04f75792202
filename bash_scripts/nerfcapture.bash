#!/bin/bash
# End-to-end iPhone capture -> offline SLAM -> viz (reference
# bash_scripts/nerfcapture.bash): capture a NeRFCapture stream to disk,
# run SplaTAM on it, then open the final reconstruction viewer.
if [ "$#" -ne 1 ]; then
    echo "Usage: bash_scripts/nerfcapture.bash <config_file>"
    exit 1
fi
if [ ! -f "$1" ]; then
    echo "Config file not found!"
    exit 1
fi

# DDS over WiFi needs large socket buffers for the raw RGB-D frames.
for key in net.core.rmem_max net.core.wmem_max; do
    if [ "$(sysctl -n $key 2>/dev/null)" != "2147483647" ]; then
        echo "Setting $key to 2147483647"
        sudo sysctl -w $key=2147483647 || true
    fi
done

python3 scripts/nerfcapture2dataset.py --config "$1"
python3 scripts/splatam.py "$1"
python3 viz_scripts/final_recon.py "$1"
