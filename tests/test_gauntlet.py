"""Micro-gauntlet as a CI gate (VERDICT r2 item 5).

A 30-frame 160x120 clean run of the full SLAM loop with FULL tracking
(never gt poses) and hard ATE/PSNR floors, so a tracking-accuracy
regression fails `pytest -m slow` instead of waiting for someone to run
scripts/gauntlet.py on a TPU. scripts/gauntlet.py remains the full gate
(120 frames, 320x240, clean + noise variants).

Calibration (CPU, rebin 8, 60 tracking iters, 2026-08): ATE 2.633 cm,
PSNR 37.87. Floors sit ~25% above/below. Falsifiability check (run once):
track_iters=3 gives ATE 14.71 cm / PSNR 21.77 — both floors trip. Note
tracking cam lrs x10 IMPROVES this variant (ATE 1.48 cm): the synthetic
box sequence's fast motion (motion_scale 2) is under-served by the
reference lrs, so an lr regression must be probed downward, not upward.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ATE_FLOOR_CM = 3.3
PSNR_FLOOR = 35.0

# Micro-scan (39-frame, 3-leg revisiting trajectory at motion_scale 1.0 —
# the 2.0 default's apex velocity reversal breaks tracking at 160x120;
# measured ATE 10.7 cm, a resolution artifact the full 320x240 scan does
# not show). Calibration on TPU v5e (2026-08): ATE 1.295 cm, PSNR 42.2 —
# noise-dominated at this tiny resolution (legs of 13 frames bake almost
# no drift). Floors ~35% out. Guards the revisit/re-densification path
# the clean micro-gauntlet never exercises; the official revisit record
# is the 120-frame scan variant (GAUNTLET.md round-4 addendum).
SCAN_ATE_FLOOR_CM = 1.8
SCAN_PSNR_FLOOR = 37.0


@pytest.mark.slow
@pytest.mark.gauntlet
def test_micro_gauntlet_tracking_quality(tmp_path):
    from scripts.gauntlet import run_variant

    m = run_variant(
        "clean", frames=30, h=120, w=160, rebin=8,
        workdir=str(tmp_path), track_iters=60,
    )
    ate_cm = m["ate_rmse"] * 100
    assert ate_cm < ATE_FLOOR_CM, (
        f"micro-gauntlet ATE {ate_cm:.3f} cm breached the {ATE_FLOOR_CM} cm "
        "floor — tracking accuracy regressed"
    )
    assert m["psnr"] >= PSNR_FLOOR, (
        f"micro-gauntlet PSNR {m['psnr']:.2f} under the {PSNR_FLOOR} floor — "
        "map quality regressed"
    )


@pytest.mark.slow
@pytest.mark.gauntlet
def test_micro_gauntlet_scan_revisit(tmp_path):
    from scripts.gauntlet import run_variant

    m = run_variant(
        "scan", frames=39, h=120, w=160, rebin=8,
        workdir=str(tmp_path), track_iters=60,
        overrides={"data": {"motion_scale": 1.0}},
    )
    ate_cm = m["ate_rmse"] * 100
    assert ate_cm < SCAN_ATE_FLOOR_CM, (
        f"micro-scan ATE {ate_cm:.3f} cm breached the {SCAN_ATE_FLOOR_CM} cm "
        "floor — revisit re-localization regressed"
    )
    assert m["psnr"] >= SCAN_PSNR_FLOOR, (
        f"micro-scan PSNR {m['psnr']:.2f} under the {SCAN_PSNR_FLOOR} floor — "
        "revisit ghosting grew beyond the calibrated level"
    )
