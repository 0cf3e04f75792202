"""MetricsLogger: wandb-compatible stream with JSONL fallback."""
import json
import os

from splatam_tpu.utils.logging import MetricsLogger, report_loss


def test_disabled_logger_is_noop(tmp_path):
    lg = MetricsLogger(False, {}, str(tmp_path))
    lg.log({"x": 1.0})
    lg.finish()
    assert not os.path.exists(tmp_path / "wandb_fallback.jsonl")


def test_jsonl_fallback_stream(tmp_path):
    lg = MetricsLogger(True, {"seed": 0}, str(tmp_path))
    step = 0
    for i in range(3):
        step = report_loss(
            lg, {"loss": 1.0 / (i + 1), "im": 0.1, "depth": 0.2}, step,
            tracking=True,
        )
    lg.log({"Mapping/Number of Gaussians": 1234, "Mapping/step": 7})
    lg.finish()
    path = tmp_path / "wandb_fallback.jsonl"
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 4
    assert lines[0]["Per Iteration Tracking/Loss"] == 1.0
    assert lines[2]["Per Iteration Tracking/step"] == 2
    assert lines[3]["Mapping/Number of Gaussians"] == 1234
    assert step == 3


def test_non_serializable_values_coerced(tmp_path):
    import numpy as np

    lg = MetricsLogger(True, {}, str(tmp_path))
    lg.log({"val": np.float32(2.5)})
    lg.finish()
    rec = json.loads(open(tmp_path / "wandb_fallback.jsonl").readline())
    assert rec["val"] == 2.5


def test_pair_margin_bump_logic():
    """Overflow retries grow the pairs-per-gaussian margin AND the pair_cap
    ceiling (a silent-drop ceiling turns one overflow into a densification
    death spiral); only the hard memory bound refuses."""
    from splatam_tpu.slam.pipeline import SLAMRuntime

    from splatam_tpu.core.camera import Camera

    rt = SLAMRuntime.__new__(SLAMRuntime)  # no full init needed
    rt.config = {"tpu": {"pair_cap": 1 << 20}}
    rt.pair_margin = 2.0
    rt.mesh = None  # single-chip: no per-shard budget translation
    rt.cam = Camera(height=340, width=600, fx=300.0, fy=300.0, cx=300.0,
                    cy=170.0)
    rt._pairs_seen = {}
    assert rt._bump_pair_margin(100_000, 50_000, 262_144, "tracking")
    assert rt.pair_margin >= 3.0  # (262k+50k)*1.15/100k or 1.5x
    # At the old ceiling: the ceiling itself grows and the retry proceeds.
    assert rt._bump_pair_margin(100_000, 500_000, 1 << 20, "tracking")
    assert rt.config["tpu"]["pair_cap"] > 1 << 20
    # Only the hard bound refuses.
    assert not rt._bump_pair_margin(100_000, 50_000, 1 << 23, "tracking")


def test_phase_rcfg_scales_with_margin():
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.slam.pipeline import SLAMRuntime

    from splatam_tpu.core.camera import Camera

    rt = SLAMRuntime.__new__(SLAMRuntime)
    rt.config = {"tpu": {"pair_cap": 1 << 21}}
    rt.rcfg = RenderConfig(backend="tiles", pair_cap=1 << 21, tile_k_max=512)
    rt.pair_margin = 2.0
    rt.mesh = None
    rt.cam = Camera(height=340, width=600, fx=300.0, fy=300.0, cx=300.0, cy=170.0)
    rt._tile_k_grown = {}
    rt._pairs_seen = {}
    rt._pair_rung_used = {}
    rt.measured_pair_budget = True
    base = rt._phase_rcfg(1 << 18, 200_000).pair_cap
    rt.pair_margin = 4.0
    assert rt._phase_rcfg(1 << 18, 200_000).pair_cap > base
