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
