"""Async phase-program precompile: the ShapeDtypeStruct arg trees built by
SLAMRuntime._build_precompile_args must stay in lock-step with the
tracking_phase / mapping_phase jit signatures (pipeline.py), or the
background compiles silently stop hiding ladder-crossing recompiles."""
import pytest

from tests.test_slam_pipeline import small_config
from splatam_tpu.slam.config import seed_everything


@pytest.mark.slow
def test_precompile_args_match_phase_signatures(tmp_path):
    from splatam_tpu.slam.pipeline import SLAMRuntime

    seed_everything(0)
    config = small_config(tmp_path)
    config["tpu"]["rebin_every"] = 4  # exercise the reuse_structures arg set
    rt = SLAMRuntime(config)

    next_bucket = rt._bucket(rt.gm.capacity)
    rcfg = rt._phase_rcfg(next_bucket, next_bucket)
    packed = rt._build_precompile_args(next_bucket, rcfg)
    # Synchronous compile of every packed program: raises on any signature/
    # shape mismatch (the production path runs these in daemon threads via
    # _spawn_precompile, which swallows exceptions by design). All three
    # phase programs must be present in the pack.
    from splatam_tpu.slam import steps

    fns = [fn for fn, _, _ in packed]
    assert steps.tracking_phase in fns
    assert steps.mapping_phase in fns
    assert steps.densify_step in fns
    for fn, args, kwargs in packed:
        assert fn.lower(*args, **kwargs).compile() is not None
