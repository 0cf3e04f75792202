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
    # Synchronous compile: raises on any signature/shape mismatch. The
    # production path runs this same call in a daemon thread.
    rt._compile_phases(packed, (next_bucket, rcfg.pair_cap), {})

    # The thread wrapper swallows exceptions by design — verify the direct
    # lowering really produced executables for ALL THREE programs.
    from splatam_tpu.slam import steps

    (t_args, t_kwargs), (m_args, m_kwargs), (d_args, d_kwargs) = packed
    assert steps.tracking_phase.lower(*t_args, **t_kwargs).compile() is not None
    assert steps.mapping_phase.lower(*m_args, **m_kwargs).compile() is not None
    assert steps.densify_step.lower(*d_args, **d_kwargs).compile() is not None
