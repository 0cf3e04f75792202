"""Host-side SLAMRuntime helpers: bucket ladder shape and the pure-numpy
quaternion->w2c used by keyframe selection (which must stay in lock-step
with core.transforms.build_rotation's wxyz convention)."""
import numpy as np
import jax.numpy as jnp

from splatam_tpu.core.transforms import build_rotation
from splatam_tpu.slam.pipeline import _w2c_from_qt


class _BucketHost:
    """Minimal stand-in exposing SLAMRuntime._bucket's closure deps."""

    def __init__(self, capacity):
        class GM:
            pass

        self.gm = GM()
        self.gm.capacity = capacity

    from splatam_tpu.slam.pipeline import SLAMRuntime

    _bucket = SLAMRuntime._bucket


def test_bucket_ladder_monotone_and_covering():
    b = _BucketHost(1 << 22)
    prev = 0
    for n in range(1, 1 << 22, 37717):
        cur = b._bucket(n)
        assert cur >= n, (n, cur)  # bucket always covers the active set
        assert cur >= prev or cur == b.gm.capacity
        prev = cur
    # pow-4 rungs below 256k, 1.5x (4096-aligned) above
    assert b._bucket(4096) == 4096
    assert b._bucket(4097) == 16384
    assert b._bucket(262144) == 262144
    nxt = b._bucket(262145)
    assert 262144 * 1.5 <= nxt <= 262144 * 1.5 + 4096 and nxt % 4096 == 0
    # capacity cap
    small = _BucketHost(1 << 15)
    assert small._bucket(1 << 15) == 1 << 15
    assert small._bucket(30000) == 1 << 15


def test_numpy_w2c_matches_build_rotation():
    rng = np.random.default_rng(3)
    for _ in range(32):
        q = rng.normal(size=4).astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        w2c = _w2c_from_qt(q, t)
        qn = q / np.linalg.norm(q)
        R_ref = np.asarray(build_rotation(jnp.asarray(qn)[None]))[0]
        np.testing.assert_allclose(w2c[:3, :3], R_ref, atol=1e-6)
        np.testing.assert_allclose(w2c[:3, 3], t, atol=0)
        assert w2c[3, 3] == 1.0


def test_shutdown_drains_inflight_precompiles():
    """Regression for BENCH_r04 rc=134: a daemon background-compile thread
    still alive at interpreter exit aborted the process. shutdown() (and the
    module atexit hook _join_live_compiles) must block until every in-flight
    compile thread has finished and deregistered itself."""
    import threading
    import time as _time

    from splatam_tpu.slam import pipeline as P

    class _SlowLowered:
        def compile(self):
            _time.sleep(0.3)

    class _SlowFn:
        __name__ = "fake_phase"

        def lower(self, *a, **k):
            _time.sleep(0.2)
            return _SlowLowered()

    class _RT:
        _inflight: dict = {}
        shutdown = P.SLAMRuntime.shutdown

    rt = _RT()
    precompiled = {("k",)}
    fn = _SlowFn()
    ikey = (1 << 20, 1 << 21, "fake_phase", 0)
    th = threading.Thread(
        target=P.SLAMRuntime._compile_one,
        args=(fn, (), {}, ikey, ("k",), rt._inflight, precompiled),
        daemon=True,
    )
    rt._inflight[ikey] = th
    with P._LIVE_COMPILES_LOCK:
        P._LIVE_COMPILES.add(th)
    th.start()
    assert th.is_alive()

    rt.shutdown()  # must join, not return while the compile is running
    assert not th.is_alive()
    assert rt._inflight == {}

    P._join_live_compiles()  # atexit path: nothing live left behind
    with P._LIVE_COMPILES_LOCK:
        assert all(not t.is_alive() for t in P._LIVE_COMPILES)
    # the worker deregistered itself on completion
    with P._LIVE_COMPILES_LOCK:
        assert th not in P._LIVE_COMPILES


def test_bootstrap_mapping_budget_schedule():
    """mapping.bootstrap_num_iters applies for the first bootstrap_frames
    frames only (GAUNTLET.md round-5 mapping-budget A/B: front-loaded
    budget cuts early-map drift; leaving it on destabilizes the late
    map); absent keys mean the standard budget everywhere."""
    from splatam_tpu.slam.pipeline import _mapping_budget

    cfg = {"num_iters": 6, "bootstrap_num_iters": 12, "bootstrap_frames": 2}
    assert [_mapping_budget(cfg, t) for t in (0, 1, 2, 7)] == [12, 12, 6, 6]
    # keys absent -> standard budget for every frame
    assert [_mapping_budget({"num_iters": 6}, t) for t in (0, 5)] == [6, 6]
    # bootstrap_frames without bootstrap_num_iters -> no-op
    cfg2 = {"num_iters": 6, "bootstrap_frames": 3}
    assert _mapping_budget(cfg2, 0) == 6


def test_mapping_inputs_recency_weighting():
    """mapping.current_frame_prob biases the per-iteration keyframe draw
    toward the current frame; 0 (default) reproduces the reference's
    uniform draw over the selected window."""
    import numpy as np
    from splatam_tpu.slam.pipeline import SLAMRuntime

    class _Host:
        _mapping_inputs = SLAMRuntime._mapping_inputs

        def __init__(self, prob):
            self.config = {"mapping": {"current_frame_prob": prob},
                           "mapping_window_size": 4}
            self.kf_scratch_slot = 99
            self.keyframe_list = [
                {"id": i, "slot": i, "q": np.array([1, 0, 0, 0], np.float32),
                 "t": np.zeros(3, np.float32)} for i in range(3)
            ]
            self.cam_rots = {i: np.array([1, 0, 0, 0], np.float32)
                             for i in (0, 1, 2, 7)}
            self.cam_trans = {i: np.zeros(3, np.float32)
                              for i in (0, 1, 2, 7)}
            self.rebin_every = 1  # skip the structure-table tail

    np.random.seed(0)
    slots, _, _ = _Host(1.0)._mapping_inputs(7, [0, 1, 2, -1], 64)[:3]
    assert set(np.asarray(slots).tolist()) == {99}  # always current frame

    np.random.seed(0)
    slots0, _, _ = _Host(0.0)._mapping_inputs(7, [0, 1, 2, -1], 512)[:3]
    counts = np.bincount(np.asarray(slots0), minlength=100)
    # uniform over {0,1,2,current}: each ~128 of 512
    assert counts[99] > 64 and all(counts[i] > 64 for i in (0, 1, 2))
