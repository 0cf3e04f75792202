"""Persistent-compile-cache contract: a second process running the same
tiny SLAM config against the same cache dir must compile NOTHING new.

BENCH_r03 showed frame 0 still costing ~52 s despite utils/compcache.py —
either the cache didn't survive the driver's process boundary or the shapes
changed. This pins the process-boundary half: every XLA program a run needs
must be served from the persistent cache on the second run (the cache
writes one entry per fresh compile — jax_persistent_cache_min_compile_time
is 0 — so "no new files" == "no fresh compiles").
"""
import json
import os
import subprocess
import sys

import pytest


def _run_bench(env):
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_second_process_compiles_nothing(tmp_path):
    cache = tmp_path / "xla_cache"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        SPLATAM_COMP_CACHE=str(cache),
        BENCH_H="48", BENCH_W="64", BENCH_FRAMES="3", BENCH_WARMUP="1",
    )
    env.pop("XLA_FLAGS", None)

    r1 = _run_bench(env)
    files1 = sorted(os.listdir(cache))
    assert files1, "first run wrote no cache entries"

    r2 = _run_bench(env)
    files2 = sorted(os.listdir(cache))
    new = set(files2) - set(files1)
    assert not new, f"second run compiled {len(new)} new programs: {sorted(new)[:5]}"
    # And the warm run's cold-start frame must be far below the cold run's.
    assert r2["frame0_s"] <= max(0.5 * r1["frame0_s"], 5.0), (r1, r2)
