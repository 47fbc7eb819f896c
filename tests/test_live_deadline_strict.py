"""Strict live-path latency gate, isolated from suite contention (round 5).

Round-4 relaxed the in-suite interactive-playout deadline assert to 3x the
2.9 ms budget because the parallel full-suite run flakes it under CPU
contention (commit a8b5b6a) — which left the production live path without
an enforced latency regression gate in CI.  This test restores the strict
gate by running the measurement in its OWN SUBPROCESS (fresh interpreter,
no competing test threads), using the bench_live_block methodology: the
crossfade-worst-case single-block loop through StreamingSpatializer on the
host CPU platform (the live path's production placement per the
`jefferson-rt --device auto` policy; reference budget anchor:
Jefferson README.md:23, 128 samples @ 44.1 kHz = 2.902 ms).

The gate: MEDIAN block time < 1x budget (the realtime criterion the
reference design meets on its accelerator), p90 < 2x budget (allows the
occasional scheduler blip that any non-RT kernel shows without letting a
regressed engine pass).  The relaxed 3x average assert in test_control.py
remains the in-suite smoke check.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest


WORKER = textwrap.dedent(
    """
    import json, sys, time
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.stream import StreamingSpatializer

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    spat = StreamingSpatializer(db, cfg)
    rng = np.random.default_rng(0)
    blk = (rng.standard_normal(cfg.frames_per_buffer) * 0.2).astype(np.float32)
    spat.prime()
    # warm the crossfade program too (first moved block compiles a second
    # variant on some backends)
    spat.set_position(azi=3, ele=10, r=1.0)
    spat.process_block(blk)
    n = 200
    times = np.empty(n)
    for i in range(n):
        spat.set_position(azi=(i * 3) % 360, ele=10, r=1.0)  # xfade every block
        t0 = time.perf_counter()
        spat.process_block(blk)
        times[i] = time.perf_counter() - t0
    ms = times * 1e3
    print(json.dumps({
        "budget_ms": 1e3 * cfg.block_duration,
        "median_ms": float(np.percentile(ms, 50)),
        "p90_ms": float(np.percentile(ms, 90)),
        "avg_ms": float(ms.mean()),
        "max_ms": float(ms.max()),
    }))
    """
)


def _measure() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # belt; the worker also forces via jax.config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", WORKER],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_live_block_deadline_strict():
    # The subprocess isolates the measurement from in-process test threads,
    # not from other CPU hogs: under pytest-xdist the worker shares cores
    # with N concurrent test processes — exactly the contention that made
    # round 4 relax the in-suite gate.  The strict gate is only meaningful
    # on a serial run; the relaxed 3x assert in test_control.py still covers
    # xdist runs.
    if os.environ.get("PYTEST_XDIST_WORKER"):
        pytest.skip("strict latency gate requires a serial (non-xdist) run")
    stats = _measure()
    budget = stats["budget_ms"]
    if stats["median_ms"] >= budget or stats["p90_ms"] >= 2 * budget:
        # one remeasure absorbs a transient host-load spike (CI neighbors);
        # a genuinely regressed engine fails both runs
        stats = _measure()
    # the realtime criterion: a typical block renders inside the budget
    assert stats["median_ms"] < budget, stats
    # tail tolerance for non-RT scheduling, still catches engine regressions
    assert stats["p90_ms"] < 2 * budget, stats
