"""Scaled benchmarkTesting: the reference's 4-scenario azimuth-sweep gate
(reference: Jefferson/src/precision_test.cu:2154-2201) at reduced block
counts for CI speed; the full 172x72 run is `python -m jefferson_tpu.bench.sweep`."""

import numpy as np

from jefferson_tpu.bench.sweep import SCENARIOS, run_benchmark_sweep
from jefferson_tpu.engine.renderer import Renderer


def test_four_scenario_sweep_fft_backend(db, config, castanets):
    """FFT-vs-FFT comparison holds the reference's own 2e-7 gate."""
    reports = run_benchmark_sweep(
        castanets,
        db,
        config,
        blocks_per_step=12,
        num_steps=24,
        eps=2e-7,
        renderer=Renderer(db, config, chunk_blocks=128, backend="fft"),
    )
    for (azi, ele), rep in zip(SCENARIOS, reports):
        assert rep.ok, f"scenario ({azi},{ele}): {rep}"


def test_four_scenario_sweep_matmul_backend(db, config, castanets):
    """The MXU DFT-matmul backend holds the reference's own 2e-7 gate even
    across transform algorithms (measured worst 8.2e-8 here, 1.19e-7 on the
    real chip's full-scale sweep — PERF.md)."""
    reports = run_benchmark_sweep(
        castanets,
        db,
        config,
        blocks_per_step=12,
        num_steps=24,
        eps=2e-7,
        renderer=Renderer(db, config, chunk_blocks=128, backend="matmul"),
    )
    for (azi, ele), rep in zip(SCENARIOS, reports):
        assert rep.ok and rep.rms < 2e-8, f"scenario ({azi},{ele}): {rep}"


def test_sweep_wraps_azimuth(config):
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    t = AzimuthSweep(start_azi=350, step_deg=5, blocks_per_step=2, num_steps=4)
    pos = t.sample(t.total_blocks, config)
    azis = pos[::2, 0]
    np.testing.assert_array_equal(azis, [350, 355, 0, 5, 10])
