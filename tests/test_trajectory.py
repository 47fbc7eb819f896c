"""Trajectory class tests: sampling semantics of every trajectory type."""

import numpy as np
import pytest

from jefferson_tpu.trajectory.trajectory import (
    AzimuthSweep,
    CartesianFunction,
    CircularOrbit,
    LinearPath,
    PositionEvents,
    StaticPosition,
)


def test_static(config):
    pos = StaticPosition(azi=12, ele=-3, r=2.0).sample(5, config)
    np.testing.assert_array_equal(pos, np.tile([12, -3, 2.0], (5, 1)))


def test_events_hold_and_order(config):
    # out-of-order events are sorted; position holds until the next event
    t = PositionEvents([(0.01, 10, 0, 1), (0.0, 0, 0, 1), (0.02, 20, 5, 2)])
    blocks_per_10ms = int(round(0.01 / config.block_duration))
    pos = t.sample(12, config)
    assert pos[0, 0] == 0
    assert pos[blocks_per_10ms + 1, 0] == 10
    assert pos[-1, 0] == 20 and pos[-1, 1] == 5 and pos[-1, 2] == 2


def test_events_before_first(config):
    # sampling before the first event clamps to it
    t = PositionEvents([(1.0, 45, 0, 1)])
    pos = t.sample(3, config)
    np.testing.assert_array_equal(pos[:, 0], [45, 45, 45])


def test_orbit_direction_and_wrap(config):
    cw = CircularOrbit(period_s=1.0, start_azi=350).sample(400, config)
    assert cw[0, 0] == 350
    assert np.all(cw[:, 0] < 360) and np.all(cw[:, 0] >= 0)
    ccw = CircularOrbit(period_s=1.0, start_azi=10, direction=-1).sample(10, config)
    assert ccw[1, 0] < 10  # azimuth decreasing


def test_linear_path_holds_endpoint(config):
    t = LinearPath((0, 0, -1), (1, 0, 0), duration_s=0.01)
    blocks = int(round(0.02 / config.block_duration))
    pos = t.sample(blocks, config)
    # starts ahead (azi 0), ends right (azi 270 for +x in the reference convention)
    assert pos[0, 0] == 0
    assert pos[-1, 0] == 270
    # endpoint held after duration
    np.testing.assert_array_equal(pos[-1], pos[-2])


def test_cartesian_function(config):
    t = CartesianFunction(lambda ts: np.stack([np.zeros_like(ts), np.zeros_like(ts), -1 - ts], -1))
    pos = t.sample(4, config)
    np.testing.assert_array_equal(pos[:, 0], 0)  # always straight ahead
    assert pos[-1, 2] > pos[0, 2]  # receding


def test_sweep_total_blocks(config):
    t = AzimuthSweep(blocks_per_step=3, num_steps=4)
    assert t.total_blocks == 15
    pos = t.sample(t.total_blocks, config)
    assert len(np.unique(pos[:, 0])) == 5
