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


def test_negative_azimuth_wraps(config):
    """azi=-90 must mean 90 deg left (270), not collapse onto the azi-0
    filter via pick_hrtf's wrap-free scan (review finding)."""
    import numpy as np

    from jefferson_tpu.trajectory.trajectory import PositionEvents, StaticPosition

    a = StaticPosition(azi=-90.0, ele=0.0, r=1.0).sample(4, config)
    b = StaticPosition(azi=270.0, ele=0.0, r=1.0).sample(4, config)
    np.testing.assert_array_equal(a, b)
    ev = PositionEvents([(0.0, -45.0, 10.0, 1.0)]).sample(3, config)
    assert np.all(ev[:, 0] == 315.0)
    # >= 360 is deliberately untouched: rounding to 360 then snapping to
    # the 355 filter is contract
    c = StaticPosition(azi=359.7, ele=0.0, r=1.0).sample(1, config)
    assert c[0, 0] == 359.7


def test_orbit_zero_period_rejected(config):
    import pytest

    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    with pytest.raises(ValueError, match="period_s"):
        CircularOrbit(period_s=0.0).sample(4, config)


def test_cartesian_trajectory_uses_true_radius(config):
    """LinearPath (a cartesian drive) must give the planner a radius whose
    quirky round-trip lands on the TRUE |xyz| — matching the live
    set_position_cartesian path, not the spherical-drive inflation of
    r*sqrt(1+sin^2 ele) (review finding)."""
    import numpy as np

    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.trajectory.spatial import (
        radius_from_cartesian,
        spherical_to_cartesian,
    )
    from jefferson_tpu.trajectory.trajectory import LinearPath

    # overhead flyby: high elevation is where the quirk factor bites
    xyz_true = np.array([0.3, 1.2, -0.3], np.float64)
    pos = LinearPath(tuple(xyz_true), tuple(xyz_true), 1.0).sample(4, config)
    # the planner's reconstruction (same ops make_plan uses)
    coords = spherical_to_cartesian(pos[:, 0], pos[:, 1], pos[:, 2])
    eff_r = radius_from_cartesian(coords)
    true_r = float(np.sqrt((xyz_true**2).sum()))
    np.testing.assert_allclose(eff_r, true_r, rtol=1e-5)
    # and the full plan carries it into the distance triple
    plan = make_plan(pos, config)
    assert plan.u_hi.shape[0] == 4
