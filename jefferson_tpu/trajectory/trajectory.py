"""Trajectory engine: per-block source positions for offline rendering.

The reference's source positions come from the GLUT UI or a scripted sleep
loop (reference: Jefferson/src/graphics.cu:487-601, Jefferson/src/main.cu:101-148
DEBUGMODE 2).  Here trajectories are first-class objects sampled once per
128-sample block; the plan layer applies the reference's degree-rounding and
crossfade-on-change semantics, so a moving trajectory produces exactly the
reference's per-block filter switches.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig
from .spatial import cartesian_to_spherical


class Trajectory:
    """Base: sample per-block (azi_deg, ele_deg, r) positions."""

    def sample(self, num_blocks: int, config: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
        raise NotImplementedError

    def _times(self, num_blocks: int, config: EngineConfig) -> np.ndarray:
        """Start time of each block in seconds."""
        return np.arange(num_blocks) * config.block_duration


@dataclasses.dataclass
class StaticPosition(Trajectory):
    """Fixed source (BASELINE config 1)."""

    azi: float = 0.0
    ele: float = 0.0
    r: float = 0.5

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        out = np.empty((num_blocks, 3), dtype=np.float64)
        out[:] = (self.azi, self.ele, self.r)
        return out


@dataclasses.dataclass
class PositionEvents(Trajectory):
    """Piecewise-constant position changes at given times (the DEBUGMODE-2
    scripted sequence as data, reference: Jefferson/src/main.cu:101-148).

    events: sequence of (time_sec, azi, ele, r); position holds until the
    next event.  A leading (0.0, ...) event sets the initial position.
    """

    events: Sequence[tuple[float, float, float, float]]

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        ev = sorted(self.events, key=lambda e: e[0])
        if not ev:
            raise ValueError("PositionEvents needs at least one event")
        t = self._times(num_blocks, config)
        times = np.array([e[0] for e in ev])
        vals = np.array([[e[1], e[2], e[3]] for e in ev], dtype=np.float64)
        idx = np.clip(np.searchsorted(times, t, side="right") - 1, 0, len(ev) - 1)
        return vals[idx]


@dataclasses.dataclass
class CircularOrbit(Trajectory):
    """Source orbiting the listener at constant elevation/radius."""

    period_s: float = 8.0
    ele: float = 0.0
    r: float = 1.0
    start_azi: float = 0.0
    direction: int = 1  # +1 clockwise (increasing azimuth)

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        t = self._times(num_blocks, config)
        azi = (self.start_azi + self.direction * 360.0 * t / self.period_s) % 360.0
        out = np.empty((num_blocks, 3), dtype=np.float64)
        out[:, 0] = azi
        out[:, 1] = self.ele
        out[:, 2] = self.r
        return out


@dataclasses.dataclass
class LinearPath(Trajectory):
    """Straight-line Cartesian flyby from start_xyz to end_xyz over duration_s,
    holding the end point afterwards.  Uses the reference's xyz->spherical
    conversion incl. rounding quirks (Jefferson/src/SoundSource.cu:20-36)."""

    start_xyz: tuple[float, float, float]
    end_xyz: tuple[float, float, float]
    duration_s: float

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        t = self._times(num_blocks, config)
        a = np.clip(t / max(self.duration_s, 1e-9), 0.0, 1.0)[:, None]
        xyz = (1 - a) * np.asarray(self.start_xyz) + a * np.asarray(self.end_xyz)
        azi, ele, r = cartesian_to_spherical(xyz)
        return np.stack([azi, ele, r], axis=-1).astype(np.float64)


@dataclasses.dataclass
class CartesianFunction(Trajectory):
    """Arbitrary xyz(t) callable -> spherical via the reference conversion."""

    fn: Callable[[np.ndarray], np.ndarray]  # (B,) times -> (B, 3) xyz

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        t = self._times(num_blocks, config)
        xyz = np.asarray(self.fn(t), dtype=np.float64)
        azi, ele, r = cartesian_to_spherical(xyz)
        return np.stack([azi, ele, r], axis=-1).astype(np.float64)


@dataclasses.dataclass
class AzimuthSweep(Trajectory):
    """The benchmarkTesting workload: hold a position for ``blocks_per_step``
    blocks, then step azimuth by ``step_deg``, for ``num_steps`` steps
    (reference: Jefferson/src/precision_test.cu:2093-2148 — 172 blocks per
    position, 72 5-degree steps)."""

    start_azi: float = 0.0
    ele: float = 0.0
    r: float = 0.5
    step_deg: float = 5.0
    blocks_per_step: int = 172
    num_steps: int = 72

    @property
    def total_blocks(self) -> int:
        return self.blocks_per_step * (self.num_steps + 1)

    def sample(self, num_blocks, config=DEFAULT_CONFIG):
        steps = np.arange(num_blocks) // self.blocks_per_step
        azi = (self.start_azi + steps * self.step_deg) % 360.0
        out = np.empty((num_blocks, 3), dtype=np.float64)
        out[:, 0] = azi
        out[:, 1] = self.ele
        out[:, 2] = self.r
        return out
