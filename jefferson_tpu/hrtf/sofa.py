"""SOFA (AES69) HRTF loader — modern datasets onto the engine's KEMAR grid.

The reference only reads the 1994 MIT KEMAR WAV trees (reference:
Jefferson/src/hrtf_signals.cu:124-133); virtually every HRTF set published
since (HUTUBS, SADIE II, ARI, personalizations) ships as SOFA
`SimpleFreeFieldHRIR` files instead.  SOFA is netCDF-4, i.e. HDF5, so it is
read here directly with h5py — no extra dependency.

Mapping: the engine's indexing (pick_hrtf, interpolation weights) is defined
on the fixed 710-point KEMAR grid, so the SOFA measurements are mapped onto
it, resampled to the engine rate and truncated/padded to hrtf_len.  This
keeps every parity-sensitive code path unchanged while opening the input
format.  Two mappings (round 5, ``mapping=``):

  * ``"nearest"`` — each grid direction takes the great-circle-nearest
    measurement's IR pair.  Exact for sets sampled on (or denser than) the
    grid, but SPARSE personalized sets alias: adjacent grid points snap to
    the same measurement, flattening the direction dependence
    diff/personalize.py exists to recover.
  * ``"interp3"`` — each grid direction blends its 3 nearest measurements
    with inverse-angular-distance weights, DELAY-ALIGNED first (each IR's
    onset shifted to the weighted mean onset before the weighted sum, then
    the blend carries that mean delay) so ITD interpolates instead of
    comb-filtering.  Exact-direction hits (< 0.05 deg) still copy the
    measurement verbatim, so dense/grid-sampled sets are unchanged.

  ``"auto"`` (default) picks interp3 when the set is sparse relative to
  the grid (worst grid-to-nearest-measurement angle > 5 deg), else nearest.
  tests/test_sofa.py quantifies the aliasing the sparse case removes.

Coordinate conventions: SOFA spherical azimuth is counterclockwise from
ahead (+90 = left); the engine's is clockwise from ahead (+90 = right,
reference: Jefferson/src/SoundSource.cu:28-33), so azimuth is negated.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig
from .kemar import NUM_HRTF, HRTFDatabase, grid_position


def _unit(azi_deg: np.ndarray, ele_deg: np.ndarray) -> np.ndarray:
    """Direction unit vectors (engine convention) for angular distance."""
    a = np.deg2rad(np.asarray(azi_deg, np.float64))
    e = np.deg2rad(np.asarray(ele_deg, np.float64))
    return np.stack(
        [np.sin(a) * np.cos(e), np.sin(e), -np.cos(a) * np.cos(e)], axis=-1
    )


def _onset_delay(ir_pair: np.ndarray, frac: float = 0.2) -> int:
    """Onset sample of an IR pair: first index where the max-over-ears
    envelope reaches ``frac`` of its peak (0 for silent IRs)."""
    env = np.max(np.abs(ir_pair), axis=0)
    peak = env.max()
    if peak <= 0:
        return 0
    return int(np.argmax(env >= frac * peak))


def _shift(ir_pair: np.ndarray, k: int) -> np.ndarray:
    """Shift an IR pair by k samples (positive = later), zero-filled."""
    if k == 0:
        return ir_pair
    out = np.zeros_like(ir_pair)
    if k > 0:
        out[:, k:] = ir_pair[:, : ir_pair.shape[1] - k]
    else:
        out[:, :k] = ir_pair[:, -k:]
    return out


def _interp3_taps(ir: np.ndarray, meas: np.ndarray, grid: np.ndarray,
                  num: int, n_taps: int, hrtf_len: int) -> np.ndarray:
    """Delay-aligned 3-nearest inverse-angular-distance blend per grid dir."""
    k = min(3, len(meas))
    cosang = np.clip(grid @ meas.T, -1.0, 1.0)     # (710, M)
    order = np.argsort(-cosang, axis=1)[:, :k]     # nearest first
    ang = np.arccos(np.take_along_axis(cosang, order, axis=1))  # (710, k)
    onsets = np.array([_onset_delay(ir[m, :, :n_taps]) for m in range(len(ir))])
    taps = np.zeros((num, 2, hrtf_len), np.float32)
    exact = np.deg2rad(0.05)
    for g in range(num):
        idx, a = order[g], ang[g]
        if a[0] < exact or k == 1:  # exact hit (or single measurement)
            taps[g, :, :n_taps] = ir[idx[0], :, :n_taps]
            continue
        # inverse-SQUARE angular weights: measured on the synthetic smooth
        # field (tests/test_sofa.py generator, 30-deg rings) — 0.72x nearest
        # RMS vs 0.78x for inverse-linear; the sharper falloff matters when
        # the 3 neighbors sit at unequal distances
        w = 1.0 / np.maximum(a, 1e-6) ** 2
        w /= w.sum()
        d = onsets[idx]
        d_mean = int(round(float(w @ d)))
        acc = np.zeros((2, n_taps), np.float64)
        for j in range(k):
            acc += w[j] * _shift(ir[idx[j], :, :n_taps], d_mean - d[j])
        taps[g, :, :n_taps] = acc.astype(np.float32)
    return taps


def load_sofa(
    path: str | Path, config: EngineConfig = DEFAULT_CONFIG,
    mapping: str = "auto",
) -> HRTFDatabase:
    """Load a SimpleFreeFieldHRIR SOFA file onto the KEMAR grid.

    ``mapping``: "nearest" | "interp3" | "auto" (see module docstring)."""
    import h5py

    path = Path(path)
    with h5py.File(path, "r") as f:
        if "Data.IR" not in f or "SourcePosition" not in f:
            raise ValueError(f"{path} is not a SimpleFreeFieldHRIR SOFA file")
        ir = np.asarray(f["Data.IR"])  # (M, R, N)
        sr = float(np.asarray(f["Data.SamplingRate"]).ravel()[0])
        pos = np.asarray(f["SourcePosition"])  # (M, >=2): azi, ele[, r]
        pos_type = f["SourcePosition"].attrs.get("Type", b"spherical")
        if isinstance(pos_type, bytes):
            pos_type = pos_type.decode()
    if ir.ndim != 3 or ir.shape[1] != 2:
        raise ValueError(f"need 2-receiver HRIRs, got Data.IR shape {ir.shape}")
    if str(pos_type).lower() != "spherical":
        # 'cartesian' and 'spherical harmonics' rows are NOT (azi, ele)
        # angles; interpreting them as such would silently produce a
        # spatially-nonsense database
        raise ValueError(f"unsupported SourcePosition type {pos_type!r} (need 'spherical')")

    # SOFA azimuth is CCW-positive (left); the engine's is CW-positive (right)
    src_azi = np.mod(-pos[:, 0], 360.0)
    src_ele = pos[:, 1]

    if sr != config.sample_rate:
        from ..io.resample import resample

        m, r, n = ir.shape
        flat = ir.reshape(m * r, n)
        res = np.stack(
            [resample(row.astype(np.float32), int(sr), config.sample_rate) for row in flat]
        )
        ir = res.reshape(m, r, -1)

    n_taps = min(ir.shape[-1], config.hrtf_len)
    meas = _unit(src_azi, src_ele)  # (M, 3)

    grid_e, grid_a = zip(*(grid_position(i) for i in range(NUM_HRTF)))
    grid = _unit(np.asarray(grid_a, np.float64), np.asarray(grid_e, np.float64))

    if mapping not in ("nearest", "interp3", "auto"):
        raise ValueError(f"unknown SOFA mapping {mapping!r}")
    cosang = np.clip(grid @ meas.T, -1.0, 1.0)
    if mapping == "auto":
        # sparse set: some grid direction sits > 5 deg from every
        # measurement — nearest-snap would alias (adjacent grid points
        # collapsing onto one measurement); dense sets keep exact snapping
        worst = float(np.rad2deg(np.arccos(cosang.max(axis=1).min())))
        mapping = "interp3" if worst > 5.0 else "nearest"

    if mapping == "interp3":
        taps = _interp3_taps(
            ir.astype(np.float64), meas, grid, NUM_HRTF, n_taps, config.hrtf_len
        )
    else:
        # nearest measurement per grid direction (great-circle = max dot)
        nearest = np.argmax(cosang, axis=1)  # (710,)
        taps = np.zeros((NUM_HRTF, 2, config.hrtf_len), np.float32)
        taps[:, :, :n_taps] = ir[nearest, :, :n_taps].astype(np.float32)
    return HRTFDatabase.from_hrirs(
        taps, config, source=f"sofa:{path.name}:{mapping}"
    )
