"""SOFA (AES69) HRTF loader — modern datasets onto the engine's KEMAR grid.

The reference only reads the 1994 MIT KEMAR WAV trees (reference:
Jefferson/src/hrtf_signals.cu:124-133); virtually every HRTF set published
since (HUTUBS, SADIE II, ARI, personalizations) ships as SOFA
`SimpleFreeFieldHRIR` files instead.  SOFA is netCDF-4, i.e. HDF5, so it is
read here directly with h5py — no extra dependency.

Mapping: the engine's indexing (pick_hrtf, interpolation weights) is defined
on the fixed 710-point KEMAR grid, so the SOFA measurements are snapped onto
it — each grid direction takes the great-circle-nearest measurement's IR
pair, resampled to the engine rate and truncated/padded to hrtf_len.  This
keeps every parity-sensitive code path unchanged while opening the input
format.

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


def load_sofa(
    path: str | Path, config: EngineConfig = DEFAULT_CONFIG
) -> HRTFDatabase:
    """Load a SimpleFreeFieldHRIR SOFA file onto the KEMAR grid."""
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

    # nearest measurement per grid direction (great-circle = max dot product)
    nearest = np.argmax(grid @ meas.T, axis=1)  # (710,)
    taps = np.zeros((NUM_HRTF, 2, config.hrtf_len), np.float32)
    taps[:, :, :n_taps] = ir[nearest, :, :n_taps].astype(np.float32)
    return HRTFDatabase.from_hrirs(taps, config, source=f"sofa:{path.name}")
