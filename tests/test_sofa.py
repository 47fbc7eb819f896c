"""SOFA loader: grid snapping, conventions, format detection."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position, load_database
from jefferson_tpu.hrtf.sofa import load_sofa


def _write_sofa(path, ir, azi_engine, ele, sr=44100.0):
    """Minimal SimpleFreeFieldHRIR file; azi given in ENGINE convention."""
    sofa_azi = np.mod(-np.asarray(azi_engine, np.float64), 360.0)
    pos = np.stack([sofa_azi, np.asarray(ele, np.float64), np.full(len(ir), 1.4)], axis=1)
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=ir.astype(np.float64))
        f.create_dataset("Data.SamplingRate", data=np.array([sr]))
        d = f.create_dataset("SourcePosition", data=pos)
        d.attrs["Type"] = np.bytes_("spherical")


def test_sofa_roundtrip_exact_grid(db, config, tmp_path):
    """A SOFA file sampled exactly on the KEMAR grid loads bit-identically."""
    taps = db.hrirs[:, :, : config.hrtf_len]
    eles, azis = zip(*(grid_position(i) for i in range(NUM_HRTF)))
    path = tmp_path / "grid.sofa"
    _write_sofa(path, taps, np.asarray(azis), np.asarray(eles))
    loaded = load_sofa(path, config)
    np.testing.assert_array_equal(loaded.hrirs, db.hrirs)
    np.testing.assert_array_equal(loaded.spectra, db.spectra)
    assert loaded.source.startswith("sofa:")


def test_sofa_nearest_snapping(db, config, tmp_path):
    """Sparse measurements: every grid point takes its nearest neighbor."""
    # 4 measurements at cardinal directions
    taps = np.zeros((4, 2, config.hrtf_len), np.float32)
    for i in range(4):
        taps[i, :, i] = 1.0  # delta at tap i identifies the measurement
    path = tmp_path / "sparse.sofa"
    _write_sofa(path, taps, [0.0, 90.0, 180.0, 270.0], [0.0] * 4)
    loaded = load_sofa(path, config)
    # grid point at azi ~92, ele 0 must pick measurement 1 (engine azi 90)
    from jefferson_tpu.hrtf.kemar import pick_hrtf

    idx = int(pick_hrtf(0.0, 90.0))
    assert loaded.hrirs[idx, 0, 1] == 1.0
    idx180 = int(pick_hrtf(0.0, 180.0))
    assert loaded.hrirs[idx180, 0, 2] == 1.0


def test_load_database_detects_sofa(db, config, tmp_path):
    taps = db.hrirs[:, :, : config.hrtf_len]
    eles, azis = zip(*(grid_position(i) for i in range(NUM_HRTF)))
    path = tmp_path / "set.sofa"
    _write_sofa(path, taps, np.asarray(azis), np.asarray(eles))
    loaded = load_database(path, config)
    np.testing.assert_array_equal(loaded.hrirs, db.hrirs)


def test_sofa_resamples_foreign_rate(db, config, tmp_path):
    """A 48 kHz SOFA set is resampled to the engine rate on load."""
    from jefferson_tpu.io.resample import resample

    taps = db.hrirs[:8, :, : config.hrtf_len]
    # upsample the reference taps to 48k to build the foreign-rate file
    up = np.stack([
        np.stack([resample(taps[i, c], config.sample_rate, 48000) for c in range(2)])
        for i in range(8)
    ])
    eles, azis = zip(*(grid_position(i) for i in range(8)))
    path = tmp_path / "48k.sofa"
    _write_sofa(path, up, np.asarray(azis), np.asarray(eles), sr=48000.0)
    loaded = load_sofa(path, config)
    assert loaded.hrirs.shape == (710, 2, config.pad_len)
    # round-tripped filters stay close to the originals at the written points
    for i in range(8):
        a = loaded.hrirs[i, 0, : config.hrtf_len]
        b = taps[i, 0]
        denom = float(np.linalg.norm(b)) or 1.0
        assert np.linalg.norm(a - b) / denom < 0.2, i


def test_sofa_rejects_bad_files(config, tmp_path):
    path = tmp_path / "bad.sofa"
    with h5py.File(path, "w") as f:
        f.create_dataset("other", data=np.zeros(3))
    with pytest.raises(ValueError, match="SimpleFreeFieldHRIR"):
        load_sofa(path, config)

    path2 = tmp_path / "mono.sofa"
    _write_sofa(path2, np.zeros((2, 1, 64)), [0.0, 90.0], [0.0, 0.0])
    with pytest.raises(ValueError, match="2-receiver"):
        load_sofa(path2, config)
