"""HRTF database tests: grid tables, pick_hrtf parity with a scalar C-port,
loader layouts (full/compact with mirroring), spectra convention."""

import numpy as np
import pytest
import scipy.fft

from jefferson_tpu import EngineConfig, load_compact, load_database, load_full, pick_hrtf
from jefferson_tpu.hrtf import kemar
from jefferson_tpu.io.wavio import write_wav


def scalar_pick_hrtf(obj_ele: float, obj_azi: float) -> int:
    """Direct loop port of the reference scan (Jefferson/src/hrtf_signals.cu:20-51)
    used as an independent cross-check of the vectorized implementation."""
    obj_ele = np.float32(obj_ele)
    obj_azi = np.float32(obj_azi)
    obj_ele = np.float32(kemar.round_half_away(obj_ele / 10) * 10)
    dmin = 1e37
    ele_idx = 0
    for i in range(kemar.NUM_ELEV):
        d = abs(float(obj_ele) - float(kemar.ELEVATIONS[i]))
        if d < dmin:
            dmin = d
            ele_idx = i
    obj_azi = np.float32(kemar.round_half_away(obj_azi))
    dmin = 1e37
    hrtf_idx = 0
    n = int(kemar.AZIMUTH_COUNTS[ele_idx])
    for i in range(n):
        d = abs(float(obj_azi) - i * float(kemar.AZIMUTH_INC[ele_idx]))
        if d < dmin:
            dmin = d
            hrtf_idx = int(kemar.AZIMUTH_OFFSET[ele_idx]) + i
    return hrtf_idx


def test_grid_tables():
    assert kemar.NUM_HRTF == 710
    assert list(kemar.AZIMUTH_COUNTS) == [56, 60, 72, 72, 72, 72, 72, 60, 56, 45, 36, 24, 12, 1]
    # offsets as printed by the reference (hrtf_signals.cu:147-151)
    assert list(kemar.AZIMUTH_OFFSET) == [
        0, 56, 116, 188, 260, 332, 404, 476, 536, 592, 637, 673, 697, 709, 710,
    ]


def test_pick_hrtf_known_points():
    assert pick_hrtf(0, 0) == 260            # elev 0 row starts at 260
    assert pick_hrtf(0, 5) == 261
    assert pick_hrtf(90, 123) == 709          # single filter at the pole
    assert pick_hrtf(-40, 0) == 0
    # elevation snap: 4 deg -> 0 deg row; 5 deg -> 10 deg row (half away from zero)
    assert pick_hrtf(4, 0) == 260
    assert pick_hrtf(5, 0) == 332


def test_pick_hrtf_matches_scalar_port():
    rng = np.random.default_rng(3)
    eles = rng.uniform(-90, 100, 500)
    azis = rng.uniform(-5, 400, 500)
    got = pick_hrtf(eles, azis)
    want = np.array([scalar_pick_hrtf(e, a) for e, a in zip(eles, azis)])
    np.testing.assert_array_equal(got, want)
    # integer-degree positions (the engine's actual domain)
    eles = rng.integers(-40, 91, 500).astype(float)
    azis = rng.integers(0, 360, 500).astype(float)
    np.testing.assert_array_equal(
        pick_hrtf(eles, azis), [scalar_pick_hrtf(e, a) for e, a in zip(eles, azis)]
    )


def test_grid_position_roundtrip():
    for idx in [0, 55, 56, 260, 261, 331, 709]:
        ele, azi = kemar.grid_position(idx)
        assert pick_hrtf(ele, azi) == idx


def test_synthetic_database(db, config):
    assert db.hrirs.shape == (710, 2, config.pad_len)
    assert db.spectra.shape == (710, 2, config.num_bins)
    assert db.hrirs.dtype == np.float32 and db.spectra.dtype == np.complex64
    # taps land in the first hrtf_len samples, zero-padded after
    assert np.all(db.hrirs[:, :, config.hrtf_len :] == 0)
    # spectra are the unnormalized R2C FFT of the padded HRIRs
    want = scipy.fft.rfft(db.hrirs[17], axis=-1).astype(np.complex64)
    np.testing.assert_array_equal(db.spectra[17], want)


def _write_fake_kemar(root, layout, n_taps=32):
    """Tiny deterministic KEMAR trees in both layouts, mirror-consistent."""
    rng = np.random.default_rng(0)
    filters = {}
    for i in range(kemar.NUM_ELEV):
        ele = int(kemar.ELEVATIONS[i])
        (root / f"elev{ele}").mkdir(parents=True, exist_ok=True)
        for azi in kemar.AZIMUTH_GRIDS[i]:
            a = float(azi)
            name = int(kemar.round_half_away(min(a, 360.0 - a) if a > 180 else a))
            key = (ele, name)
            if key not in filters:
                filters[key] = rng.uniform(-0.5, 0.5, (n_taps, 2)).astype(np.float32)
    for (ele, name), taps in filters.items():
        if layout == "compact":
            write_wav(root / f"elev{ele}" / f"H{ele}e{name:03d}a.wav", taps, 44100, bits=16)
    if layout == "full":
        for i in range(kemar.NUM_ELEV):
            ele = int(kemar.ELEVATIONS[i])
            for azi in kemar.AZIMUTH_GRIDS[i]:
                a = float(azi)
                swap = a > 180.0
                name = int(kemar.round_half_away(360.0 - a if swap else a))
                src = filters[(ele, name)]
                lr = src[:, ::-1] if swap else src
                fname = int(kemar.round_half_away(a))
                write_wav(root / f"elev{ele}" / f"L{ele}e{fname:03d}a.wav", lr[:, 0], 44100, bits=16)
                write_wav(root / f"elev{ele}" / f"R{ele}e{fname:03d}a.wav", lr[:, 1], 44100, bits=16)
    return filters


def test_compact_loader_mirroring(tmp_path):
    root = tmp_path / "compact"
    _write_fake_kemar(root, "compact")
    db = load_compact(root)
    assert db.hrirs.shape[0] == 710
    # azi=0 at elev 0: index 260, no swap
    i_front = pick_hrtf(0, 0)
    # a mirrored pair on the elev-0 row (inc 5): azi=90 vs azi=270
    i90 = pick_hrtf(0, 90)
    i270 = pick_hrtf(0, 270)
    np.testing.assert_array_equal(db.hrirs[i90, 0], db.hrirs[i270, 1])
    np.testing.assert_array_equal(db.hrirs[i90, 1], db.hrirs[i270, 0])
    assert not np.array_equal(db.hrirs[i_front], db.hrirs[i90])


def test_full_and_compact_agree(tmp_path):
    croot = tmp_path / "compact"
    froot = tmp_path / "full"
    _write_fake_kemar(croot, "compact")
    _write_fake_kemar(froot, "full")
    dbc = load_compact(croot)
    dbf = load_full(froot)
    np.testing.assert_array_equal(dbc.hrirs, dbf.hrirs)
    assert load_database(croot).source.startswith("compact")
    assert load_database(froot).source.startswith("full")


def test_load_reference_compact_set():
    """Read-only integration load of the real shipped compact KEMAR set."""
    import pathlib

    root = pathlib.Path("/root/reference/Jefferson/compact")
    if not root.exists():
        pytest.skip("reference compact set not mounted")
    db = load_compact(root)
    assert db.hrirs.shape == (710, 2, 1024)
    assert np.max(np.abs(db.hrirs)) > 0.1  # real data present
    # mirror sanity on the real data
    i90, i270 = pick_hrtf(0, 90), pick_hrtf(0, 270)
    np.testing.assert_array_equal(db.hrirs[i90, 0], db.hrirs[i270, 1])


def test_loaders_reject_inconsistent_trees(tmp_path):
    """Corrupt trees fail loudly: wrong sample rate and per-file length
    mismatches raise with the offending path named (both layouts)."""
    croot = tmp_path / "compact"
    _write_fake_kemar(croot, "compact")
    bad = croot / "elev0" / "H0e090a.wav"
    taps = np.zeros((32, 2), np.float32)
    write_wav(bad, taps, 48000, bits=16)  # wrong rate
    with pytest.raises(ValueError, match="bad compact HRIR file.*H0e090a"):
        load_compact(croot)
    write_wav(bad, np.zeros((16, 2), np.float32), 44100, bits=16)  # short
    with pytest.raises(ValueError, match="length mismatch.*H0e090a"):
        load_compact(croot)

    froot = tmp_path / "full"
    _write_fake_kemar(froot, "full")
    badf = froot / "elev0" / "L0e090a.wav"
    write_wav(badf, np.zeros(32, np.float32), 22050, bits=16)
    with pytest.raises(ValueError, match="bad HRIR file.*L0e090a"):
        load_full(froot)
    write_wav(badf, np.zeros(16, np.float32), 44100, bits=16)
    with pytest.raises(ValueError, match="length mismatch.*L0e090a"):
        load_full(froot)


def test_database_validation_branches(tmp_path, config):
    """from_hrirs shape gates, missing-tree detection, synthetic n_taps gate,
    and the num_hrtf property all fail/report the obvious way."""
    from jefferson_tpu.hrtf.kemar import (
        NUM_HRTF, HRTFDatabase, load_database, synthetic_database,
    )

    db8 = synthetic_database(config, n_taps=8, seed=3)
    assert db8.num_hrtf == NUM_HRTF
    with pytest.raises(ValueError, match="bad HRIR shape"):
        HRTFDatabase.from_hrirs(np.zeros((4, 3, 16), np.float32), config)
    with pytest.raises(ValueError, match="bad HRIR shape"):
        HRTFDatabase.from_hrirs(
            np.zeros((4, 2, config.pad_len + 1), np.float32), config
        )
    with pytest.raises(ValueError, match="n_taps must be >= 1"):
        synthetic_database(config, n_taps=0)
    with pytest.raises(FileNotFoundError, match="no HRTF database"):
        load_database(tmp_path)  # empty dir: neither SOFA nor KEMAR tree
