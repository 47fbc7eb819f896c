"""SOFA loader: grid snapping, conventions, format detection."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position, load_database
from jefferson_tpu.hrtf.sofa import load_sofa


def _write_sofa(path, ir, azi_engine, ele, sr=44100.0, radius=1.4, delay=None):
    """Minimal SimpleFreeFieldHRIR file; azi given in ENGINE convention.
    ``radius``: scalar or per-measurement array; ``delay``: optional
    Data.Delay array ((1, 2) or (M, 2) samples)."""
    sofa_azi = np.mod(-np.asarray(azi_engine, np.float64), 360.0)
    r = np.broadcast_to(np.asarray(radius, np.float64), (len(ir),))
    pos = np.stack([sofa_azi, np.asarray(ele, np.float64), r], axis=1)
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=ir.astype(np.float64))
        f.create_dataset("Data.SamplingRate", data=np.array([sr]))
        d = f.create_dataset("SourcePosition", data=pos)
        d.attrs["Type"] = np.bytes_("spherical")
        if delay is not None:
            f.create_dataset("Data.Delay", data=np.asarray(delay, np.float64))


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
    loaded = load_sofa(path, config, mapping="nearest")
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


def _smooth_field_ir(azi_deg, ele_deg, hrtf_len, delay=True):
    """Synthetic ground-truth HRIR pair varying smoothly with direction:
    a Hann pulse whose per-ear amplitude carries sin(azi)*cos(ele)
    laterality and (``delay=True``) whose onset varies with
    cos(azi)*cos(ele) — integer-rounded, like any sampled measurement."""
    a = np.deg2rad(azi_deg)
    e = np.deg2rad(ele_deg)
    lat = np.sin(a) * np.cos(e)
    amp_l = 1.0 - 0.45 * lat
    amp_r = 1.0 + 0.45 * lat
    d = 12 + (int(round(5.0 * (1.0 - np.cos(a) * np.cos(e)))) if delay else 0)
    pulse = np.hanning(9)
    ir = np.zeros((2, hrtf_len), np.float64)
    ir[0, d : d + 9] = amp_l * pulse
    ir[1, d : d + 9] = amp_r * pulse
    return ir


def test_sofa_interp3_beats_nearest_on_sparse_sets(db, config, tmp_path):
    """Round-5 verdict item: a sparse SOFA set (30-deg azimuth rings) loaded
    with nearest-snap aliases — adjacent grid points collapse onto the same
    measurement — while the delay-aligned 3-nearest interpolation tracks the
    underlying smooth field with a quantified error drop."""
    from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position

    # sparse measurement set: azimuth every 30 deg on 4 elevation rings
    mazi, mele = [], []
    for e in (-30.0, 0.0, 30.0, 60.0):
        for a in np.arange(0.0, 360.0, 30.0):
            mazi.append(a)
            mele.append(e)
    ir = np.stack([_smooth_field_ir(a, e, config.hrtf_len)
                   for a, e in zip(mazi, mele)])
    path = tmp_path / "sparse_field.sofa"
    _write_sofa(path, ir, np.asarray(mazi), np.asarray(mele))

    near = load_sofa(path, config, mapping="nearest")
    intp = load_sofa(path, config, mapping="interp3")
    auto = load_sofa(path, config)  # sparse -> auto must pick interp3
    assert auto.source.endswith(":interp3")
    np.testing.assert_array_equal(auto.hrirs, intp.hrirs)

    # score only grid points inside the measured elevation band
    idxs = [i for i in range(NUM_HRTF)
            if -30.0 <= grid_position(i)[0] <= 60.0]
    truth = np.stack([
        _smooth_field_ir(grid_position(i)[1], grid_position(i)[0],
                         config.hrtf_len)
        for i in idxs
    ])
    got_n = near.hrirs[idxs, :, : config.hrtf_len]
    got_i = intp.hrirs[idxs, :, : config.hrtf_len]
    err_n = float(np.sqrt(np.mean((got_n - truth) ** 2)))
    err_i = float(np.sqrt(np.mean((got_i - truth) ** 2)))
    # quantified drop on the delay-varying field (integer-sample alignment
    # bounds the gain: the truth's own rounded delays disagree with the
    # weighted-mean delay by +-1 sample at some directions)
    assert err_i < 0.75 * err_n, (err_i, err_n)

    # aliasing demonstration: adjacent grid points that nearest-snap
    # COLLAPSES (identical taps despite distinct truth) are distinguished
    # by the interpolating mapping
    collapsed = 0
    for i, j in zip(idxs, idxs[1:]):
        same_near = np.array_equal(near.hrirs[i], near.hrirs[j])
        truth_i = _smooth_field_ir(grid_position(i)[1], grid_position(i)[0],
                                   config.hrtf_len)
        truth_j = _smooth_field_ir(grid_position(j)[1], grid_position(j)[0],
                                   config.hrtf_len)
        if same_near and not np.allclose(truth_i, truth_j):
            collapsed += 1
            assert not np.array_equal(intp.hrirs[i], intp.hrirs[j])
    assert collapsed > 50, f"expected widespread nearest-snap aliasing, got {collapsed}"


def test_sofa_interp3_halves_error_amplitude_field(db, config, tmp_path):
    """On a delay-constant smooth field (no integer-alignment bound) the
    interpolating mapping better than halves the nearest-snap RMS error."""
    from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position

    mazi, mele = [], []
    for e in (-30.0, 0.0, 30.0, 60.0):
        for a in np.arange(0.0, 360.0, 30.0):
            mazi.append(a)
            mele.append(e)
    ir = np.stack([_smooth_field_ir(a, e, config.hrtf_len, delay=False)
                   for a, e in zip(mazi, mele)])
    path = tmp_path / "amp_field.sofa"
    _write_sofa(path, ir, np.asarray(mazi), np.asarray(mele))
    near = load_sofa(path, config, mapping="nearest")
    intp = load_sofa(path, config, mapping="interp3")
    idxs = [i for i in range(NUM_HRTF)
            if -30.0 <= grid_position(i)[0] <= 60.0]
    truth = np.stack([
        _smooth_field_ir(grid_position(i)[1], grid_position(i)[0],
                         config.hrtf_len, delay=False)
        for i in idxs
    ])
    err_n = float(np.sqrt(np.mean((near.hrirs[idxs, :, : config.hrtf_len] - truth) ** 2)))
    err_i = float(np.sqrt(np.mean((intp.hrirs[idxs, :, : config.hrtf_len] - truth) ** 2)))
    assert err_i < 0.5 * err_n, (err_i, err_n)


def test_sofa_applies_data_delay(db, config, tmp_path):
    """AES69 Data.Delay: a file whose IRs are onset-aligned with the
    interaural delay factored into Data.Delay must load with the ITD
    re-inserted — not with both ears coincident (median-plane collapse)."""
    # one measurement hard right (engine azi 90): right ear leads by 30
    # samples; IRs both start at tap 4.  Peak-first pulse so first-nonzero
    # and the loader's 0.2-threshold onset coincide exactly.
    ir = np.zeros((2, 2, config.hrtf_len), np.float64)
    pulse = np.exp(-np.arange(9.0) / 3.0)
    for m in range(2):
        ir[m, 0, 4:13] = 0.6 * pulse
        ir[m, 1, 4:13] = 1.0 * pulse
    path = tmp_path / "delayed.sofa"
    # [M R] form: left ear delayed 30 samples on measurement 0 (azi 90),
    # symmetric on measurement 1 (azi 270)
    _write_sofa(path, ir, [90.0, 270.0], [0.0, 0.0],
                delay=[[30.0, 0.0], [0.0, 30.0]])
    loaded = load_sofa(path, config, mapping="nearest")
    from jefferson_tpu.hrtf.kemar import pick_hrtf

    g = int(pick_hrtf(0.0, 90.0))
    onset_l = int(np.argmax(np.abs(loaded.hrirs[g, 0]) > 1e-6))
    onset_r = int(np.argmax(np.abs(loaded.hrirs[g, 1]) > 1e-6))
    assert onset_l - onset_r == 30, (onset_l, onset_r)
    # common latency (min delay) is dropped: the leading ear keeps tap 4
    assert onset_r == 4
    # [I R] broadcast form: a uniform delay is all common part -> dropped,
    # identical to loading the same file with no Data.Delay at all
    path2 = tmp_path / "delayed_ir.sofa"
    _write_sofa(path2, ir, [90.0, 270.0], [0.0, 0.0], delay=[[5.0, 5.0]])
    path3 = tmp_path / "nodelay.sofa"
    _write_sofa(path3, ir, [90.0, 270.0], [0.0, 0.0])
    np.testing.assert_array_equal(
        load_sofa(path2, config, mapping="nearest").hrirs,
        load_sofa(path3, config, mapping="nearest").hrirs,
    )


def test_sofa_multi_radius_keeps_dominant_shell(db, config, tmp_path):
    """A multi-distance set keeps the most-populated radius shell (the
    engine applies its own distance factor); nearest must not tie-break
    onto the minority shell's IRs."""
    # 4 directions at r=1.4 (delta at tap 1) + the same 4 at r=3.0
    # (delta at tap 7) + one extra r=3.0 row to prove counting, not order
    azis = [0.0, 90.0, 180.0, 270.0]
    ir14 = np.zeros((4, 2, config.hrtf_len), np.float32)
    ir14[:, :, 1] = 1.0
    ir30 = np.zeros((3, 2, config.hrtf_len), np.float32)
    ir30[:, :, 7] = 1.0
    ir = np.concatenate([ir30, ir14])  # minority shell FIRST in file order
    path = tmp_path / "shells.sofa"
    with pytest.warns(UserWarning, match="radius|radii|shell"):
        _write_sofa(path, ir, azis[:3] + azis, [0.0] * 7,
                    radius=[3.0] * 3 + [1.4] * 4)
        loaded = load_sofa(path, config, mapping="nearest")
    from jefferson_tpu.hrtf.kemar import pick_hrtf

    for a in azis:
        g = int(pick_hrtf(0.0, a))
        assert loaded.hrirs[g, 0, 1] == 1.0, a  # r=1.4 shell won
        assert loaded.hrirs[g, 0, 7] == 0.0, a


def test_sofa_trims_pathological_time_of_flight(db, config, tmp_path):
    """A set with hundreds of samples of common propagation delay left
    in-band is trimmed (with a warning) instead of spending the whole
    hrtf_len window on silence; ordinary onsets stay untouched."""
    tof = 300
    ir = np.zeros((2, 2, config.hrtf_len + 320), np.float64)
    # peak-first pulse: first-nonzero == the loader's 0.2-threshold onset
    pulse = np.exp(-np.arange(9.0) / 3.0)
    ir[0, :, tof : tof + 9] = pulse          # azi 0
    ir[1, :, tof + 8 : tof + 17] = pulse     # azi 180, 8 samples later
    path = tmp_path / "tof.sofa"
    _write_sofa(path, ir, [0.0, 180.0], [0.0, 0.0])
    with pytest.warns(UserWarning, match="time-of-flight"):
        loaded = load_sofa(path, config, mapping="nearest")
    from jefferson_tpu.hrtf.kemar import pick_hrtf

    g0 = int(pick_hrtf(0.0, 0.0))
    onset = int(np.argmax(np.abs(loaded.hrirs[g0, 0]) > 1e-6))
    assert onset < 8, onset  # leading silence gone
    # relative (direction-dependent) delay preserved
    g180 = int(pick_hrtf(0.0, 180.0))
    onset180 = int(np.argmax(np.abs(loaded.hrirs[g180, 0]) > 1e-6))
    assert onset180 - onset == 8


def test_sofa_validates_malformed_files(db, config, tmp_path):
    """Malformed files get clear ValueErrors, not numpy/h5py tracebacks;
    a bad mapping argument raises before any file IO."""
    with pytest.raises(ValueError, match="unknown SOFA mapping"):
        load_sofa(tmp_path / "nonexistent.sofa", config, mapping="interp")

    ir = np.zeros((3, 2, 64), np.float32)
    path = tmp_path / "rows.sofa"
    _write_sofa(path, ir, [0.0, 90.0, 180.0], [0.0] * 3)
    with h5py.File(path, "r+") as f:  # truncate SourcePosition to 2 rows
        pos = np.asarray(f["SourcePosition"])[:2]
        del f["SourcePosition"]
        d = f.create_dataset("SourcePosition", data=pos)
        d.attrs["Type"] = np.bytes_("spherical")
    with pytest.raises(ValueError, match="SourcePosition rows"):
        load_sofa(path, config)

    path2 = tmp_path / "empty.sofa"
    _write_sofa(path2, np.zeros((0, 2, 64), np.float32), [], [])
    with pytest.raises(ValueError, match="no measurements"):
        load_sofa(path2, config)

    path3 = tmp_path / "nosr.sofa"
    _write_sofa(path3, ir, [0.0, 90.0, 180.0], [0.0] * 3)
    with h5py.File(path3, "r+") as f:
        del f["Data.SamplingRate"]
    with pytest.raises(ValueError, match="Data.SamplingRate"):
        load_sofa(path3, config)

    path4 = tmp_path / "baddelay.sofa"
    _write_sofa(path4, ir, [0.0, 90.0, 180.0], [0.0] * 3,
                delay=[[1.0, 2.0], [3.0, 4.0]])  # neither (1,2) nor (3,2)
    with pytest.raises(ValueError, match="Data.Delay"):
        load_sofa(path4, config)


def test_sofa_auto_mapping_dense_stays_nearest(db, config, tmp_path):
    """Grid-sampled (dense) sets keep exact nearest snapping under auto."""
    from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position

    taps = db.hrirs[:, :, : config.hrtf_len]
    eles, azis = zip(*(grid_position(i) for i in range(NUM_HRTF)))
    path = tmp_path / "dense.sofa"
    _write_sofa(path, taps, np.asarray(azis), np.asarray(eles))
    loaded = load_sofa(path, config)
    assert loaded.source.endswith(":nearest")
    np.testing.assert_array_equal(loaded.hrirs, db.hrirs)


def test_sofa_empty_and_malformed_position_sets(config, tmp_path):
    """Zero measurements, ill-shaped SourcePosition, and non-spherical
    coordinate types are rejected with their own messages."""
    import h5py as _h5

    path = tmp_path / "empty.sofa"
    with _h5.File(path, "w") as f:
        f.create_dataset("Data.IR", data=np.zeros((0, 2, 8)))
        f.create_dataset("Data.SamplingRate", data=np.array([44100.0]))
        d = f.create_dataset("SourcePosition", data=np.zeros((0, 3)))
        d.attrs["Type"] = np.bytes_("spherical")
    with pytest.raises(ValueError, match="no measurements"):
        load_sofa(path, config)

    path2 = tmp_path / "badpos.sofa"
    with _h5.File(path2, "w") as f:
        f.create_dataset("Data.IR", data=np.zeros((2, 2, 8)))
        f.create_dataset("Data.SamplingRate", data=np.array([44100.0]))
        d = f.create_dataset("SourcePosition", data=np.zeros((2,)))  # 1-D
        d.attrs["Type"] = np.bytes_("spherical")
    with pytest.raises(ValueError, match="SourcePosition must be"):
        load_sofa(path2, config)

    path3 = tmp_path / "cart.sofa"
    with _h5.File(path3, "w") as f:
        f.create_dataset("Data.IR", data=np.zeros((2, 2, 8)))
        f.create_dataset("Data.SamplingRate", data=np.array([44100.0]))
        d = f.create_dataset("SourcePosition", data=np.zeros((2, 3)))
        d.attrs["Type"] = np.bytes_("cartesian")
    with pytest.raises(ValueError, match="unsupported SourcePosition type"):
        load_sofa(path3, config)


def test_sofa_onset_delay_silent_ir_is_zero():
    """A silent IR pair has no onset: _onset_delay reports 0, not argmax
    noise (the delay-aligned interp3 path must not shift silence)."""
    from jefferson_tpu.hrtf.sofa import _onset_delay

    assert _onset_delay(np.zeros((2, 64))) == 0
    ir = np.zeros((2, 64))
    ir[1, 10] = 1.0
    assert _onset_delay(ir) == 10
