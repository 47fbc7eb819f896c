"""HRTF personalization: sparse measurements pull a generic set toward a
listener's true filters."""

import numpy as np
import pytest

from jefferson_tpu.diff.personalize import fit_database
from jefferson_tpu.hrtf.kemar import NUM_HRTF, grid_position


def _tilted(db, config):
    """A 'listener': the true set is db with a smooth spectral tilt + ITD-ish
    shift applied globally (a plausible generic-vs-individual deviation)."""
    from jefferson_tpu.hrtf.kemar import HRTFDatabase
    import scipy.fft

    bins = config.num_bins
    k = np.arange(bins) / bins
    eq = (1.0 + 0.5 * np.sin(2 * np.pi * k))[None, None, :]  # smooth EQ curve
    spectra = db.spectra * eq
    hrirs = scipy.fft.irfft(spectra, n=config.pad_len, axis=-1)
    return HRTFDatabase.from_hrirs(
        hrirs[:, :, : config.hrtf_len].astype(np.float32), config, source="tilted"
    )


def test_fit_recovers_global_deviation(db, config):
    truth = _tilted(db, config)
    rng = np.random.default_rng(5)
    picks = rng.choice(NUM_HRTF, size=24, replace=False)
    meas = []
    for i in picks:
        ele, azi = grid_position(int(i))
        meas.append((azi, ele, truth.hrirs[i, :, : config.hrtf_len]))

    fitted, hist = fit_database(meas, db, config, steps=400)
    assert hist[-1] < hist[0] * 0.1, "loss did not drop"

    def err(a):
        return float(np.mean(np.abs(a.spectra - truth.spectra) ** 2))

    e0, e1 = err(db), err(fitted)
    # the smoothed multiplicative correction generalizes the 24 measured
    # directions to the whole 710-filter table
    assert e1 < 0.3 * e0, f"table error did not improve: {e0:.4g} -> {e1:.4g}"

    # measured directions are matched closely
    for i in picks[:5]:
        d = np.abs(fitted.spectra[i] - truth.spectra[i]).max()
        d0 = np.abs(db.spectra[i] - truth.spectra[i]).max()
        assert d < 0.15 * d0, (i, d, d0)


def test_fit_validates_input(db, config):
    with pytest.raises(ValueError, match="at least one"):
        fit_database([], db, config)
    with pytest.raises(ValueError, match="must be"):
        fit_database([(0.0, 0.0, np.zeros(64))], db, config)


def test_fit_truncates_overlong_measurements_with_warning(db, config):
    """Measured HRIRs longer than hrtf_len are truncated BEFORE fitting
    (the engine's filter class is hrtf_len taps), with a warning when the
    dropped tail carries energy — not silently fit then discarded at
    rebuild (review finding)."""
    rng = np.random.default_rng(5)
    h = rng.standard_normal((2, config.pad_len)).astype(np.float32) * 0.1
    with pytest.warns(UserWarning, match="truncated to hrtf_len"):
        fitted, hist = fit_database(
            [(30.0, 0.0, h)], db, config, steps=20
        )
    # the returned database keeps the engine invariant: taps beyond
    # hrtf_len are zero, spectra == rfft(hrirs)
    assert np.all(fitted.hrirs[:, :, config.hrtf_len:] == 0.0)
    # a tail-free overlong measurement (zeros past hrtf_len) stays silent
    import warnings as _w

    h2 = np.zeros((2, config.pad_len), np.float32)
    h2[:, :config.hrtf_len] = h[:, :config.hrtf_len]
    with _w.catch_warnings():
        _w.simplefilter("error")
        fit_database([(30.0, 0.0, h2)], db, config, steps=2)
