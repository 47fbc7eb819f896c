"""Differentiable rendering: smooth weights, gradients, source localization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jefferson_tpu.diff.render import DifferentiableRenderer, smooth_coeffs
from jefferson_tpu.hrtf.kemar import pick_hrtf


def test_smooth_weights_sum_to_one():
    rng = np.random.default_rng(0)
    azi = jnp.asarray(rng.uniform(0, 360, 200).astype(np.float32))
    ele = jnp.asarray(rng.uniform(-40, 90, 200).astype(np.float32))
    idx, w = smooth_coeffs(azi, ele)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 710).all()


def test_smooth_weights_grid_points():
    """On exact grid points the blend collapses to that filter."""
    idx, w = smooth_coeffs(jnp.asarray([90.0]), jnp.asarray([0.0]))
    k = pick_hrtf(0, 90)
    top = np.asarray(idx)[0][np.argmax(np.asarray(w)[0])]
    assert top == k
    assert np.asarray(w)[0].max() > 0.999


def test_azimuth_wraparound_continuity():
    """Smooth interpolation is continuous across 360->0 (unlike the parity
    engine, which reproduces the reference's truncation quirks)."""
    r = DifferentiableRenderer.__new__(DifferentiableRenderer)  # only smooth_coeffs
    i1, w1 = smooth_coeffs(jnp.asarray([359.9]), jnp.asarray([0.0]))
    i2, w2 = smooth_coeffs(jnp.asarray([0.1]), jnp.asarray([0.0]))
    # both blend the filters at 355 and 0 on the elev-0 row
    assert set(np.asarray(i1)[0, :2]) == {pick_hrtf(0, 355), pick_hrtf(0, 0)}
    assert set(np.asarray(i2)[0, :2]) == {pick_hrtf(0, 0), pick_hrtf(0, 5)}


def test_render_gradients_flow(db, config, castanets):
    r = DifferentiableRenderer(db, config)
    pos = jnp.asarray([[45.0, 10.0, 1.0]] * 8, dtype=jnp.float32)
    xr, xi = r._forward(castanets, 8)

    def loss(p):
        return jnp.sum(r.render_spectra(xr, xi, p) ** 2)

    g = jax.grad(loss)(pos)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[:, 0]).max() > 0  # azimuth gradient nonzero
    assert np.abs(g[:, 2]).max() > 0  # radius gradient nonzero


def test_localization_recovers_position(db, config):
    """Render at a hidden position, start elsewhere, recover it approximately.

    Uses a band-limited signal (white noise has a delta autocorrelation, so
    any distance-delay mismatch decorrelates the waveform loss).  The
    fitted-radius direction re-grid (localize stage 3) lands within a few
    degrees; the radius (distance delay + rolloff) is recovered nearly
    exactly.
    """
    rng = np.random.default_rng(42)
    sig = np.convolve(rng.standard_normal(9000), np.hanning(16), mode="same")
    sig = (0.3 * sig / np.abs(sig).max()).astype(np.float32)
    r = DifferentiableRenderer(db, config)
    b = 12
    true_pos = np.tile([62.0, 18.0, 1.3], (b, 1)).astype(np.float32)
    target = np.asarray(r.render(sig, true_pos))
    init = np.tile([40.0, 0.0, 1.0], (b, 1)).astype(np.float32)
    fitted, hist = r.localize(sig, target, init, steps=400, lr=0.1)
    assert hist[-1] < hist[0] * 0.25, f"loss did not drop: {hist[0]} -> {hist[-1]}"
    assert np.abs(fitted[:, 0] - 62.0).mean() < 5.0
    assert np.abs(fitted[:, 1] - 18.0).mean() < 5.0
    assert np.abs(fitted[:, 2] - 1.3).mean() < 0.1


def test_localization_moving_source(db, config):
    """Two-segment trajectory: per-segment grid init finds both basins."""
    rng = np.random.default_rng(3)
    sig = np.convolve(rng.standard_normal(9000), np.hanning(16), mode="same")
    sig = (0.3 * sig / np.abs(sig).max()).astype(np.float32)
    r = DifferentiableRenderer(db, config)
    b = 12
    true_pos = np.concatenate([
        np.tile([80.0, 0.0, 1.0], (b // 2, 1)),
        np.tile([290.0, 0.0, 1.0], (b // 2, 1)),
    ]).astype(np.float32)
    target = np.asarray(r.render(sig, true_pos))
    init = np.tile([0.0, 0.0, 1.0], (b, 1)).astype(np.float32)
    fitted, hist = r.localize(
        sig, target, init, steps=200, lr=0.1, segment_blocks=b // 2
    )
    # each half lands in its own hemisphere basin
    assert np.abs(fitted[: b // 2, 0] - 80.0).mean() < 10.0
    d2 = np.minimum(np.abs(fitted[b // 2 :, 0] - 290.0), 360 - np.abs(fitted[b // 2 :, 0] - 290.0))
    assert d2.mean() < 10.0


def test_localization_fixed_radius_keeps_caller_radii(db, config):
    """optimize_r=False must preserve the caller's PER-BLOCK radii end to
    end (review finding: the grid init used to overwrite every block with
    block 0's radius) and fit directions at those radii."""
    rng = np.random.default_rng(7)
    sig = np.convolve(rng.standard_normal(9000), np.hanning(16), mode="same")
    sig = (0.3 * sig / np.abs(sig).max()).astype(np.float32)
    r = DifferentiableRenderer(db, config)
    b = 12
    radii = np.linspace(0.8, 2.0, b).astype(np.float32)  # receding source
    true_pos = np.stack([np.full(b, 75.0), np.full(b, 10.0), radii], axis=-1)
    target = np.asarray(r.render(sig, true_pos.astype(np.float32)))
    init = np.stack([np.full(b, 10.0), np.zeros(b), radii], axis=-1)
    fitted, hist = r.localize(
        sig, target, init.astype(np.float32), steps=200, lr=0.1,
        optimize_r=False,
    )
    np.testing.assert_array_equal(fitted[:, 2], radii)  # untouched, per block
    assert np.abs(fitted[:, 0] - 75.0).mean() < 8.0
    assert hist[-1] < hist[0], (hist[0], hist[-1])


def test_localization_rejects_bad_segment_blocks(db, config):
    r = DifferentiableRenderer(db, config)
    sig = np.zeros(2000, np.float32)
    pos = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
    tgt = np.zeros((4 * config.frames_per_buffer, 2), np.float32)
    with pytest.raises(ValueError, match="segment_blocks"):
        r.localize(sig, tgt, pos, steps=1, segment_blocks=-4)
    with pytest.raises(ValueError, match="segment_blocks"):
        r.localize(sig, tgt, pos, steps=1, segment_blocks=0)
