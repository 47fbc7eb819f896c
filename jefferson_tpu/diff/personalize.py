"""HRTF personalization: fit a listener's filter table from sparse
measurements.

Generic HRTF sets (KEMAR) localize poorly for individual listeners;
measuring a full 710-direction set per listener is impractical, but a
handful of directions is easy.  Because the renderer interpolates the
table smoothly (diff/render.smooth_coeffs), fitting is a differentiable
inverse problem: adjust the full table so interpolation reproduces the
measured HRIR spectra, with azimuth-ring smoothness and an anchor to the
starting set so sparse data generalizes instead of spiking.

This extends the framework beyond the reference (which only ever loads a
fixed measured set, reference: Jefferson/src/hrtf_signals.cu:107-153) in
the direction of the neural-field personalization literature (see
PAPERS.md), with the simplest useful parameterization: the spectra
themselves, regularized.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..hrtf.kemar import (
    AZIMUTH_COUNTS,
    AZIMUTH_OFFSET,
    NUM_ELEV,
    NUM_HRTF,
    HRTFDatabase,
)
from .render import smooth_coeffs


def _azimuth_successors() -> np.ndarray:
    """succ[i] = next azimuth grid index within i's elevation ring (wraps)."""
    succ = np.empty(NUM_HRTF, np.int32)
    for e in range(NUM_ELEV):
        o, n = int(AZIMUTH_OFFSET[e]), int(AZIMUTH_COUNTS[e])
        succ[o : o + n] = o + (np.arange(n) + 1) % n
    return succ


def fit_database(
    measurements,
    db0: HRTFDatabase,
    config: EngineConfig | None = None,
    steps: int = 400,
    lr: float = 0.05,
    smooth: float = 3.0,
    anchor: float = 0.005,
):
    """Fit a personalized HRTFDatabase from sparse measured HRIRs.

    measurements: iterable of (azi_deg, ele_deg, hrir) with hrir (2, taps)
    float — the listener's measured impulse-response pair at that direction.
    db0: the starting (generic) database.
    smooth: weight of the azimuth-ring smoothness penalty on the correction
    field (spreads measured deviations to unmeasured directions).
    anchor: weight of the pull toward zero correction (prevents drift).

    Parameterization: a multiplicative complex correction field c per
    filter/ear/bin, S = S0 * (1 + c), initialized at zero.  Individual
    deviations from a generic set are dominated by smooth spectral-gain
    differences (ear shape EQ), which are *constant or slowly varying
    across direction* in c — so ring smoothing propagates sparse
    measurements across the whole grid instead of fighting the table's own
    directional structure.

    Returns (HRTFDatabase, loss_history).  The fitted taps are rebuilt from
    the optimized spectra (truncated to hrtf_len) so engine/oracle
    consistency (spectra == rfft(hrirs)) is preserved.
    """
    import optax
    import scipy.fft

    config = config or db0.config
    bins = config.num_bins
    meas = list(measurements)
    if not meas:
        raise ValueError("need at least one measurement")
    azi = np.array([m[0] for m in meas], np.float32)
    ele = np.array([m[1] for m in meas], np.float32)
    taps = np.zeros((len(meas), 2, config.pad_len), np.float32)
    for j, (_, _, h) in enumerate(meas):
        h = np.asarray(h, np.float32)
        if h.ndim != 2 or h.shape[0] != 2:
            raise ValueError(f"measurement {j}: hrir must be (2, taps), got {h.shape}")
        if h.shape[1] > config.hrtf_len:
            # the engine's filter class IS hrtf_len taps: fit against the
            # truncated measurement so the optimized spectra stay
            # representable — fitting the full-tap spectrum and truncating
            # only at rebuild would silently discard what was just fit
            tail = float(np.sum(h[:, config.hrtf_len :] ** 2))
            tot = float(np.sum(h**2)) or 1.0
            if tail / tot > 1e-4:
                import warnings

                warnings.warn(
                    f"measurement {j}: {h.shape[1]} taps truncated to "
                    f"hrtf_len={config.hrtf_len} ({100 * tail / tot:.2f}% of "
                    f"the energy dropped) — engine filters are hrtf_len taps"
                )
            h = h[:, : config.hrtf_len]
        taps[j, :, : h.shape[1]] = h
    target = scipy.fft.rfft(taps, axis=-1)
    t_r = jnp.asarray(np.real(target).astype(np.float32))  # (M, 2, bins)
    t_i = jnp.asarray(np.imag(target).astype(np.float32))

    idx, w = smooth_coeffs(jnp.asarray(azi), jnp.asarray(ele))  # (M,4) each
    succ = jnp.asarray(_azimuth_successors())

    s0_r = jnp.asarray(np.real(db0.spectra).astype(np.float32))  # (N, 2, bins)
    s0_i = jnp.asarray(np.imag(db0.spectra).astype(np.float32))

    def interp(tab):  # (N, 2, bins) -> (M, 2, bins)
        g = w[:, 0, None, None] * tab[idx[:, 0]]
        for k in range(1, 4):
            g = g + w[:, k, None, None] * tab[idx[:, k]]
        return g

    def corrected(params):
        cr, ci = params  # S = S0 * (1 + cr + i*ci)
        sr = s0_r * (1.0 + cr) - s0_i * ci
        si = s0_r * ci + s0_i * (1.0 + cr)
        return sr, si

    def loss_fn(params):
        cr, ci = params
        sr, si = corrected(params)
        data = jnp.mean((interp(sr) - t_r) ** 2) + jnp.mean((interp(si) - t_i) ** 2)
        ring = jnp.mean((cr - cr[succ]) ** 2) + jnp.mean((ci - ci[succ]) ** 2)
        pull = jnp.mean(cr**2) + jnp.mean(ci**2)
        return data + smooth * ring + anchor * pull

    params = (jnp.zeros_like(s0_r), jnp.zeros_like(s0_i))
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    history = []
    for _ in range(steps):
        params, state, loss = step(params, state)
        history.append(float(loss))

    sr, si = (np.asarray(p) for p in corrected(params))
    spectra = (sr + 1j * si).astype(np.complex64)
    hrirs = scipy.fft.irfft(spectra, n=config.pad_len, axis=-1)
    fitted = HRTFDatabase.from_hrirs(
        hrirs[:, :, : config.hrtf_len].astype(np.float32),
        config,
        source=f"personalized:{db0.source}",
    )
    return fitted, history
