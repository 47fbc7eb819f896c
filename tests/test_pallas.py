"""Fused Pallas spatializer kernel: parity with the XLA apply core.

Runs in interpreter mode on the CPU test mesh; the compiled-on-TPU path is
exercised by scripts/bench_pallas.py on real hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jefferson_tpu.engine.renderer import apply_filters_core, blend_channels
from jefferson_tpu.ops.filters import cmul, distance_factors_split, distance_phase_split
from jefferson_tpu.pallas.fused_spatializer import fused_apply, kernel_planes


def test_fused_apply_matches_core(db, config):
    b = 64
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((b, 513)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, 513)).astype(np.float32))
    idxo = rng.integers(0, 710, (b, 4)).astype(np.int32)
    wo = rng.random((b, 4)).astype(np.float32)
    idxn = rng.integers(0, 710, (b, 4)).astype(np.int32)
    wn = rng.random((b, 4)).astype(np.float32)
    xf = rng.random(b) > 0.4
    uhi, ulo, ifr = distance_phase_split(
        config.fsvs, rng.random(b).astype(np.float32), config.num_bins
    )

    hr = jnp.asarray(np.real(db.spectra).astype(np.float32))
    hi = jnp.asarray(np.imag(db.spectra).astype(np.float32))
    g_old = blend_channels((hr, hi), jnp.asarray(idxo), jnp.asarray(wo))
    g_new = blend_channels((hr, hi), jnp.asarray(idxn), jnp.asarray(wn))
    want = np.asarray(
        apply_filters_core(
            xr, xi, g_old, g_new, jnp.asarray(xf),
            jnp.asarray(uhi), jnp.asarray(ulo), jnp.asarray(ifr),
            config=config, with_xfade=True,
        )
    )

    dr, di = distance_factors_split(
        jnp.asarray(uhi), jnp.asarray(ulo), jnp.asarray(ifr), config.num_bins
    )
    xdr, xdi = cmul(xr, xi, dr, di)
    idx8 = jnp.asarray(np.concatenate([idxo, idxn], 1))
    w8 = jnp.asarray(np.concatenate([wo, wn], 1))
    got = np.asarray(
        fused_apply(kernel_planes(db), xdr, xdi, idx8, w8, jnp.asarray(xf),
                    config, tb=32, interpret=True)
    )
    assert got.shape == want.shape == (b, 128, 2)
    d = np.abs(got - want).max()
    assert d < 1e-5, f"fused kernel deviates from XLA core: {d}"


def test_fused_apply_duplicate_brackets(db, config):
    """Case-1 positions repeat one index 4x; the one-hot weights must sum."""
    b = 32
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((b, 513)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, 513)).astype(np.float32))
    idx = np.tile(rng.integers(0, 710, (b, 1)), (1, 4)).astype(np.int32)  # all equal
    w = np.tile(np.array([[1.0, 0.0, 0.0, 0.0]], np.float32), (b, 1))
    uhi, ulo, ifr = distance_phase_split(
        config.fsvs, np.full(b, 0.2, np.float32), config.num_bins
    )
    hr = jnp.asarray(np.real(db.spectra).astype(np.float32))
    hi = jnp.asarray(np.imag(db.spectra).astype(np.float32))
    g = blend_channels((hr, hi), jnp.asarray(idx), jnp.asarray(w))
    want = np.asarray(
        apply_filters_core(
            xr, xi, None, g, jnp.asarray(np.zeros(b, bool)),
            jnp.asarray(uhi), jnp.asarray(ulo), jnp.asarray(ifr),
            config=config, with_xfade=False,
        )
    )
    dr, di = distance_factors_split(
        jnp.asarray(uhi), jnp.asarray(ulo), jnp.asarray(ifr), config.num_bins
    )
    xdr, xdi = cmul(xr, xi, dr, di)
    idx8 = jnp.asarray(np.concatenate([idx, idx], 1))
    w8 = jnp.asarray(np.concatenate([w, w], 1))
    got = np.asarray(
        fused_apply(kernel_planes(db), xdr, xdi, idx8, w8,
                    jnp.asarray(np.zeros(b, bool)), config, tb=32, interpret=True)
    )
    assert np.abs(got - want).max() < 1e-5


def test_onehot_grouped_tiling_must_divide(db, config):
    """group_tiles must tile the render exactly: a remainder would make the
    grouped table BlockSpec (index i // group_tiles) read past the stacked
    table for the trailing tiles — the wrapper asserts instead of shipping a
    silent out-of-bounds block read."""
    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import cat_table, pick_fused_tile
    from jefferson_tpu.pallas.fused_step import fused_step_onehot_xfade
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    rng = np.random.default_rng(11)
    cfg = config
    fpb = cfg.frames_per_buffer
    s, nb = 4, 8
    plans = [
        make_plan(CircularOrbit(period_s=0.3 + 0.1 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(s)
    ]
    hist = (cfg.pad_len // fpb - 1) * fpb
    streams = jnp.asarray(
        (rng.standard_normal((s, nb * fpb + hist)) * 0.2).astype(np.float32)
    )
    tb = pick_fused_tile(s * nb, nb)
    n_tiles = (s * nb) // tb
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(
        np.stack([p.idx_old for p in plans]),
        np.stack([p.idx_new[-1] for p in plans]),
    )
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    table = jnp.take(cat_table(spectra), jnp.asarray(uniq_ids), axis=0)
    b = s * nb
    col = lambda a: jnp.asarray(np.concatenate(a).astype(np.float32)[:, None])
    args = (
        streams,
        col([p.u_hi for p in plans]), col([p.u_lo for p in plans]),
        col([p.inv_frac for p in plans]),
        table, jnp.asarray(ridx.reshape(b, 4)),
        jnp.asarray(np.concatenate([p.w_old for p in plans])),
        jnp.asarray(ridx_last), jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        col([p.xfade for p in plans]),
    )
    kw = dict(nb=nb, pad_len=cfg.pad_len, bins=cfg.num_bins, fpb=fpb, tb=tb,
              interpret=True)
    bad = n_tiles + 1  # never divides n_tiles
    with pytest.raises(AssertionError):
        fused_step_onehot_xfade(*args, group_tiles=bad, **kw)
