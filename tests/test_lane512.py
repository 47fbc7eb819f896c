"""Lane-aligned 512-bin kernel layout (round 5, the PERF.md lane-tax lever).

``lane512`` re-packs the combined-plane tables into [rL|iL|rR|iR] each
bins-1 wide (lane-aligned slices) plus a 128-lane Nyquist block, and the
tail-IDFT contracts K=512 with the Nyquist contribution added as VPU
rank-1 terms.  Everything except that tail reassociation is a column
permutation of the standard layout, so outputs must agree to fp
reassociation tolerance on every dispatch (one-hot, grouped, gather-fused,
dedup+fused, batched) — interpret mode on CPU here; the compiled A/B and
the full-scale sweep gate run on chip (scripts/bench_lane512.py, PERF.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jefferson_tpu.engine.renderer import Renderer, cat_table
from jefferson_tpu.engine.batch import BatchRenderer
from jefferson_tpu.pallas.fused_step import lane512_width, to_lane512
from jefferson_tpu.trajectory.trajectory import AzimuthSweep, CircularOrbit


def test_to_lane512_blend_commutes(db, config):
    """Repacking commutes with blending (column permutation + zero fill)."""
    from jefferson_tpu.engine.renderer import blend_cat

    bins = config.num_bins
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    cat = cat_table(spectra)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cat.shape[0], (16, 4)).astype(np.int32))
    w = jnp.asarray(rng.random((16, 4)).astype(np.float32))
    a = to_lane512(blend_cat(cat, idx, w), bins)
    b = blend_cat(to_lane512(cat, bins), idx, w)
    assert a.shape == (16, lane512_width(bins))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lane512_layout_columns(db, config):
    """The repacked table carries exactly the original columns: plane k's
    first bins-1 columns, then the four Nyquist bins, then zeros."""
    bins = config.num_bins
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    cat = np.asarray(cat_table(spectra))
    t = np.asarray(to_lane512(jnp.asarray(cat), bins))
    b1 = bins - 1
    for k in range(4):
        np.testing.assert_array_equal(
            t[:, k * b1 : (k + 1) * b1], cat[:, k * bins : k * bins + b1]
        )
        np.testing.assert_array_equal(t[:, 4 * b1 + k], cat[:, k * bins + b1])
    assert (t[:, 4 * b1 + 4 :] == 0).all()


@pytest.mark.parametrize("traj", ["orbit", "sweep"])
def test_lane512_renderer_matches_default(db, config, castanets, traj):
    """Renderer(lane512=True) == Renderer(lane512=False) on the one-hot
    (orbit/mover) and dedup+fused (sweep/hold) dispatches."""
    if traj == "orbit":
        pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(32, config)
    else:
        t = AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5,
                         blocks_per_step=8, num_steps=4)
        pos = t.sample(t.total_blocks, config)
    on = Renderer(db, config, chunk_blocks=32, fused=True, lane512=True)
    off = Renderer(db, config, chunk_blocks=32, fused=True, lane512=False)
    got = on.render(castanets, pos)
    want = off.render(castanets, pos)
    assert np.abs(got - want).max() < 4e-7
    assert on._fd_onehot or on._fd_dedup_fused or on._fd_fused, \
        "no fused dispatch exercised"


def test_lane512_wide_mover_grouped(db, config, castanets):
    """Full-sphere mover (grouped one-hot tables) with lane512 on."""
    rng = np.random.default_rng(3)
    nb = 64
    pos = np.stack([
        rng.uniform(0, 360, nb), rng.uniform(-40, 90, nb), np.full(nb, 1.0)
    ], axis=1).astype(np.float32)
    on = Renderer(db, config, chunk_blocks=64, fused=True, lane512=True)
    off = Renderer(db, config, chunk_blocks=64, fused=True, lane512=False)
    got = on.render(castanets[: nb * config.frames_per_buffer], pos)
    want = off.render(castanets[: nb * config.frames_per_buffer], pos)
    assert np.abs(got - want).max() < 4e-7


def test_lane512_batched(db, config, castanets):
    """BatchRenderer with lane512 on == off (one-hot + dedup+fused forms)."""
    s, nb = 4, 8
    signals = np.stack([np.roll(castanets, 500 * i)[:4000] for i in range(s)])
    positions = np.stack([
        CircularOrbit(period_s=0.2 + 0.1 * i, ele=5, r=1.0).sample(nb, config)
        for i in range(s)
    ])
    on = BatchRenderer(db, chunk_blocks=nb, fused=True, lane512=True)
    off = BatchRenderer(db, chunk_blocks=nb, fused=True, lane512=False)
    got = on.render(signals, positions)
    want = off.render(signals, positions)
    assert np.abs(got - want).max() < 4e-7


def test_lane512_oracle_parity(db, config, castanets):
    """lane512 engine output stays inside the reference-style oracle gate."""
    from jefferson_tpu.oracle.reference import render_oracle

    nb = 32
    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(nb, config)
    sig = castanets[: nb * config.frames_per_buffer]
    got = Renderer(db, config, chunk_blocks=32, fused=True,
                   lane512=True).render(sig, pos)
    want = render_oracle(sig, db, pos, config)
    assert np.abs(got - want).max() < 5e-7


def test_fwd512_matches_lane512(db, config):
    """fwd512 (truncated 512-wide DFT bases + exact VPU Nyquist forward)
    matches the lane512 baseline within reassociation tolerance on real
    filter spectra (the Nyquist forward moves from a padded MXU column to
    an exact +-1 lane reduction)."""
    import jax.numpy as jnp

    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import cat_table, pick_fused_tile
    from jefferson_tpu.pallas.fused_step import fused_step_onehot_xfade, to_lane512

    rng = np.random.default_rng(5)
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
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(
        np.stack([p.idx_old for p in plans]),
        np.stack([p.idx_new[-1] for p in plans]),
    )
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    table = to_lane512(
        jnp.take(cat_table(spectra), jnp.asarray(uniq_ids), axis=0), cfg.num_bins
    )
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
              lane512=True, interpret=True)
    y0 = fused_step_onehot_xfade(*args, **kw)
    y1 = fused_step_onehot_xfade(*args, fwd512=True, **kw)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() < 4e-7
