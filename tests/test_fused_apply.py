"""Fused apply+IDFT+crossfade kernel: parity with the XLA apply core.

Interpreter mode on CPU; the compiled path is measured on hardware by
scripts/bench_fused_apply.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jefferson_tpu.engine.plan import make_plan
from jefferson_tpu.engine.renderer import apply_filters_core, blend_cat, split_planes
from jefferson_tpu.ops import fft as fft_ops
from jefferson_tpu.ops.filters import cmul, distance_factors_split
from jefferson_tpu.pallas.fused_apply import (
    fused_apply_xfade,
    pad_cat_planes,
    plane_stride,
)
from jefferson_tpu.trajectory.trajectory import CircularOrbit


def _tables(db):
    hr = np.real(db.spectra).astype(np.float32)
    hi = np.imag(db.spectra).astype(np.float32)
    cat = np.concatenate([hr[:, 0], hi[:, 0], hr[:, 1], hi[:, 1]], axis=1)
    return jnp.asarray(cat), jnp.asarray(pad_cat_planes(cat, hr.shape[-1]))


@pytest.mark.parametrize("n_src,nb,tb", [(4, 8, 16), (1, 32, 8)])
def test_fused_apply_matches_xla(db, config, n_src, nb, tb):
    """Batch (seg < tb) and single-stream (seg > tb) variants vs the XLA core."""
    bins, fpb = config.num_bins, config.frames_per_buffer
    b = n_src * nb
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((b, bins)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, bins)).astype(np.float32))
    plans = [
        make_plan(CircularOrbit(period_s=0.3 + 0.1 * i, ele=5, r=1.0).sample(nb, config), config)
        for i in range(n_src)
    ]
    idx_ext = jnp.asarray(np.concatenate([np.concatenate([p.idx_old[:1], p.idx_new]) for p in plans]))
    w_ext = jnp.asarray(np.concatenate([np.concatenate([p.w_old[:1], p.w_new]) for p in plans]))
    idx_oldf = jnp.asarray(np.concatenate([p.idx_old for p in plans]))
    w_oldf = jnp.asarray(np.concatenate([p.w_old for p in plans]))
    idx_last = jnp.asarray(np.stack([p.idx_new[-1] for p in plans]))
    w_last = jnp.asarray(np.stack([p.w_new[-1] for p in plans]))
    catf = lambda a: jnp.asarray(np.concatenate([getattr(p, a) for p in plans]))
    xfade, u_hi, u_lo, inv_frac = (catf(k) for k in ("xfade", "u_hi", "u_lo", "inv_frac"))

    cat, catp = _tables(db)

    # XLA reference
    g_ext = blend_cat(cat, idx_ext, w_ext).reshape(n_src, nb + 1, -1)
    g = tuple(a for a in split_planes(g_ext, bins))
    flat = lambda a: a.reshape((b,) + a.shape[2:])
    g_old = tuple(flat(a[:, :nb]) for a in g)
    g_new = tuple(flat(a[:, 1:]) for a in g)
    want = np.asarray(
        apply_filters_core(xr, xi, g_old, g_new, xfade, u_hi, u_lo, inv_frac,
                           config=config, with_xfade=True)
    )

    # fused kernel (interpret)
    dr, di = distance_factors_split(u_hi, u_lo, inv_frac, bins)
    xdr, xdi = cmul(xr, xi, dr, di)
    icr, ici = fft_ops._idft_tail_matrices(config.pad_len, fpb)
    g_oldp = blend_cat(catp, idx_oldf, w_oldf)
    g_lastp = blend_cat(catp, idx_last, w_last)
    y = fused_apply_xfade(
        xdr, xdi, g_oldp, g_lastp, xfade.astype(jnp.float32)[:, None],
        jnp.asarray(icr), jnp.asarray(ici),
        seg=nb, bins=bins, fpb=fpb, tb=tb, interpret=True,
    )
    got = np.asarray(jnp.transpose(y.reshape(b, 2, fpb), (0, 2, 1)))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 4e-7 * max(peak, 1.0), (
        np.abs(got - want).max(), peak
    )


def test_plane_stride():
    assert plane_stride(513) == 640
    assert plane_stride(257) == 384
    assert plane_stride(128) == 128


def test_pick_fused_tile_respects_sublane_constraint():
    """Every returned tile satisfies Mosaic's 8-sublane multiple and the
    divisibility contract; incompatible geometries return None (XLA path)."""
    from jefferson_tpu.engine.renderer import pick_fused_tile

    for b, seg in [(8192, 32), (2048, 2048), (24, 24), (16, 8), (512, 512),
                   (20, 20), (100, 100), (84, 12), (96, 96), (40, 40)]:
        t = pick_fused_tile(b, seg)
        if t is not None:
            assert t % 8 == 0, (b, seg, t)
            assert b % t == 0 and (seg % t == 0 or t % seg == 0), (b, seg, t)
    # non-multiples of 8 must fall back, not crash Mosaic on chip
    assert pick_fused_tile(20, 20) is None
    assert pick_fused_tile(100, 100) is None
    assert pick_fused_tile(84, 12) is None


def test_fused_renderer_end_to_end(db, config, castanets):
    """Renderer with the fused path forced on (interpret on CPU) matches the
    direct XLA renderer within fp reassociation tolerance."""
    from jefferson_tpu.engine.renderer import Renderer

    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(32, config)
    on = Renderer(db, config, chunk_blocks=32, dedup=False, fused=True)
    off = Renderer(db, config, chunk_blocks=32, dedup=False, fused=False)
    got = on.render(castanets, pos)
    want = off.render(castanets, pos)
    assert on._fd_onehot or on._fd_fused, "fused path not exercised"
    assert np.abs(got - want).max() < 4e-7


def test_fused_renderer_partial_chunk(db, config, castanets):
    """Padded final chunk: the roll reads the pad's first row as the last
    real block's new filter (regression guard)."""
    from jefferson_tpu.engine.renderer import Renderer

    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(40, config)
    on = Renderer(db, config, chunk_blocks=32, dedup=False, fused=True)
    off = Renderer(db, config, chunk_blocks=32, dedup=False, fused=False)
    got = on.render(castanets, pos)
    want = off.render(castanets, pos)
    assert np.abs(got - want).max() < 4e-7


def test_fused_batch_end_to_end(db, config, castanets):
    """BatchRenderer fused path matches the XLA batch path."""
    from jefferson_tpu.engine.batch import BatchRenderer

    s, nb = 4, 8
    signals = np.stack([np.roll(castanets, 500 * i)[:4000] for i in range(s)])
    positions = np.stack([
        CircularOrbit(period_s=0.2 + 0.1 * i, ele=5, r=1.0).sample(nb, config)
        for i in range(s)
    ])
    on = BatchRenderer(db, chunk_blocks=nb, dedup=False, fused=True)
    got = on.render(signals, positions)
    want = BatchRenderer(db, chunk_blocks=nb, dedup=False, fused=False).render(
        signals, positions
    )
    assert any(k[2] is not None for k in on._jitted), "fused path not exercised"
    assert np.abs(got - want).max() < 4e-7


def test_dedup_fused_composition(db, config, castanets):
    """Sweep workload through dedup+fused == plain dedup (XLA) within fp."""
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    traj = AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5,
                        blocks_per_step=8, num_steps=4)
    pos = traj.sample(traj.total_blocks, config)
    on = Renderer(db, config, chunk_blocks=40, dedup=True, fused=True)
    off = Renderer(db, config, chunk_blocks=40, dedup=True, fused=False)
    got = on.render(castanets, pos, initial_old=(0.0, 0.0))
    want = off.render(castanets, pos, initial_old=(0.0, 0.0))
    # the one-hot path takes precedence when the filter set is compact;
    # dedup+fused remains the fallback for wide filter sets
    assert on._fd_onehot or on._fd_dedup_fused, "fused path not exercised"
    assert np.abs(got - want).max() < 4e-7


def test_compact_filter_ids():
    from jefferson_tpu.engine.plan import compact_filter_ids

    rng = np.random.default_rng(2)
    idx_old = rng.integers(0, 710, (6, 8, 4)).astype(np.int32)
    idx_last = rng.integers(0, 710, (6, 4)).astype(np.int32)
    uniq, ridx, rlast, u_pad = compact_filter_ids(idx_old, idx_last)
    assert u_pad == len(uniq) and (u_pad & (u_pad - 1)) == 0
    np.testing.assert_array_equal(uniq[ridx], idx_old)
    np.testing.assert_array_equal(uniq[rlast], idx_last)


def test_fused_batch_wide_filter_set(db, config, castanets):
    """Random positions touch many filters; the batch path stays correct
    whichever blend form (one-hot or gather) the U bucket selects."""
    from jefferson_tpu.engine.batch import BatchRenderer
    from jefferson_tpu.trajectory.trajectory import PositionEvents

    rng = np.random.default_rng(9)
    s, nb = 4, 8
    signals = np.stack([np.roll(castanets, 300 * i)[:2000] for i in range(s)])
    positions = np.stack([
        np.stack([rng.uniform(0, 360, nb), rng.uniform(-40, 90, nb),
                  np.full(nb, 1.0)], axis=1)
        for _ in range(s)
    ]).astype(np.float32)
    on = BatchRenderer(db, chunk_blocks=nb, dedup=False, fused=True)
    got = on.render(signals, positions)
    want = BatchRenderer(db, chunk_blocks=nb, dedup=False, fused=False).render(
        signals, positions
    )
    assert np.abs(got - want).max() < 4e-7


def test_fused_sharded_batch(db, config, castanets):
    """shard_map-wrapped fused kernel over the 8-device mesh == XLA batch."""
    import jax

    from jefferson_tpu.engine.batch import BatchRenderer
    from jefferson_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    s, nb = 8, 8
    signals = np.stack([np.roll(castanets, 300 * i)[:3000] for i in range(s)])
    positions = np.stack([
        CircularOrbit(period_s=0.2 + 0.05 * i, ele=5, r=1.0).sample(nb, config)
        for i in range(s)
    ])
    mesh = make_mesh(8)
    on = BatchRenderer(db, chunk_blocks=nb, mesh=mesh, dedup=False, fused=True)
    got = on.render(signals, positions)
    assert any(k[2] is not None for k in on._jitted), "fused path not exercised"
    want = BatchRenderer(db, chunk_blocks=nb, dedup=False, fused=False).render(
        signals, positions
    )
    assert np.abs(got - want).max() < 4e-7


def test_fused_nondefault_geometry(castanets):
    """64-sample block / 256-tap / 512-FFT engine through the fused path."""
    from jefferson_tpu import EngineConfig, synthetic_database
    from jefferson_tpu.engine.renderer import Renderer

    cfg = EngineConfig(frames_per_buffer=64, hrtf_len=256)
    assert cfg.num_bins == 257  # stride 384
    db2 = synthetic_database(cfg, n_taps=256, seed=7)
    pos = CircularOrbit(period_s=0.15, ele=5, r=1.0).sample(24, cfg)
    on = Renderer(db2, cfg, chunk_blocks=24, dedup=False, fused=True)
    off = Renderer(db2, cfg, chunk_blocks=24, dedup=False, fused=False)
    got = on.render(castanets, pos)
    want = off.render(castanets, pos)
    assert on._fd_onehot or on._fd_fused
    assert np.abs(got - want).max() < 4e-7


def test_fused_failure_falls_back_to_xla(db, config, castanets, monkeypatch):
    """A Mosaic/remote-compile failure degrades to the XLA path mid-render
    instead of killing it (the compile service throws HTTP 500s sometimes)."""
    import jefferson_tpu.pallas.fused_apply as fa
    import jefferson_tpu.pallas.fused_step as fs

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic failure")

    monkeypatch.setattr(fa, "fused_apply_xfade", boom)
    monkeypatch.setattr(fs, "fused_step_stream_xfade", boom)
    monkeypatch.setattr(fs, "fused_step_xfade", boom)
    monkeypatch.setattr(fs, "fused_step_stream_onehot_xfade", boom)
    monkeypatch.setattr(fs, "fused_step_onehot_xfade", boom)
    from jefferson_tpu.engine.renderer import Renderer

    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(32, config)
    r = Renderer(db, config, chunk_blocks=32, dedup=False, fused=True)
    got = r.render(castanets, pos)
    # one flaky failure disables the variant for the rest of THAT render
    # only; the instance retries fused kernels on the next render
    assert r.fused
    want = Renderer(db, config, chunk_blocks=32, dedup=False, fused=False).render(
        castanets, pos
    )
    np.testing.assert_array_equal(got, want)


def test_fused_vs_oracle(db, config, castanets):
    """Fused renderer against the ground-truth oracle at the sweep gate."""
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check

    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(32, config)
    got = Renderer(db, config, chunk_blocks=32, dedup=False, fused=True).render(
        castanets, pos
    )
    want = render_oracle(castanets, db, [tuple(p) for p in pos], config)
    rep = precision_check(got, want, eps=2e-7)
    assert rep.ok, str(rep)
