"""Pairwise-tree tail-IDFT contraction (round 5, the error-budget follow-up).

``tail_tree`` splits the tail-IDFT K dimension into 128-lane chunks
contracted separately and summed pairwise.  Same MACs, tree-shaped
rounding: the on-chip probe (scripts/apply_assoc_probe.py) measured it
recovering the XLA chain's accumulation accuracy inside the Mosaic kernel
(max err vs f64 on realistic operands: plain 2.83e-7 -> tree 1.24e-7;
XLA 1.18e-7).  These tests pin the reassociation tolerance and the wiring
(every dispatch honors the flag) in interpret mode; the compiled margin
and throughput A/Bs run on chip (PERF.md round-5 tail_tree section).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jefferson_tpu.engine.batch import BatchRenderer
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.trajectory.trajectory import AzimuthSweep, CircularOrbit


@pytest.mark.parametrize("traj", ["orbit", "sweep"])
def test_tail_tree_renderer_matches_default(db, config, castanets, traj):
    """Renderer(tail_tree=True) == Renderer(tail_tree=False) within fp
    reassociation tolerance on the one-hot (orbit) and dedup+fused (sweep)
    dispatches."""
    if traj == "orbit":
        pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(32, config)
    else:
        t = AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5,
                         blocks_per_step=8, num_steps=4)
        pos = t.sample(t.total_blocks, config)
    on = Renderer(db, config, chunk_blocks=32, fused=True, tail_tree=True)
    off = Renderer(db, config, chunk_blocks=32, fused=True, tail_tree=False)
    got = on.render(castanets, pos)
    want = off.render(castanets, pos)
    assert np.abs(got - want).max() < 4e-7
    if traj == "orbit":
        assert on._fd_onehot, "orbit must exercise the one-hot dispatch"
    else:
        assert on._fd_dedup_fused, "sweep must exercise dedup+fused"


def test_tail_tree_batched(db, config, castanets):
    """BatchRenderer with tail_tree on == off (one-hot + dedup+fused forms)."""
    s, nb = 4, 8
    signals = np.stack([np.roll(castanets, 500 * i)[:4000] for i in range(s)])
    positions = np.stack([
        CircularOrbit(period_s=0.2 + 0.1 * i, ele=5, r=1.0).sample(nb, config)
        for i in range(s)
    ])
    on = BatchRenderer(db, chunk_blocks=nb, fused=True, tail_tree=True)
    off = BatchRenderer(db, chunk_blocks=nb, fused=True, tail_tree=False)
    got = on.render(signals, positions)
    want = off.render(signals, positions)
    assert np.abs(got - want).max() < 4e-7


def test_tail_tree_oracle_parity(db, config, castanets):
    """tail_tree engine output stays inside the reference-style oracle gate."""
    from jefferson_tpu.oracle.reference import render_oracle

    nb = 32
    pos = CircularOrbit(period_s=0.25, ele=5, r=1.0).sample(nb, config)
    sig = castanets[: nb * config.frames_per_buffer]
    got = Renderer(db, config, chunk_blocks=32, fused=True,
                   tail_tree=True).render(sig, pos)
    want = render_oracle(sig, db, pos, config)
    assert np.abs(got - want).max() < 5e-7


def test_tail_tree_grouped_onehot(db, castanets):
    """The grouped one-hot (wide-mover) kernel honors the flag: tree on/off
    agree within reassociation tolerance and the grouped dispatch runs."""
    from jefferson_tpu.bench.sweep import mover_positions

    cb = 1024
    pos = mover_positions(cb)
    sig = castanets[:40000]
    on = Renderer(db, chunk_blocks=cb, fused=True, tail_tree=True)
    off = Renderer(db, chunk_blocks=cb, fused=True, tail_tree=False)
    got = on.render(sig, pos)
    want = off.render(sig, pos)
    assert on._fd_onehot_grp, "grouped one-hot path was not taken"
    assert off._fd_onehot_grp, "grouped one-hot path was not taken (off arm)"
    assert np.abs(got - want).max() < 4e-7


def test_tail_tree_fused_apply_fallback(castanets):
    """Unaligned geometry (history not a whole number of blocks) routes
    through the fused_apply fallback; it must honor tail_tree and stay
    inside the oracle gate both ways."""
    from jefferson_tpu import EngineConfig, synthetic_database
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check

    cfg = EngineConfig(frames_per_buffer=96, hrtf_len=256)  # pad 512, hist 416
    assert cfg.history_len % cfg.frames_per_buffer != 0
    db96 = synthetic_database(cfg, n_taps=256, seed=8)
    pos = CircularOrbit(period_s=0.2, ele=5, r=1.0).sample(20, cfg)
    outs = {}
    for tree in (False, True):
        outs[tree] = Renderer(db96, cfg, chunk_blocks=10,
                              tail_tree=tree).render(castanets, pos)
    assert np.abs(outs[True] - outs[False]).max() < 4e-7
    want = render_oracle(castanets, db96, [tuple(p) for p in pos], cfg)
    for tree, got in outs.items():
        rep = precision_check(got, want, eps=1e-6)
        assert rep.ok, (tree, str(rep))


def test_tail_dots_tree_bounds():
    """The chunk boundaries cover K exactly for both production widths
    (512 lane512 and 513 classic), and the tree sum matches a float64
    reference to f32 accumulation tolerance in interpret mode."""
    import jax

    from jefferson_tpu.ops import fft as fft_ops
    from jefferson_tpu.pallas.fused_step import _tail_dots

    rng = np.random.default_rng(0)
    for eb in (512, 513):
        qr = (rng.standard_normal((16, eb)) * 4).astype(np.float32)
        qi = (rng.standard_normal((16, eb)) * 4).astype(np.float32)
        icr, ici = fft_ops._idft_tail_matrices(1024, 128)
        icr, ici = icr[:eb], ici[:eb]
        want = (qr.astype(np.float64) @ icr.astype(np.float64)
                + qi.astype(np.float64) @ ici.astype(np.float64))
        for tree in (False, True):
            got = np.asarray(jax.jit(
                lambda a, b, c, d, t=tree: _tail_dots(a, b, c, d, eb, t)
            )(qr, qi, jnp.asarray(icr), jnp.asarray(ici)))
            assert np.abs(got - want).max() < 5e-6, (eb, tree)
