"""Fused-kernel fallback semantics (single-source Renderer).

The deployed TPU stack compiles Mosaic kernels through a flaky remote
service (PERF.md), so runtime-stack failures must degrade gracefully to the
XLA path — but genuine program bugs must PROPAGATE, and one failure must not
disable fused kernels for the life of the instance (renderer retries on the
next render).
"""

import numpy as np
import pytest

from jefferson_tpu.engine.renderer import Renderer, _is_fused_fallback_error
from jefferson_tpu.testing import precision_check
from jefferson_tpu.trajectory.trajectory import AzimuthSweep, CircularOrbit


def _mover(config, blocks=32):
    return CircularOrbit(period_s=0.3, ele=5, r=1.0).sample(blocks, config)


def _holder(config, blocks=32):
    """Positions persist across blocks -> dedup (+fused) path."""
    return AzimuthSweep(
        start_azi=0, ele=0, r=0.5, step_deg=5.0, blocks_per_step=16, num_steps=1
    ).sample(blocks, config)


def _raising(exc):
    def mk(*a, **k):
        def fn(*args, **kw):
            raise exc
        return fn
    return mk


def test_error_classifier():
    import jax

    # bare RuntimeError: absorbed only with a compile-service signature in
    # the message (round-3 advisor); otherwise it's a program bug
    assert _is_fused_fallback_error(RuntimeError("tpu_compile_helper exit 1"))
    assert _is_fused_fallback_error(RuntimeError("remote service HTTP 500"))
    assert not _is_fused_fallback_error(RuntimeError("x"))
    assert not _is_fused_fallback_error(RuntimeError("bug in kernel wrapper"))
    assert _is_fused_fallback_error(jax.errors.JaxRuntimeError("x"))
    assert _is_fused_fallback_error(OSError("conn reset"))
    assert not _is_fused_fallback_error(ValueError("shape bug"))
    assert not _is_fused_fallback_error(TypeError("bad arg"))
    assert not _is_fused_fallback_error(AssertionError())
    assert not _is_fused_fallback_error(IndexError())


def test_mover_fallback_ladder(db, config, castanets, capsys):
    """one-hot fails -> gather fails -> XLA output still correct; fused not
    permanently disabled; real messages surfaced."""
    sig = castanets[:8000]
    pos = _mover(config)
    want = Renderer(db, chunk_blocks=16, fused=False).render(sig, pos)

    r = Renderer(db, chunk_blocks=16, fused=True)
    r._mk_fd_onehot = _raising(RuntimeError("onehot: tpu_compile_helper exit 1"))
    r._mk_fd_fused = _raising(RuntimeError("gather: HTTP 500"))
    got = r.render(sig, pos)
    err = capsys.readouterr().err
    assert "tpu_compile_helper exit 1" in err
    assert "HTTP 500" in err
    assert r.fused, "one flaky compile must not disable fused for the instance"
    rep = precision_check(got, want, eps=1e-7)
    assert rep.ok, str(rep)


def test_genuine_bug_propagates(db, config, castanets):
    sig = castanets[:8000]
    r = Renderer(db, chunk_blocks=16, fused=True)
    r._mk_fd_onehot = _raising(ValueError("genuine index bug in the kernel wrapper"))
    with pytest.raises(ValueError, match="genuine index bug"):
        r.render(sig, _mover(config))


def test_dedup_fused_fallback(db, config, castanets, capsys):
    sig = castanets[:8000]
    pos = _holder(config)
    want = Renderer(db, chunk_blocks=16, fused=False).render(sig, pos)
    r = Renderer(db, chunk_blocks=16, fused=True)
    r._mk_fd_dedup_fused = _raising(RuntimeError("dedup+fused: RESOURCE_EXHAUSTED"))
    got = r.render(sig, pos)
    err = capsys.readouterr().err
    assert "dedup+fused" in err and "RESOURCE_EXHAUSTED" in err
    rep = precision_check(got, want, eps=1e-7)
    assert rep.ok, str(rep)


def test_onehot_grouped_breaks_the_cliff(db, config, castanets):
    """A chunk touching > MAX_ONEHOT_U unique filters no longer abandons the
    one-hot blend: the chunk's tiles blend against per-GROUP compact tables
    (one kernel dispatch either way — host-side sub-chunking was measured
    5.3x slower through the relay, PERF.md), and the render stays correct."""
    from jefferson_tpu.bench.sweep import mover_positions
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import plan_onehot_chunking
    from jefferson_tpu.pallas.fused_step import MAX_ONEHOT_U

    cb = 1024
    pos = mover_positions(cb)  # full-sphere gradual mover
    plan = make_plan(pos, config)
    total_unique = len(np.unique(plan.idx_new))
    assert total_unique > MAX_ONEHOT_U, "fixture must exceed the VMEM gate"

    group, u_pad = plan_onehot_chunking(plan, plan.num_blocks, cb, tb=256)
    assert u_pad is not None and u_pad <= MAX_ONEHOT_U
    assert group < cb, "expected per-group tables for the wide mover"

    sig = castanets[:40000]
    r = Renderer(db, chunk_blocks=cb, fused=True)
    got = r.render(sig, pos)
    assert r._fd_onehot_grp, "grouped one-hot path was not taken"
    want = Renderer(db, chunk_blocks=cb, fused=False).render(sig, pos)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_compact_filter_ids_grouped_roundtrip(db, config):
    """Grouped remapping resolves every row and boundary id back to the
    original filter ids."""
    from jefferson_tpu.bench.sweep import mover_positions
    from jefferson_tpu.engine.plan import compact_filter_ids_grouped, make_plan

    b, group, tb = 512, 256, 128
    plan = make_plan(mover_positions(b), config)
    io = plan.idx_old
    last = plan.idx_new[-1:]
    uniq_ids, ridx, rbnd = compact_filter_ids_grouped(io, last, group, tb, 256)
    assert uniq_ids.shape == (b // group * 256,)
    # every remapped row resolves to the original id via its group's table
    for blk in range(0, b, 37):
        g = blk // group
        table = uniq_ids[g * 256 : (g + 1) * 256]
        np.testing.assert_array_equal(table[ridx[blk]], io[blk])
    # boundary rows: tile i's patch = old row at (i+1)*tb, final = last
    for i in range(b // tb):
        g = (i * tb) // group
        table = uniq_ids[g * 256 : (g + 1) * 256]
        want = io[(i + 1) * tb] if (i + 1) * tb < b else last[0]
        np.testing.assert_array_equal(table[rbnd[i]], want)


def test_onehot_render_wide_bucket(db, config):
    """Chunks straddling a power-of-two unique count share ONE u_pad bucket
    (one compiled one-hot program per render — ADVICE r2)."""
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import plan_onehot_chunking

    # chunk 1 narrow (few uniques), chunk 2 wider
    blocks = 32
    pos = np.zeros((blocks, 3), np.float32)
    pos[:, 2] = 1.0
    pos[:16, 0] = np.arange(16)            # azi 0..15 (few filters)
    pos[16:, 0] = np.arange(16) * 20       # azi 0..300 (more filters)
    plan = make_plan(pos, config)
    group, u_pad = plan_onehot_chunking(plan, blocks, 16, tb=8)
    assert group == 16  # narrow chunks: no grouping needed
    u1 = len(np.unique(np.concatenate([plan.idx_old[:16].reshape(-1),
                                       plan.idx_old[16:17].reshape(-1)])))
    u2 = len(np.unique(np.concatenate([plan.idx_old[16:].reshape(-1),
                                       plan.idx_new[31:32].reshape(-1)])))
    assert u_pad >= max(u1, u2), "bucket must cover the widest chunk"


def test_plan_onehot_chunking_nonpow2_chunk(db, config):
    """Halving must preserve tile divisibility: a 1536-block chunk with
    tb=256 may group at 768 but never 384 (review finding r3)."""
    from jefferson_tpu.bench.sweep import mover_positions
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import plan_onehot_chunking

    pos = mover_positions(1536, ele_period=700)
    pos[:, 0] = (np.arange(1536) * 1.7) % 360  # widen the filter set
    plan = make_plan(pos, config)
    group, u_pad = plan_onehot_chunking(plan, 1536, 1536, tb=256)
    if u_pad is not None:
        assert group % 256 == 0 and 1536 % group == 0
    # and the render path must not crash regardless of outcome
    sig = np.random.default_rng(0).standard_normal(1536 * 128).astype(np.float32) * 0.1
    r = Renderer(db, chunk_blocks=1536, fused=True)
    out = r.render(sig, pos)
    assert np.isfinite(out).all()


def test_fused_strike_cap(db, config, castanets, capsys):
    """A deterministically-failing fused variant stops being attempted
    after _MAX_FUSED_STRIKES renders (no per-render compile re-pay for a
    long-lived instance, e.g. the serve daemon) — review finding r3."""
    from jefferson_tpu.engine.renderer import _MAX_FUSED_STRIKES

    sig = castanets[:8000]
    pos = _mover(config)
    calls = {"n": 0}

    def mk(*a, **k):
        def fn(*args, **kw):
            calls["n"] += 1
            raise RuntimeError("deterministic Mosaic lowering failure")
        return fn

    r = Renderer(db, chunk_blocks=32, fused=True)
    r._mk_fd_onehot = mk
    r._mk_fd_onehot_grp = mk
    r._mk_fd_fused = mk
    for _ in range(4):
        out = r.render(sig, pos)
        assert np.isfinite(out).all()
    # onehot and gather each failed at most _MAX_FUSED_STRIKES times total
    assert calls["n"] == 2 * _MAX_FUSED_STRIKES, calls
    err = capsys.readouterr().err
    assert "disabled for this instance" in err


def test_grouped_onehot_fallback(db, config, castanets, capsys):
    """A compile-class failure of the GROUPED one-hot program falls down the
    same ladder (gather-fused next) with the message surfaced and the render
    still correct — the grouped arm has its own program cache and strike key
    (okey carries nd), so it must absorb strikes independently."""
    from jefferson_tpu.bench.sweep import mover_positions

    pos = mover_positions(1024)  # full-sphere wide mover -> grouped tables
    sig = castanets[:40000]
    want = Renderer(db, chunk_blocks=1024, fused=False).render(sig, pos)

    r = Renderer(db, chunk_blocks=1024, fused=True)
    r._mk_fd_onehot_grp = _raising(RuntimeError("grouped: tpu_compile_helper exit 1"))
    got = r.render(sig, pos)
    err = capsys.readouterr().err
    assert "tpu_compile_helper exit 1" in err
    assert not r._fd_onehot_grp and r._fd_fused, \
        "expected the gather-fused programs after the grouped failure"
    assert r.fused, "one flaky compile must not disable fused for the instance"
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_grouped_onehot_genuine_bug_propagates(db, config, castanets):
    from jefferson_tpu.bench.sweep import mover_positions

    r = Renderer(db, chunk_blocks=1024, fused=True)
    r._mk_fd_onehot_grp = _raising(ValueError("genuine shape bug in the grouped wrapper"))
    with pytest.raises(ValueError, match="genuine shape bug"):
        r.render(castanets[:40000], mover_positions(1024))


def test_fused_supported_survives_backend_probe_failure(monkeypatch):
    """A dead/unreachable backend (jax.devices raising) means 'no fused
    kernels', never a crash at dispatch-planning time."""
    import jax

    from jefferson_tpu.engine import renderer as r

    def boom():
        raise RuntimeError("backend unavailable")

    monkeypatch.setattr(jax, "devices", boom)
    assert r.fused_supported() is False
