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

    assert _is_fused_fallback_error(RuntimeError("x"))
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


def _wide_mover(config, blocks=256, seed=3):
    """Random per-block positions spanning the full sphere: touches far more
    than MAX_ONEHOT_U unique filters per 256-block chunk."""
    rng = np.random.default_rng(seed)
    azi = rng.uniform(0, 360, blocks)
    ele = rng.uniform(-40, 90, blocks)
    return np.stack([azi, ele, np.full(blocks, 1.0)], axis=1)


def test_onehot_subchunking_breaks_the_cliff(db, config, castanets):
    """A chunk touching > MAX_ONEHOT_U unique filters no longer abandons the
    one-hot blend: plan_onehot_chunking halves the chunk size until each
    chunk's unique set fits the VMEM gate, and the render stays correct."""
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import plan_onehot_chunking
    from jefferson_tpu.pallas.fused_step import MAX_ONEHOT_U

    pos = _wide_mover(config)
    plan = make_plan(pos, config)
    total_unique = len(np.unique(plan.idx_new))
    assert total_unique > MAX_ONEHOT_U, "fixture must exceed the VMEM gate"

    cs, u_pad = plan_onehot_chunking(plan, plan.num_blocks, 256)
    assert u_pad is not None and u_pad <= MAX_ONEHOT_U
    assert cs < 256, "expected sub-chunking for the wide mover"

    sig = castanets[:40000]
    got = Renderer(db, chunk_blocks=256, fused=True).render(sig, pos)
    want = Renderer(db, chunk_blocks=256, fused=False).render(sig, pos)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


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
    cs, u_pad = plan_onehot_chunking(plan, blocks, 16, min_cb=8)
    assert cs == 16
    u1 = len(np.unique(np.concatenate([plan.idx_old[:16].reshape(-1),
                                       plan.idx_new[15:16].reshape(-1)])))
    u2 = len(np.unique(np.concatenate([plan.idx_old[16:].reshape(-1),
                                       plan.idx_new[31:32].reshape(-1)])))
    assert u_pad >= max(u1, u2), "bucket must cover the widest chunk"
