"""Pipelined output fetch (``Renderer(pipeline_fetch=True)``).

The opt-in chunk-loop pipelining dispatches chunk i+1 before fetching chunk
i's output (ROADMAP's output-fetch candidate; designed for direct-attached
TPUs where fetch ~ compute — unmeasurable through this environment's host
relay, so correctness is what these tests pin).  The hard part is the
strike machinery: a run-stage failure that would have surfaced at the
synchronous ``np.asarray`` now surfaces ONE CHUNK LATE, after its successor
was already dispatched from the (poisoned) failed history.  The contract:

- the failure is strike-counted against the arm that PRODUCED it, never
  the arm that happened to be dispatching when it surfaced;
- both affected chunks are re-rendered via the always-available XLA chunk
  program from the saved pre-chunk history (no garbage rows in ``out``);
- non-fallback-class deferred errors propagate, exactly as in sync mode;
- with no failures, pipelined output is BIT-IDENTICAL to sync output
  (same programs, same call order, same operands).
"""

import numpy as np
import pytest

from jefferson_tpu import ProcessType
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.trajectory.trajectory import AzimuthSweep, CircularOrbit


def _mover(config, blocks=48):
    return CircularOrbit(period_s=0.3, ele=5, r=1.0).sample(blocks, config)


def _holder(config, blocks=48):
    """Positions persist across blocks -> the dedup(+fused) path."""
    return AzimuthSweep(
        start_azi=0, ele=0, r=0.5, step_deg=5.0, blocks_per_step=16, num_steps=3
    ).sample(blocks, config)


class _Poison:
    """Stands in for a device array whose async run-stage failure surfaces
    at materialization (the remote-runtime failure mode PERF.md documents);
    ``np.asarray`` on it raises the wrapped exception."""

    def __init__(self, exc):
        self._exc = exc

    def __array__(self, *a, **k):
        raise self._exc


def _inject(renderer, maker_attr, call_no, exc):
    """Wrap a lazy program maker so the program's ``call_no``-th invocation
    returns a poisoned output (valid history — the machinery must not rely
    on the history also failing)."""
    real_mk = getattr(renderer, maker_attr)
    calls = {"n": 0}

    def mk(*a, **k):
        real = real_mk(*a, **k)

        def fn(*args, **kw):
            y, h = real(*args, **kw)
            calls["n"] += 1
            if calls["n"] == call_no:
                return _Poison(exc), h
            return y, h

        return fn

    setattr(renderer, maker_attr, mk)
    return calls


@pytest.mark.parametrize(
    "kw,pos_fn",
    [
        ({"fused": True}, _holder),            # dedup+fused arm
        ({"fused": True, "dedup": False}, _mover),   # one-hot arm
        ({"fused": False}, _mover),            # plain XLA arm
        ({"fused": False}, _holder),           # XLA dedup arm
    ],
)
def test_pipelined_bit_identical(db, config, castanets, kw, pos_fn):
    """No-failure pipelining runs the same programs on the same operands in
    the same order as sync mode -> bit-identical, incl. a partial final
    chunk (40 blocks over cb=16)."""
    sig = castanets[:8000]
    pos = pos_fn(config, blocks=40)
    want = Renderer(db, chunk_blocks=16, **kw).render(sig, pos)
    got = Renderer(db, chunk_blocks=16, pipeline_fetch=True, **kw).render(sig, pos)
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "ptype", [ProcessType.TPU_FD_BASIC, ProcessType.TPU_TD]
)
def test_pipelined_bit_identical_basic_td(db, config, castanets, ptype):
    sig = castanets[:8000]
    pos = _mover(config, blocks=40)
    want = Renderer(db, chunk_blocks=16).render(sig, pos, ptype)
    got = Renderer(db, chunk_blocks=16, pipeline_fetch=True).render(sig, pos, ptype)
    assert np.array_equal(got, want)


def test_pipelined_mesh_bit_identical(db, config, castanets):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 virtual devices")
    mesh = Mesh(np.array(devs[:2]), ("blk",))
    sig = castanets[:8000]
    pos = _mover(config, blocks=40)
    want = Renderer(db, chunk_blocks=16, mesh=mesh).render(sig, pos)
    got = Renderer(db, chunk_blocks=16, mesh=mesh, pipeline_fetch=True).render(
        sig, pos
    )
    assert np.array_equal(got, want)


def test_deferred_failure_mid_render_redo(db, config, castanets, capsys):
    """Poison the dedup+fused program's SECOND chunk: the failure surfaces
    while chunk 3 is already dispatched from the poisoned history.  Both
    chunks must be re-rendered from the saved clean history, the strike
    must land on the dedup arm, and every output row must be real."""
    sig = castanets[:8000]
    pos = _holder(config)  # 48 blocks -> 3 chunks of 16
    want = Renderer(db, chunk_blocks=16, fused=True).render(sig, pos)
    want_xla = Renderer(db, chunk_blocks=16, fused=False).render(sig, pos)

    r = Renderer(db, chunk_blocks=16, fused=True, pipeline_fetch=True)
    _inject(r, "_mk_fd_dedup_fused", 2, OSError("injected deferred run failure"))
    got = r.render(sig, pos)

    err = capsys.readouterr().err
    assert "deferred-fetch redo" in err
    assert "injected deferred run failure" in err
    # strike recorded against the dedup arm (key layout: ("dedup", ...))
    assert any(k[0] == "dedup" for k in r._fused_strikes), r._fused_strikes
    # chunk 0 ran fused (bit-equal to the sync fused render); the redone
    # chunks ran the XLA program — gate everything at the engine tolerance
    # against BOTH references (fused and XLA agree within 2e-7 by the
    # parity invariant)
    fpb = config.frames_per_buffer
    assert np.array_equal(got[: 16 * fpb], want[: 16 * fpb])
    for ref in (want, want_xla):
        assert np.max(np.abs(got - ref)) < 1e-6
    assert np.all(np.isfinite(got))


def test_deferred_failure_on_final_chunk_drains(db, config, castanets, capsys):
    """Poison the LAST chunk: the post-loop drain must detect it and write
    the redone rows (no successor to re-dispatch)."""
    sig = castanets[:8000]
    pos = _holder(config)
    want = Renderer(db, chunk_blocks=16, fused=True).render(sig, pos)

    r = Renderer(db, chunk_blocks=16, fused=True, pipeline_fetch=True)
    _inject(r, "_mk_fd_dedup_fused", 3, OSError("injected at final chunk"))
    got = r.render(sig, pos)

    assert "injected at final chunk" in capsys.readouterr().err
    fpb = config.frames_per_buffer
    assert np.array_equal(got[: 32 * fpb], want[: 32 * fpb])
    assert np.max(np.abs(got - want)) < 1e-6
    assert np.all(np.isfinite(got))


def test_deferred_genuine_bug_propagates(db, config, castanets):
    """A deferred ValueError is a program bug, not a runtime-stack failure:
    it must propagate from the flush, never be absorbed into a fallback."""
    sig = castanets[:8000]
    r = Renderer(db, chunk_blocks=16, fused=True, pipeline_fetch=True)
    _inject(r, "_mk_fd_dedup_fused", 1, ValueError("genuine deferred bug"))
    with pytest.raises(ValueError, match="genuine deferred bug"):
        r.render(sig, _holder(config))


def _scene(config, s=4, blocks=40, hold=True):
    if hold:
        pos = np.stack([
            AzimuthSweep(start_azi=10 * i, ele=0, r=0.5, step_deg=5.0,
                         blocks_per_step=16, num_steps=3).sample(blocks, config)
            for i in range(s)
        ])
    else:
        pos = np.stack([
            CircularOrbit(period_s=0.2 + 0.1 * i, ele=5, r=1.0).sample(blocks, config)
            for i in range(s)
        ])
    return pos


@pytest.mark.parametrize(
    "kw,hold",
    [
        ({"fused": True}, True),                   # dedup+fused batch arm
        ({"fused": True, "dedup": False}, False),  # one-hot/gather batch arm
        ({"fused": False}, False),                 # direct XLA batch arm
        ({"fused": False}, True),                  # XLA dedup batch arm
    ],
)
def test_batch_pipelined_bit_identical(db, config, castanets, kw, hold):
    from jefferson_tpu.engine.batch import BatchRenderer

    s, blocks = 4, 40
    rng = np.random.default_rng(3)
    sigs = np.stack([castanets[:8000]] * s) * rng.uniform(0.5, 1.0, (s, 1))
    pos = _scene(config, s, blocks, hold)
    want = BatchRenderer(db, chunk_blocks=8, **kw).render(sigs, pos)
    got = BatchRenderer(db, chunk_blocks=8, pipeline_fetch=True, **kw).render(
        sigs, pos
    )
    assert np.array_equal(got, want)


def test_batch_pipelined_mesh_bit_identical(db, config, castanets):
    import jax
    from jax.sharding import Mesh

    from jefferson_tpu.engine.batch import BatchRenderer

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("src",))
    s = 8
    sigs = np.stack([castanets[:8000]] * s)
    pos = _scene(config, s, 40, hold=True)
    want = BatchRenderer(db, chunk_blocks=8, mesh=mesh, mix=True).render(sigs, pos)
    got = BatchRenderer(
        db, chunk_blocks=8, mesh=mesh, mix=True, pipeline_fetch=True
    ).render(sigs, pos)
    assert np.array_equal(got, want)


def test_batch_deferred_failure_redo(db, config, castanets, capsys):
    """Poison the batched dedup+fused program's second chunk: strike lands
    on the dedup_fused arm, both affected chunks re-render via the XLA
    batch program, output stays within the engine tolerance."""
    from jefferson_tpu.engine.batch import BatchRenderer

    s, blocks = 4, 40
    sigs = np.stack([castanets[:8000]] * s)
    pos = _scene(config, s, blocks, hold=True)
    want = BatchRenderer(db, chunk_blocks=8, fused=True).render(sigs, pos)
    want_xla = BatchRenderer(db, chunk_blocks=8, fused=False).render(sigs, pos)

    br = BatchRenderer(db, chunk_blocks=8, fused=True, pipeline_fetch=True)
    real_get = br._get_fn
    calls = {"n": 0}

    def fake_get(nb_, **kw):
        fn = real_get(nb_, **kw)
        if kw.get("fused_tb") is None:
            return fn

        def wrapped(*a, **k):
            y, h = fn(*a, **k)
            calls["n"] += 1
            if calls["n"] == 2:
                return _Poison(OSError("injected batch deferred failure")), h
            return y, h

        return wrapped

    br._get_fn = fake_get
    got = br.render(sigs, pos)

    err = capsys.readouterr().err
    assert "deferred-fetch redo" in err
    assert any(k[0] == "dedup_fused" for k in br._fused_strikes), br._fused_strikes
    for ref in (want, want_xla):
        assert np.max(np.abs(got - ref)) < 1e-6
    assert np.all(np.isfinite(got))


def test_batch_deferred_genuine_bug_propagates(db, config, castanets):
    from jefferson_tpu.engine.batch import BatchRenderer

    s = 4
    sigs = np.stack([castanets[:8000]] * s)
    pos = _scene(config, s, 40, hold=True)
    br = BatchRenderer(db, chunk_blocks=8, fused=True, pipeline_fetch=True)
    real_get = br._get_fn

    def fake_get(nb_, **kw):
        fn = real_get(nb_, **kw)
        if kw.get("fused_tb") is None:
            return fn
        return lambda *a, **k: (_Poison(ValueError("genuine batch bug")), fn(*a, **k)[1])

    br._get_fn = fake_get
    with pytest.raises(ValueError, match="genuine batch bug"):
        br.render(sigs, pos)


def test_cli_pipeline_fetch_bit_identical(tmp_path, castanets):
    """--pipeline-fetch reaches Renderer and changes nothing audible."""
    from jefferson_tpu.cli.main import main as cli_main
    from jefferson_tpu.io.wavio import read_wav, write_wav

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:8000], 44100, bits=24)
    common = ["-i", str(src), "--blocks", "20", "--chunk-blocks", "16",
              "--trajectory", "orbit:period=1,r=1", "--quiet", "--float",
              "--bits", "32"]
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    assert cli_main(["-o", str(a)] + common) == 0
    assert cli_main(["-o", str(b), "--pipeline-fetch"] + common) == 0
    ya, _ = read_wav(a)
    yb, _ = read_wav(b)
    assert np.array_equal(ya, yb)


def test_deferred_failure_retried_next_render(db, config, castanets, capsys):
    """One deferred flaky failure must not disable the fused variant for
    the instance (same retry contract as the sync strike machinery)."""
    sig = castanets[:8000]
    pos = _holder(config)
    r = Renderer(db, chunk_blocks=16, fused=True, pipeline_fetch=True)
    _inject(r, "_mk_fd_dedup_fused", 1, OSError("one flaky run"))
    first = r.render(sig, pos)
    capsys.readouterr()
    second = r.render(sig, pos)  # wrapper only poisons call 1 -> clean
    assert "warning" not in capsys.readouterr().err
    assert not any(
        v >= 2 for v in r._fused_strikes.values()
    ), r._fused_strikes
    assert np.max(np.abs(first - second)) < 1e-6
