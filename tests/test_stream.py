"""Streaming engine tests: scan render and live block API vs oracle/batched."""

import numpy as np

from jefferson_tpu import ProcessType
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.engine.stream import StreamingSpatializer, render_scan
from jefferson_tpu.oracle.reference import render_oracle
from jefferson_tpu.testing import precision_check
from jefferson_tpu.trajectory.trajectory import CircularOrbit


def test_scan_matches_batched(db, config, castanets):
    pos = CircularOrbit(period_s=1.0, ele=3, r=1.2).sample(40, config)
    got = render_scan(castanets, db, pos, config)
    want = Renderer(db, chunk_blocks=64).render(castanets, pos)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)


def test_streaming_spatializer_matches_oracle(db, config, castanets):
    """Live API: feed blocks while moving the source; equals the oracle."""
    sp = StreamingSpatializer(db, config)
    sp.buf = castanets
    fpb = config.frames_per_buffer
    outs = []
    positions = []
    azis = [0, 0, 5, 5, 10, 20, 20, 355, 355, 0]
    eles = [0, 0, 0, 4, 4, -10, -10, 8, 8, 0]
    for azi, ele in zip(azis, eles):
        sp.set_position(azi=azi, ele=ele, r=1.0)
        positions.append((float(azi), float(ele), 1.0))
        outs.append(sp.process_next())
    got = np.concatenate(outs)
    want = render_oracle(castanets, db, positions, config)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)


def test_streaming_cartesian_position(db, config):
    sp = StreamingSpatializer(db, config)
    sp.set_position_cartesian([1.0, 0.0, 0.0])  # +x -> azimuth 270 (reference convention)
    assert sp.azi == 270.0 and sp.ele == 0.0 and abs(sp.r - 1.0) < 1e-6
    sp.set_position_cartesian([0.0, 0.5, -0.5])
    assert sp.azi == 0.0 and sp.ele == 45.0


def test_streaming_clipping_flag(db, config):
    sp = StreamingSpatializer(db, config)
    loud = np.ones(config.frames_per_buffer, np.float32) * 50.0
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)
    sp.process_block(loud)  # let the filter ring build up
    assert sp.clipping


def test_pipeline_latency_mode(db, config, castanets):
    """pipeline_latency=1 reproduces the reference GPU path's one-block
    delay: block 0 is silence, block k emits block k-1's result."""
    from jefferson_tpu.engine.stream import StreamingSpatializer as SS

    sync = SS(db, config)
    lat = SS(db, config, pipeline_latency=1)
    for sp in (sync, lat):
        sp.buf = castanets
        sp.set_position(azi=30, ele=0, r=1.0)
    a = [sync.process_next() for _ in range(5)]
    b = [lat.process_next() for _ in range(5)]
    np.testing.assert_array_equal(b[0], np.zeros_like(b[0]))
    for k in range(1, 5):
        np.testing.assert_array_equal(b[k], a[k - 1])


def test_block_step_shared_across_instances(db, config):
    """Stream sessions share ONE jitted block step per config — a
    per-instance jax.jit(partial(...)) wrapper recompiled and retained a
    fresh executable per session (~33 MiB RSS per stream session under the
    daemon soak, round 4)."""
    from jefferson_tpu.engine.stream import StreamingSpatializer, _jitted_block_step

    a = StreamingSpatializer(db, config)
    b = StreamingSpatializer(db, config)
    assert a._step is b._step
    assert a._step is _jitted_block_step(config)
    # a distinct config still gets its own program
    import dataclasses

    other = dataclasses.replace(config, source_gain=0.5)
    assert _jitted_block_step(other) is not a._step
