"""Streaming engine tests: scan render and live block API vs oracle/batched."""

import numpy as np
import pytest

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


def test_process_next_sub_block_buffer(db, config):
    """A playback buffer SHORTER than one block tiles modularly (the
    reference's `% length` playhead generalized — the old single-concat
    wrap could not fill 128 frames from a 50-sample buffer and crashed)."""
    fpb = config.frames_per_buffer
    sp = StreamingSpatializer(db, config)
    short = (np.sin(np.arange(50) / 3.0) * 0.1).astype(np.float32)
    sp.buf = short
    sp.set_position(azi=30, ele=0, r=1.0)
    outs = [sp.process_next() for _ in range(3)]
    assert all(o.shape == (fpb, 2) for o in outs)
    # the fed samples must equal fed_stream's tiling of the same signal
    from jefferson_tpu.engine.plan import fed_stream

    want_fed = fed_stream(short, 3, config)
    sp2 = StreamingSpatializer(db, config)
    sp2.set_position(azi=30, ele=0, r=1.0)
    outs2 = [sp2.process_block(want_fed[i * fpb : (i + 1) * fpb]) for i in range(3)]
    np.testing.assert_array_equal(np.concatenate(outs), np.concatenate(outs2))


def test_process_next_wrap_unchanged_for_long_buffers(db, config):
    """The modular wrap is value- and state-identical to the old concat
    wrap for buffers longer than one block (regression pin)."""
    fpb = config.frames_per_buffer
    sig = (np.sin(np.arange(fpb + 37) / 5.0) * 0.1).astype(np.float32)
    sp = StreamingSpatializer(db, config)
    sp.buf = sig
    sp.set_position(azi=10, ele=5, r=0.8)
    fed = []
    count = 0
    for _ in range(4):
        # reproduce the pre-fix concat semantics on the host
        if count + fpb < len(sig):
            fed.append(sig[count : count + fpb])
            count += fpb
        else:
            rem = len(sig) - count
            fed.append(np.concatenate([sig[count:], sig[: fpb - rem]]))
            count = fpb - rem
        out = sp.process_next()
        assert out.shape == (fpb, 2)
        assert sp.count == count
    sp2 = StreamingSpatializer(db, config)
    sp2.set_position(azi=10, ele=5, r=0.8)
    outs2 = [sp2.process_block(b) for b in fed]
    sp3 = StreamingSpatializer(db, config)
    sp3.buf = sig
    sp3.set_position(azi=10, ele=5, r=0.8)
    outs3 = [sp3.process_next() for _ in range(4)]
    np.testing.assert_array_equal(np.concatenate(outs2), np.concatenate(outs3))


def test_cartesian_distance_uses_raw_coordinates(db, config):
    """set_position_cartesian must derive the distance factor from the RAW
    xyz (the oracle's update_from_cartesian semantics), not from a
    reconstruction via the rounded angles — which moves the radius by an
    ulp (review finding)."""
    import numpy as np

    from jefferson_tpu.ops.filters import distance_phase_split
    from jefferson_tpu.trajectory.spatial import radius_from_cartesian

    sp = StreamingSpatializer(db, config)
    xyz = np.asarray([0.51, 0.0, 0.0], np.float32)
    sp.set_position_cartesian(xyz)
    uh, ul, df = (np.asarray(a) for a in sp._distance_current())
    scaled = np.float32(
        np.float32(radius_from_cartesian(xyz)) / np.float32(config.distance_scale)
    )
    wh, wl, wf = distance_phase_split(config.fsvs, scaled[None], config.num_bins)
    np.testing.assert_array_equal(uh, wh[0])
    np.testing.assert_array_equal(ul, wl[0])
    np.testing.assert_array_equal(df, wf[0])
    # switching back to spherical clears the raw coords (planner semantics)
    sp.set_position(azi=270.0, ele=0.0, r=0.51)
    assert sp._coords is None


def test_cartesian_stream_matches_oracle(db, config, castanets):
    """A live cartesian-controlled stream matches the oracle driven through
    update_from_cartesian on the same xyz sequence."""
    import numpy as np

    from jefferson_tpu.oracle.reference import OracleSpatializer
    from jefferson_tpu.rt.control import spherical_to_control_xyz
    from jefferson_tpu.testing import precision_check

    path = [spherical_to_control_xyz(a, 5.0, 0.9) for a in
            (270.0, 270.0, 300.0, 330.0, 0.0, 30.0, 30.0, 60.0)]
    sp = StreamingSpatializer(db, config)
    sp.buf = castanets
    orc = OracleSpatializer(db, config)
    orc.buf = castanets
    got, want = [], []
    for xyz in path:
        sp.set_position_cartesian(xyz)
        got.append(sp.process_next())
        orc.update_from_cartesian(np.asarray(xyz, np.float32))
        orc.feed_from_buf()
        out = orc.process()
        orc.overlap_save()
        want.append(out)
    rep = precision_check(np.concatenate(got), np.concatenate(want), eps=1e-6)
    assert rep.ok, str(rep)


def test_next_block_returns_copies(db, config):
    """THE playhead API must not hand out live views of the buffer (the
    fast path used to return a view while the wrap path returned a copy —
    in-place mutation by a caller corrupted future wraps intermittently)."""
    import numpy as np

    sp = StreamingSpatializer(db, config)
    sp.buf = np.arange(4 * config.frames_per_buffer, dtype=np.float32)
    ref = sp.buf.copy()
    blk = sp.next_block()
    blk[:] = -1.0  # caller mutates the returned block
    np.testing.assert_array_equal(sp.buf, ref)  # buffer untouched
    import pytest

    with pytest.raises(ValueError, match="buf"):
        StreamingSpatializer(db, config).next_block()


def test_block_shape_and_empty_buffer_guards(db, config):
    """The live API's two remaining defensive raises: a mis-shaped block is
    a caller bug (loud error, not a silent pad), and pulling from an EMPTY
    playback buffer must not enter the % length arithmetic (ZeroDivision)."""
    from jefferson_tpu.engine.stream import StreamingSpatializer

    spat = StreamingSpatializer(db, config)
    spat.prime()
    with pytest.raises(ValueError, match="block must be"):
        spat.process_block(np.zeros(config.frames_per_buffer + 1, np.float32))
    spat.buf = np.zeros(0, np.float32)
    with pytest.raises(ValueError, match="playback buffer is empty"):
        spat.next_block()
