"""Realtime playout adapter: fake-device callback loop + deadline stats."""

import time

import numpy as np
import pytest

from jefferson_tpu.engine.stream import StreamingSpatializer
from jefferson_tpu.io.wavio import StreamingWavWriter, read_wav
from jefferson_tpu.rt.playout import AudioPlayout, BlockStats, have_output_device
from jefferson_tpu.testing import precision_check


def _src(db, config, castanets, azi=30.0, roll=0):
    s = StreamingSpatializer(db, config)
    s.set_position(azi=azi, ele=0, r=1.0)
    s.buf = np.roll(castanets, roll)[: 4000].astype(np.float32)
    return s


def test_offline_playout_mixes_and_writes(db, config, castanets, tmp_path):
    """Fake-device loop == sum of per-source streams; WAV appended per block."""
    nb = 40
    mixed_srcs = [_src(db, config, castanets), _src(db, config, castanets, azi=300.0, roll=500)]
    wav = tmp_path / "live.wav"
    writer = StreamingWavWriter(wav, config.sample_rate, bits=24)
    play = AudioPlayout(mixed_srcs, config, writer=writer)
    stats = play.run_offline(nb)
    writer.close()

    assert stats.blocks == nb
    assert stats.budget_ms == pytest.approx(1e3 * config.frames_per_buffer / config.sample_rate)
    assert stats.avg_ms > 0 and stats.max_ms >= stats.avg_ms >= 0

    # the same two sources separately, summed
    want = np.zeros((nb * config.frames_per_buffer, 2), np.float32)
    for azi, roll in [(30.0, 0), (300.0, 500)]:
        s = _src(db, config, castanets, azi=azi, roll=roll)
        for b in range(nb):
            want[b * config.frames_per_buffer : (b + 1) * config.frames_per_buffer] += (
                s.process_next()
            )
    got, sr = read_wav(wav)
    assert sr == config.sample_rate
    rep = precision_check(got, want, eps=2e-7)  # 24-bit quantization floor
    assert rep.ok, str(rep)


def test_prime_does_not_mutate_state(db, config, castanets):
    a = _src(db, config, castanets)
    b = _src(db, config, castanets)
    a.prime()
    for _ in range(5):
        ya, yb = a.process_next(), b.process_next()
        rep = precision_check(ya, yb, eps=0.0)
        assert rep.ok, str(rep)


def test_deadline_miss_accounting(config):
    """A source slower than the block budget is counted as a miss."""
    budget_s = config.block_duration

    def slow():
        time.sleep(budget_s * 1.5)
        return np.zeros((config.frames_per_buffer, 2), np.float32)

    play = AudioPlayout([slow], config)
    stats = play.run_offline(3)
    assert stats.blocks == 3
    assert stats.misses == 3
    assert stats.miss_rate == 1.0
    assert stats.max_ms > stats.budget_ms
    assert "deadline misses" in stats.summary()


def test_paced_run_holds_cadence(config):
    """Paced mode takes at least num_blocks * block_duration of wall time."""
    fast = lambda: np.zeros((config.frames_per_buffer, 2), np.float32)
    play = AudioPlayout([fast], config)
    nb = 20
    t0 = time.perf_counter()
    play.run_offline(nb, paced=True)
    elapsed = time.perf_counter() - t0
    assert elapsed >= (nb - 1) * config.block_duration


def test_clipping_alert(config):
    loud = lambda: np.full((config.frames_per_buffer, 2), 1.5, np.float32)
    play = AudioPlayout([loud], config)
    play.run_offline(1)
    assert play.clipping


def test_play_degrades_gracefully(db, config, castanets):
    """Without sounddevice/a device, play() raises a clear error (and the
    probe reports unavailability) instead of crashing obscurely."""
    if have_output_device():
        pytest.skip("host has a real output device; live path would run")
    play = AudioPlayout([_src(db, config, castanets)], config)
    with pytest.raises(RuntimeError, match="sounddevice|output device"):
        play.play(num_blocks=2)


def test_playout_requires_sources(config):
    with pytest.raises(ValueError):
        AudioPlayout([], config)


def test_position_caches_bounded(db, config, castanets):
    """A continuously varying position must not grow the memos unboundedly."""
    s = _src(db, config, castanets)
    s._CACHE_CAP = 16
    for b in range(64):
        s.set_position(azi=(b * 7) % 360, ele=0, r=1.0 + 0.001 * b)
        s.process_next()
    assert len(s._dist_cache) <= 16
    assert len(s._interp_cache) <= 16


def test_rt_cli_offline(db, config, castanets, tmp_path, monkeypatch):
    """python -m jefferson_tpu.rt end-to-end in fake-device mode."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:, None].repeat(2, 1), config.sample_rate)
    out = tmp_path / "live.wav"
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")
    rc = main(["-i", str(src), "-o", str(out), "--seconds", "0.3",
               "--trajectory", "orbit:period=1"])
    assert rc == 0
    y, sr = read_wav(out)
    assert sr == config.sample_rate
    assert y.shape[0] == int(np.ceil(0.3 / config.block_duration)) * config.frames_per_buffer
    assert np.isfinite(y).all() and np.abs(y).max() > 0


def test_rt_cli_live_reverb(db, config, castanets, tmp_path, monkeypatch):
    """--reverb runs the streaming convolver ahead of the spatializer."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:8000], config.sample_rate)
    ir = np.zeros(400, np.float32)
    ir[0], ir[350] = 1.0, 0.7  # identity + audible echo
    irp = tmp_path / "ir.wav"
    write_wav(irp, ir, config.sample_rate, bits=32, float_format=True)
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")

    dry, wet = tmp_path / "dry.wav", tmp_path / "wet.wav"
    assert main(["-i", str(src), "-o", str(dry), "--seconds", "0.2"]) == 0
    assert main(["-i", str(src), "-o", str(wet), "--seconds", "0.2",
                 "--reverb", str(irp)]) == 0
    yd, _ = read_wav(dry)
    yw, _ = read_wav(wet)
    assert np.isfinite(yw).all()
    assert np.abs(yw - yd).max() > 1e-4  # the echo is audible in the mix


def test_prime_through_wrapper(db, config, castanets):
    """AudioPlayout primes duck-typed sources (wrapper carrying .prime)."""
    s = _src(db, config, castanets)
    primed = {"n": 0}

    def wrapper():
        return s.process_next()

    def prime():
        primed["n"] += 1
        s.prime()

    wrapper.prime = prime
    AudioPlayout([wrapper], config).run_offline(2)
    assert primed["n"] == 1


def test_rt_cli_flushes_writer_on_playout_exception(db, config, castanets,
                                                    tmp_path, monkeypatch):
    """An exception mid-playout must still patch the streaming WAV header
    (writer.close() lives in the finally now — round-5 review): the blocks
    written before the failure survive as a readable partial render."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main
    from jefferson_tpu.rt.playout import AudioPlayout

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:4000], config.sample_rate)
    out = tmp_path / "partial.wav"
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")

    real = AudioPlayout.run_offline

    def exploding(self, num_blocks, **kw):
        real(self, 3, **kw)  # write 3 real blocks, then fail mid-stream
        raise RuntimeError("device vanished")

    monkeypatch.setattr(AudioPlayout, "run_offline", exploding)
    with pytest.raises(RuntimeError, match="device vanished"):
        main(["-i", str(src), "-o", str(out), "--seconds", "0.3"])
    y, sr = read_wav(out)  # header must be patched, not 0 data bytes
    assert sr == config.sample_rate
    assert y.shape[0] == 3 * config.frames_per_buffer
    assert np.isfinite(y).all()


class _FakeSD:
    """Minimal sounddevice stand-in: a blocking OutputStream that drives the
    registered callback synchronously (frames overridable to test the
    blocksize guard)."""

    class CallbackStop(Exception):
        pass

    class CallbackAbort(Exception):
        pass

    def __init__(self, frames=None):
        self._frames = frames
        self.last_outdata = None

    def OutputStream(self, samplerate, blocksize, channels, dtype,
                     callback, finished_callback, device):
        fake = self

        class _Stream:
            def __enter__(self):
                # bounded: a regression that never raises CallbackStop must
                # FAIL the test, not hang the suite (round-5 test review)
                for _ in range(100_000):
                    out = np.full((blocksize, channels), np.nan, np.float32)
                    try:
                        callback(out, fake._frames or blocksize, None, None)
                    except (fake.CallbackStop, fake.CallbackAbort):
                        fake.last_outdata = out
                        break
                else:
                    raise AssertionError(
                        "fake device callback never raised CallbackStop")
                finished_callback()
                return self

            def __exit__(self, *exc):
                return False

        return _Stream()


def test_play_through_fake_sounddevice(db, config, castanets, monkeypatch):
    """play() drives the device callback to num_blocks, zero-fills the final
    (post-stop) buffer instead of emitting garbage, and returns the stats."""
    import jefferson_tpu.rt.playout as pl

    fake = _FakeSD()
    monkeypatch.setattr(pl, "_sounddevice", lambda: fake)
    play = AudioPlayout([_src(db, config, castanets)], config)
    stats = play.play(num_blocks=3)
    assert stats.blocks == 3
    # the stop buffer was zeroed (constructed as NaN; garbage would be audible)
    assert fake.last_outdata is not None
    np.testing.assert_array_equal(fake.last_outdata, 0.0)


def test_play_blocksize_mismatch_surfaces(db, config, castanets, monkeypatch):
    """A device delivering foreign blocksizes aborts with the clear error,
    not an audible glitch loop."""
    import jefferson_tpu.rt.playout as pl

    monkeypatch.setattr(pl, "_sounddevice", lambda: _FakeSD(frames=64))
    play = AudioPlayout([_src(db, config, castanets)], config)
    with pytest.raises(RuntimeError, match="device blocksize 64"):
        play.play(num_blocks=3)


def test_play_source_error_surfaces(config, monkeypatch):
    """An exception inside a source crosses the callback boundary and is
    re-raised from play() (the reference glitches forever instead)."""
    import jefferson_tpu.rt.playout as pl

    monkeypatch.setattr(pl, "_sounddevice", lambda: _FakeSD())

    def boom():
        raise ValueError("synthetic source failure")

    play = AudioPlayout([boom], config)
    with pytest.raises(ValueError, match="synthetic source failure"):
        play.play(num_blocks=2)


def test_rt_cli_keys_without_tty(db, config, castanets, tmp_path, monkeypatch, capsys):
    """--keys on a non-TTY stdin degrades to the programmatic-control notice
    and still renders (the key thread is simply absent)."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:6000], config.sample_rate)
    out = tmp_path / "keys.wav"
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")
    rc = main(["-i", str(src), "-o", str(out), "--seconds", "0.2", "--keys"])
    assert rc == 0
    assert "stdin is not a TTY" in capsys.readouterr().err
    y, sr = read_wav(out)
    assert sr == config.sample_rate and np.isfinite(y).all()


def test_rt_cli_input_validation(db, config, castanets, tmp_path, monkeypatch):
    """--seconds <= 0, empty inputs, and bad trajectories exit with the
    one-line messages."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:4000], config.sample_rate)
    empty = tmp_path / "empty.wav"
    write_wav(empty, np.zeros(0, np.float32), config.sample_rate)
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")
    out = tmp_path / "o.wav"
    with pytest.raises(SystemExit, match="must be > 0"):
        main(["-i", str(src), "-o", str(out), "--seconds", "0"])
    with pytest.raises(SystemExit, match="is empty"):
        main(["-i", str(empty), "-o", str(out), "--seconds", "0.2"])
    with pytest.raises(SystemExit, match="unknown trajectory"):
        main(["-i", str(src), "-o", str(out), "--seconds", "0.2",
              "--trajectory", "spiral:x=1"])


def test_rt_cli_keys_over_pty_drives_readout_and_quit(db, config, castanets,
                                                      tmp_path, monkeypatch,
                                                      capsys):
    """--keys on a real pty: the key thread starts, a move key updates the
    live position readout, and 'q' ends the session early; the terminal is
    restored afterwards."""
    import os
    import pty
    import sys
    import termios
    import threading

    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.rt.__main__ import main

    src = tmp_path / "in.wav"
    write_wav(src, castanets[:24000], config.sample_rate)
    out = tmp_path / "keys_pty.wav"
    monkeypatch.setenv("JEFFERSON_HRTF_DIR", "")

    master, slave = pty.openpty()
    try:
        fake_stdin = os.fdopen(slave, "rb", buffering=0, closefd=False)
        monkeypatch.setattr(sys, "stdin", fake_stdin)
        before = termios.tcgetattr(slave)

        def feed():
            # bytes written while the pty is still CANONICAL are held in the
            # line buffer and never reach the raw queue — wait until
            # KeyThread's setcbreak is visible before pressing keys
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                if not (termios.tcgetattr(slave)[3] & termios.ICANON):
                    break
                time.sleep(0.05)
            os.write(master, b"w")
            # ... and let at least one block stream out before quitting (the
            # first block sits behind the jit compile), so the partial
            # render is non-empty
            while time.time() < deadline:
                if out.exists() and out.stat().st_size > 4096:
                    break
                time.sleep(0.05)
            time.sleep(0.1)
            os.write(master, b"q")

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        rc = main(["-i", str(src), "-o", str(out), "--seconds", "30", "--keys"])
        t.join(timeout=5)
        assert rc == 0
        err = capsys.readouterr().err
        assert "[    w]" in err and "azi" in err  # live readout printed
        after = termios.tcgetattr(slave)
        assert after[3] & termios.ICANON  # terminal restored on exit
        y, sr = read_wav(out)
        # 'q' ended a 30 s session early: a short, finite partial render
        assert sr == config.sample_rate and np.isfinite(y).all()
        assert 0 < y.shape[0] < 30 * config.sample_rate
    finally:
        os.close(master)
        os.close(slave)


def test_have_output_device_probe_arms(monkeypatch):
    """The --device auto policy's probe: default-output capability decides
    live playout, and a missing/broken sounddevice backend reads as 'no'."""
    from jefferson_tpu.rt import playout as po

    class SD:
        def __init__(self, chans=2, err=None):
            self.chans, self.err = chans, err

        def query_devices(self, kind=None):
            if self.err:
                raise self.err
            return {"max_output_channels": self.chans}

    monkeypatch.setattr(po, "_sounddevice", lambda: SD(2))
    assert po.have_output_device()
    monkeypatch.setattr(po, "_sounddevice", lambda: SD(0))
    assert not po.have_output_device()
    monkeypatch.setattr(po, "_sounddevice", lambda: SD(err=RuntimeError("no PA backend")))
    assert not po.have_output_device()
    monkeypatch.setattr(po, "_sounddevice", lambda: None)
    assert not po.have_output_device()
