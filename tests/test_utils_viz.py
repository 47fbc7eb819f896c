"""Observability + visualization tests."""

import numpy as np

from jefferson_tpu.utils.profiling import RTFMeter, device_memory_report, trace
from jefferson_tpu.viz.scene import decimate_waveform, scene_svg, waveform_svg


def test_rtf_meter():
    m = RTFMeter()
    with m.measure(blocks=10):
        pass
    assert m.num_calls == 10
    assert m.avg_ms >= 0
    assert m.rtf > 0


def test_memory_report(capsys):
    out = device_memory_report()
    assert len(out) >= 1


def test_trace_no_crash(tmp_path):
    with trace(str(tmp_path / "prof")):
        import jax.numpy as jnp

        (jnp.ones(8) * 2).block_until_ready()


def test_decimate_waveform():
    x = np.ones(4096, np.float32)
    env = decimate_waveform(x, bins=64)
    np.testing.assert_allclose(env, 1.0)
    short = decimate_waveform(np.ones(10, np.float32), bins=64)
    assert short.shape == (64,) and short[:10].sum() == 10


def test_svg_outputs(tmp_path, config):
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    pos = CircularOrbit(period_s=2.0, r=1.5).sample(200, config)
    p1 = tmp_path / "scene.svg"
    scene_svg(pos, p1)
    text = p1.read_text()
    assert text.startswith("<svg") and "listener" in text and "polyline" in text

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((5000, 2)).astype(np.float32) * 0.3
    p2 = tmp_path / "wave.svg"
    waveform_svg(wav, p2)
    assert "<polygon" in p2.read_text()


def test_rtf_meter_exception_neutral():
    """A raising measured body must still close the interval (round-5
    review): counters update and a later measure() is not corrupted."""
    import pytest

    m = RTFMeter()
    with pytest.raises(RuntimeError, match="boom"):
        with m.measure(blocks=3):
            raise RuntimeError("boom")
    assert m.num_calls == 3
    assert m.sum_s >= 0.0
    with m.measure(blocks=1):
        pass
    assert m.num_calls == 4


def test_rtf_meter_report_and_guards():
    """report() prints the counters; stop() without start() raises instead
    of attributing the gap; rtf is inf before any measurement."""
    import io

    import pytest

    m = RTFMeter()
    assert m.rtf == float("inf")
    with pytest.raises(RuntimeError, match="without a matching start"):
        m.stop()
    with m.measure(blocks=4):
        pass
    buf = io.StringIO()
    m.report(label="unit", file=buf)
    text = buf.getvalue()
    assert "unit: 4 blocks" in text and "x real time" in text


def test_trace_survives_unavailable_profiler(monkeypatch, tmp_path, capsys):
    """trace() is a safe no-op when the backend profiler refuses to start,
    and swallows a stop_trace failure after a successful start."""
    import jax

    from jefferson_tpu.utils.profiling import trace

    def boom(*a, **k):
        raise RuntimeError("no profiler here")

    monkeypatch.setattr(jax.profiler, "start_trace", boom)
    ran = False
    with trace(str(tmp_path)):
        ran = True
    assert ran
    assert "profiler unavailable" in capsys.readouterr().err

    # started OK but stop raises: still exception-neutral
    monkeypatch.setattr(jax.profiler, "start_trace", lambda *a, **k: None)
    monkeypatch.setattr(jax.profiler, "stop_trace", boom)
    with trace(str(tmp_path)):
        pass


def test_device_memory_report_both_arms(monkeypatch):
    """Allocator-stats devices print used/limit MiB; devices without stats
    fall back to summing live arrays."""
    import jax

    from jefferson_tpu.utils.profiling import device_memory_report

    class StatsDev:
        def memory_stats(self):
            return {"bytes_in_use": 3 * 2**20, "bytes_limit": 8 * 2**20}

        def __str__(self):
            return "FakeTPU:0"

    class BareDev:
        def memory_stats(self):
            raise NotImplementedError

        def __str__(self):
            return "BareCPU:0"

    monkeypatch.setattr(jax, "devices", lambda: [StatsDev(), BareDev()])
    # the default file= binds the real stderr at def time (capsys can't see
    # it) — pass an explicit sink like the CLI callers do
    import io

    sink = io.StringIO()
    out = device_memory_report(file=sink)
    err = sink.getvalue()
    assert out["FakeTPU:0"]["bytes_in_use"] == 3 * 2**20
    assert "3.0 MiB in use / 8.0 MiB" in err
    assert "live_array_bytes" in out["BareCPU:0"]
    assert "no allocator stats" in err
