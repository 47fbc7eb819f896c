"""HTML scene player: self-contained artifact with valid embedded audio."""

import base64
import io
import json
import re
import wave

import numpy as np

from jefferson_tpu.viz.html import scene_html
from jefferson_tpu.trajectory.trajectory import CircularOrbit


def test_scene_html_self_contained(config, tmp_path):
    nb = 64
    pos = CircularOrbit(period_s=0.5, ele=10, r=1.2).sample(nb, config)
    n = nb * config.frames_per_buffer
    samples = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / config.sample_rate)
               ).astype(np.float32)[:, None].repeat(2, 1)
    out = tmp_path / "scene.html"
    scene_html(pos, samples, out, config=config)
    h = out.read_text()

    wav = base64.b64decode(re.search(r'base64,([A-Za-z0-9+/=]+)"', h).group(1))
    w = wave.open(io.BytesIO(wav))
    assert w.getnchannels() == 2
    assert w.getframerate() == config.sample_rate
    assert w.getnframes() == n

    frames = json.loads(re.search(r"const F = (\[\[.*?\]\]);", h).group(1))
    assert len(frames) == nb
    # keyframes carry (x, y, azi, ele, r); ele/r match the trajectory
    assert all(f[3] == 10.0 and f[4] == 1.2 for f in frames)
    dur = float(re.search(r"const DUR = ([\d.]+);", h).group(1))
    assert abs(dur - n / config.sample_rate) < 1e-3
    for el in ['id="src"', 'id="au"', 'id="ph"', "requestAnimationFrame"]:
        assert el in h


def test_scene3d_html_self_contained(config, tmp_path):
    """3-D player (round 5): embedded audio, world-space keyframes, and the
    reference's camera interaction constants (graphics.cu:559-601)."""
    from jefferson_tpu.viz.scene3d import scene3d_html

    nb = 48
    pos = CircularOrbit(period_s=0.5, ele=10, r=1.2).sample(nb, config)
    n = nb * config.frames_per_buffer
    samples = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / config.sample_rate)
               ).astype(np.float32)[:, None].repeat(2, 1)
    out = tmp_path / "scene.3d.html"
    scene3d_html(pos, samples, out, config=config)
    h = out.read_text()

    wav = base64.b64decode(re.search(r'base64,([A-Za-z0-9+/=]+)"', h).group(1))
    w = wave.open(io.BytesIO(wav))
    assert w.getnchannels() == 2 and w.getnframes() == n

    frames = json.loads(re.search(r"const F = (\[\[.*?\]\]);", h).group(1))
    assert len(frames) == nb
    # keyframes carry (x, y, z, azi, ele, r); angles match the trajectory
    assert all(f[4] == 10.0 and f[5] == 1.2 for f in frames)
    # world y is constant for a constant-elevation orbit; x/z trace a circle
    ys = {f[1] for f in frames}
    assert len(ys) == 1
    rad = [np.hypot(f[0], f[2]) for f in frames]
    assert max(rad) - min(rad) < 1e-2
    # the reference's exact camera gains: rotate 0.2 deg/px, right-drag
    # dolly 0.01/px, wheel 0.1/notch, 'r' reset to translate_z = -3
    for token in ["* 0.2", "* 0.01", "0.1 : -0.1", "cam.tz = -3",
                  "getContext('2d')", "requestAnimationFrame"]:
        assert token in h, token
    # self-contained: no external fetches in the offline player
    assert "http://" not in h and "https://" not in h


def test_live3d_state_and_page(tmp_path):
    """live3d_state maps a stream_status reply; the live page polls JSON."""
    from jefferson_tpu.viz.scene3d import live3d_html, live3d_state

    st = live3d_state(
        {"ok": True, "x": 0.3, "y": 0.1, "z": -0.4, "azi": 37.0, "ele": 12.0,
         "r": 0.5, "blocks": 50, "total_blocks": 100, "alive": True,
         "clipping": False},
        trail=[[0.3, 0.0, -0.5]],
    )
    # control-space x (heard-LEFT at +x, atan2(-x,-z) convention) negates
    # into the painter's world frame (R ear at +x) — source and trail alike
    assert st["x"] == -0.3 and st["trail"] == [[-0.3, 0.0, -0.5]]
    assert st["frac"] == 0.5 and st["alive"]
    assert "azi 37" in st["label"]
    page = live3d_html(tmp_path / "live.json", interval_ms=100)
    # polls the .js state sibling via script-tag injection (works from
    # file:// where fetch/XHR are blocked — the documented workflow opens
    # the page straight from disk)
    assert "live.js" in page and "createElement('script')" in page
    assert "fetch(" not in page and "JT3D.draw" in page


def test_live_views_show_heard_side(tmp_path):
    """A source the audio pans RIGHT (azi 90) must draw on the right in
    BOTH live views — the control cartesian convention (heard-right = -x)
    must not leak into the artifacts (it mirrors them vs the offline
    views and the sound)."""
    from jefferson_tpu.rt.control import spherical_to_control_xyz
    from jefferson_tpu.viz.live import _audio_space_xz, live_scene_svg
    from jefferson_tpu.viz.scene3d import live3d_state

    x, y, z = spherical_to_control_xyz(90.0, 0.0, 1.0)
    assert x < 0  # the control convention's quirk this test guards against
    status = {"ok": True, "x": x, "y": y, "z": z, "azi": 90.0, "ele": 0.0,
              "r": 1.0, "blocks": 1, "total_blocks": 2, "alive": True}
    ax, az = _audio_space_xz(status)
    assert ax > 0.99 and abs(az) < 1e-6  # heard right -> screen right
    svg = live_scene_svg(status)
    assert "<svg" in svg
    assert live3d_state(status)["x"] > 0.99  # world frame: R ear side


def test_wav_bytes_matches_write_wav(tmp_path):
    """The in-memory embed encoder produces byte-identical WAVs to
    write_wav (it used to roundtrip through a temp file)."""
    from jefferson_tpu.io.wavio import write_wav
    from jefferson_tpu.viz.html import _wav_bytes

    rng = np.random.default_rng(3)
    for shape in ((1000, 2), (777,)):
        x = (rng.random(shape).astype(np.float32) - 0.5)
        p = tmp_path / "ref.wav"
        write_wav(p, x, 44100, bits=16)
        assert _wav_bytes(x, 44100) == p.read_bytes()
