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
