"""WAV codec tests: roundtrips, scaling convention, streaming writer."""

import numpy as np
import pytest

from jefferson_tpu.io.wavio import (
    StreamingWavWriter,
    read_wav,
    read_wav_info,
    read_wav_mono,
    write_wav,
)


@pytest.fixture
def stereo_signal():
    rng = np.random.default_rng(7)
    return (rng.random((4096, 2)).astype(np.float32) * 1.6 - 0.8).astype(np.float32)


@pytest.mark.parametrize("bits,tol", [(16, 2 ** -15), (24, 2 ** -23), (32, 2 ** -30)])
def test_pcm_roundtrip(tmp_path, stereo_signal, bits, tol):
    p = tmp_path / f"t{bits}.wav"
    write_wav(p, stereo_signal, 44100, bits=bits)
    y, sr = read_wav(p)
    assert sr == 44100
    assert y.shape == stereo_signal.shape
    assert np.max(np.abs(y - stereo_signal)) <= tol


def test_float_roundtrip(tmp_path, stereo_signal):
    p = tmp_path / "f32.wav"
    write_wav(p, stereo_signal, 48000, bits=32, float_format=True)
    y, sr = read_wav(p)
    assert sr == 48000
    np.testing.assert_array_equal(y, stereo_signal)
    info = read_wav_info(p)
    assert info.float_format and info.bits == 32 and info.frames == 4096


def test_pcm16_scaling(tmp_path):
    """libsndfile convention: int16 full-scale -32768 maps to -1.0."""
    import struct

    payload = struct.pack("<4h", -32768, 16384, -16384, 32767)
    hdr_samples = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    p = tmp_path / "raw16.wav"
    from jefferson_tpu.io.wavio import _header

    with open(p, "wb") as f:
        f.write(_header(44100, 1, 16, False, len(payload)))
        f.write(payload)
    y, _ = read_wav(p)
    np.testing.assert_allclose(y[:, 0], hdr_samples, atol=1e-7)


def test_mono_downmix(tmp_path):
    x = np.stack([np.ones(100, np.float32) * 0.5, np.ones(100, np.float32) * -0.25], axis=1)
    p = tmp_path / "st.wav"
    write_wav(p, x, 44100, bits=32, float_format=True)
    m, _ = read_wav_mono(p)
    np.testing.assert_allclose(m, 0.125, atol=1e-7)


def test_streaming_writer(tmp_path, stereo_signal):
    p = tmp_path / "stream.wav"
    with StreamingWavWriter(p, 44100, channels=2, bits=24) as w:
        for i in range(0, len(stereo_signal), 128):
            w.write(stereo_signal[i : i + 128])
    y, sr = read_wav(p)
    assert y.shape == stereo_signal.shape
    assert np.max(np.abs(y - stereo_signal)) <= 2 ** -23


def test_streaming_writer_partial_survives(tmp_path):
    """Flushing mid-stream leaves a valid file (block-append crash safety)."""
    p = tmp_path / "partial.wav"
    w = StreamingWavWriter(p, 44100, channels=2, bits=16)
    w.write(np.zeros((256, 2), np.float32))
    w.flush()
    info = read_wav_info(p)
    assert info.frames == 256
    w.close()


def test_reference_assets_readable():
    """Read-only smoke test against the upstream media files, if mounted."""
    import pathlib

    ref = pathlib.Path("/root/reference/Jefferson/media/Castanets-441.wav")
    if not ref.exists():
        pytest.skip("reference assets not mounted")
    x, sr = read_wav_mono(ref)
    assert sr == 44100 and x.shape[0] == 337_614
    assert np.max(np.abs(x)) <= 1.0


def test_resolve_float_bits():
    """--float means IEEE float: PCM-only depths (incl. the CLI/daemon
    default 24) resolve to float32 instead of dying at write time."""
    from jefferson_tpu.io.wavio import resolve_float_bits

    assert resolve_float_bits(24, True) == 32
    assert resolve_float_bits(16, True) == 32
    assert resolve_float_bits(32, True) == 32
    assert resolve_float_bits(64, True) == 64
    for b in (16, 24, 32):
        assert resolve_float_bits(b, False) == b


def test_malformed_fmt_raises_valueerror(tmp_path):
    """A zeroed fmt chunk must raise ValueError, not ZeroDivisionError."""
    import struct

    from jefferson_tpu.io.wavio import read_wav, read_wav_info

    fmt_body = struct.pack("<HHIIHH", 1, 0, 44100, 0, 0, 0)  # channels=0, bits=0
    payload = b"\x00" * 64
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    hdr += b"data" + struct.pack("<I", len(payload))
    p = tmp_path / "bad.wav"
    p.write_bytes(hdr + payload)
    with pytest.raises(ValueError):
        read_wav_info(p)
    with pytest.raises(ValueError):
        read_wav(p)
