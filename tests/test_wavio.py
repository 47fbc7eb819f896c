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


def _wav_bytes(fmt_body, payload):
    import struct

    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    hdr += b"data" + struct.pack("<I", len(payload))
    return hdr + payload


def test_channels_zero_rejected_on_native_path_too(tmp_path):
    """channels=0 with otherwise-valid bits must raise through BOTH decode
    paths (the C++ decoder used to map it to mono while the fallback
    raised — platform-divergent behavior)."""
    import struct

    from jefferson_tpu.io.wavio import read_wav

    fmt_body = struct.pack("<HHIIHH", 1, 0, 44100, 88200, 2, 16)  # ch=0, bits=16
    p = tmp_path / "ch0.wav"
    p.write_bytes(_wav_bytes(fmt_body, b"\x00" * 64))
    with pytest.raises(ValueError, match="channels=0"):
        read_wav(p)


def test_truncated_fmt_chunk_raises_valueerror(tmp_path):
    """A fmt chunk shorter than 16 bytes must raise ValueError — not parse
    the next chunk's bytes as the format, and not struct.error."""
    import struct

    from jefferson_tpu.io.wavio import read_wav

    payload = b"\x00" * 64
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + 4 + 8 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"  # 4-byte fmt
    hdr += b"data" + struct.pack("<I", len(payload))
    p = tmp_path / "shortfmt.wav"
    p.write_bytes(hdr + payload)
    with pytest.raises(ValueError, match="truncated fmt"):
        read_wav(p)


def test_truncated_data_chunk_trims(tmp_path):
    """A 16-bit file cut mid-sample decodes the frames that fit — identically
    with and without the native extension (frombuffer used to crash the
    fallback on the odd byte)."""
    import struct

    import numpy as np

    from jefferson_tpu.io.wavio import read_wav

    fmt_body = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    full = np.array([1000, -2000, 3000], "<i2").tobytes()
    p = tmp_path / "trunc.wav"
    p.write_bytes(_wav_bytes(fmt_body, full)[:-1])  # cut mid-sample
    x32, _ = read_wav(p)                       # native path (float32)
    x64, _ = read_wav(p, dtype=np.float64)     # fallback path
    assert x32.shape[0] == x64.shape[0] == 2   # the 2 complete frames
    np.testing.assert_allclose(x32[:, 0], x64[:, 0].astype(np.float32))


def test_odd_data_chunk_gets_pad_byte(tmp_path):
    """Odd-size 24-bit payloads get the RIFF pad byte (and riff_size counts
    it), via both write_wav and the streaming writer."""
    import struct

    import numpy as np

    from jefferson_tpu.io.wavio import StreamingWavWriter, read_wav, write_wav

    sig = np.array([0.1, -0.2, 0.3], np.float32)  # 3 mono 24-bit frames = 9 bytes
    p = tmp_path / "odd.wav"
    write_wav(p, sig, 44100, bits=24)
    raw = p.read_bytes()
    assert len(raw) % 2 == 0 and raw[-1:] == b"\x00"
    assert struct.unpack_from("<I", raw, 4)[0] == len(raw) - 8  # riff_size exact
    x, _ = read_wav(p)
    assert x.shape == (3, 1)

    p2 = tmp_path / "odd_stream.wav"
    w = StreamingWavWriter(p2, 44100, channels=1, bits=24)
    w.write(sig)
    w.close()
    raw2 = p2.read_bytes()
    assert len(raw2) % 2 == 0 and raw2[-1:] == b"\x00"
    x2, _ = read_wav(p2)
    assert x2.shape == (3, 1)


def test_float64_read_write_bitexact_roundtrip(tmp_path):
    """float64 data quantizes in float64 on write and reads back at full
    precision with dtype=np.float64 — byte-identical regardless of the
    native extension (which is float32-only and must not be used here)."""
    import numpy as np

    from jefferson_tpu.io.wavio import read_wav, write_wav

    x = np.array([0.1, -0.25, 1.0 / 3.0], np.float64)
    p = tmp_path / "f64.wav"
    write_wav(p, x, 44100, bits=64, float_format=True)
    got, _ = read_wav(p, dtype=np.float64)
    np.testing.assert_array_equal(got[:, 0], x)  # exact, no f32 round trip


def test_streaming_writer_riff_limit_guard(tmp_path):
    """The writer refuses the block that would cross the 4 GiB RIFF limit
    with a clear ValueError BEFORE writing (not struct.error in flush)."""
    import numpy as np

    from jefferson_tpu.io.wavio import StreamingWavWriter

    p = tmp_path / "big.wav"
    w = StreamingWavWriter(p, 44100, channels=2, bits=24)
    w.write(np.zeros((4, 2), np.float32))
    w._data_size = w._MAX_DATA - 10  # simulate ~4 GiB already written
    with pytest.raises(ValueError, match="4 GiB"):
        w.write(np.zeros((4, 2), np.float32))
    w._data_size = 24  # restore truth so close() patches a sane header
    w.close()


@pytest.mark.parametrize("bits,tol", [(16, 2 ** -15), (24, 2 ** -23), (32, 2 ** -30)])
def test_pcm_roundtrip_pure_python(tmp_path, stereo_signal, bits, tol):
    """The pure-Python codec (what a build without the native extension
    runs): float64 input routes around the native encoder, dtype=float64
    around the native decoder.  Round-trips each PCM depth and cross-checks
    the fallback decode against the native one."""
    p = tmp_path / f"py{bits}.wav"
    sig64 = stereo_signal.astype(np.float64)
    write_wav(p, sig64, 44100, bits=bits)          # Python encoder
    y64, sr = read_wav(p, dtype=np.float64)        # Python decoder
    assert sr == 44100 and y64.dtype == np.float64
    assert np.max(np.abs(y64 - sig64)) <= tol
    y32, _ = read_wav(p)                           # native decoder (float32)
    assert np.max(np.abs(y32.astype(np.float64) - y64)) <= 2 ** -24


def test_float64_format_roundtrip(tmp_path, stereo_signal):
    """IEEE float64 WAVs (bits=64) round-trip exactly through the Python
    codec (the native extension is float32-only and must not be elected)."""
    p = tmp_path / "f64.wav"
    sig64 = stereo_signal.astype(np.float64) * (1 + 2 ** -40)  # needs >24 bits
    write_wav(p, sig64, 48000, bits=64, float_format=True)
    y, sr = read_wav(p, dtype=np.float64)
    assert sr == 48000
    np.testing.assert_array_equal(y, sig64)
    info = read_wav_info(p)
    assert info.float_format and info.bits == 64


def _both_decode_arms(read, p, monkeypatch):
    """Yield (label, result) for the pure-Python decoder (wavio._nat forced
    off) and — when the extension is built — the native float32 decoder.
    A bare dtype loop only exercised the native arm when the .so happened
    to be importable (round-5 test review)."""
    from jefferson_tpu.io import wavio

    with monkeypatch.context() as m:
        m.setattr(wavio, "_nat", None)
        yield "pure-f32", read(p, dtype=np.float32)
        yield "pure-f64", read(p, dtype=np.float64)
    if wavio._nat is not None:
        yield "native-f32", read(p, dtype=np.float32)


def test_wave_format_extensible_decodes(tmp_path, monkeypatch):
    """WAVE_FORMAT_EXTENSIBLE resolves the true tag from the SubFormat GUID
    (PCM here) on BOTH decode paths (pure Python forced, plus the native
    decoder when built), and a truncated extensible fmt chunk raises
    cleanly."""
    import struct

    from jefferson_tpu.io.wavio import read_wav

    # 40-byte extensible fmt: base fields + cbSize=22 + valid bits +
    # channel mask + SubFormat GUID whose first two bytes are the PCM tag
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    fmt_body = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 44100, 88200, 2, 16)
        + struct.pack("<HHI", 22, 16, 0x4)
        + guid
    )
    samples = np.array([0, 16384, -16384, -32768, 32767], dtype="<i2")
    p = tmp_path / "ext.wav"
    p.write_bytes(_wav_bytes(fmt_body, samples.tobytes()))
    want = samples.astype(np.float64) / 32768.0
    for label, (got, sr) in _both_decode_arms(read_wav, p, monkeypatch):
        assert sr == 44100, label
        np.testing.assert_allclose(
            got[:, 0], want.astype(got.dtype), atol=0, rtol=0, err_msg=label
        )

    short = fmt_body[:24]  # extensible tag but no SubFormat to read
    p2 = tmp_path / "ext_trunc.wav"
    p2.write_bytes(_wav_bytes(short, samples.tobytes()))
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        read_wav(p2, dtype=np.float64)


def test_u8_pcm_decodes_and_unsupported_tags_raise(tmp_path, monkeypatch):
    """8-bit PCM is unsigned-midpoint normalized identically on both decode
    paths; unknown format tags and oddball PCM depths raise."""
    import struct

    from jefferson_tpu.io.wavio import read_wav

    fmt8 = struct.pack("<HHIIHH", 1, 1, 22050, 22050, 1, 8)
    raw = bytes([0, 64, 128, 192, 255])
    p = tmp_path / "u8.wav"
    p.write_bytes(_wav_bytes(fmt8, raw))
    want = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    for label, (got, sr) in _both_decode_arms(read_wav, p, monkeypatch):
        assert sr == 22050, label
        np.testing.assert_allclose(
            got[:, 0], want.astype(got.dtype), atol=0, rtol=0, err_msg=label
        )

    # A-law (tag 6) is not supported — clean ValueError, not garbage audio
    fmt_alaw = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    p2 = tmp_path / "alaw.wav"
    p2.write_bytes(_wav_bytes(fmt_alaw, raw))
    with pytest.raises(ValueError, match="unsupported WAVE format"):
        read_wav(p2)

    # PCM at an unhandled depth (12-bit) raises on the pure-Python arm
    fmt12 = struct.pack("<HHIIHH", 1, 1, 8000, 12000, 2, 12)
    p3 = tmp_path / "pcm12.wav"
    p3.write_bytes(_wav_bytes(fmt12, raw * 2))
    with pytest.raises(ValueError, match="bit depth"):
        read_wav(p3, dtype=np.float64)


def test_wav_codec_native_vs_pure_fuzz(tmp_path, monkeypatch):
    """Cross-implementation fuzz: the native C++ quantizer/decoder and the
    pure-Python arms agree within the documented tie tolerance (native
    quantizes in float32, the fallback in float64 — at most 1 LSB apart on
    exact .5 ties; decode differs by at most 1 float32 ULP)."""
    from jefferson_tpu.io import wavio

    if wavio._nat is None:
        pytest.skip("native extension not built")

    def ints(buf, bits):
        if bits == 16:
            return np.frombuffer(buf, "<i2").astype(np.int64)
        if bits == 32:
            return np.frombuffer(buf, "<i4").astype(np.int64)
        b = np.frombuffer(buf, np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        return np.where(v >= 1 << 23, v - (1 << 24), v)

    rng = np.random.default_rng(2468)
    for trial in range(30):
        frames = int(rng.integers(1, 400))
        ch = int(rng.integers(1, 3))
        bits = int(rng.choice([16, 24, 32]))
        x = (rng.random((frames, ch), dtype=np.float32) * 2.2 - 1.1).astype(np.float32)
        x[0, 0], x[-1, -1] = 1.0, -1.0  # clip edges both sides

        enc_native = wavio._encode(x, bits, False)
        with monkeypatch.context() as m:
            m.setattr(wavio, "_nat", None)
            enc_pure = wavio._encode(x, bits, False)
        dn, dp = ints(enc_native, bits), ints(enc_pure, bits)
        worst = np.abs(dn - dp).max() if dn.size else 0
        assert worst <= 1, f"trial {trial} bits={bits}: {worst} LSB apart"

        p = tmp_path / f"f{trial}.wav"
        p.write_bytes(
            wavio._header(44100, ch, bits, False, len(enc_pure)) + enc_pure
            + (b"\x00" if len(enc_pure) & 1 else b"")
        )
        got_n, sr_n = wavio.read_wav(p, dtype=np.float32)  # native arm
        with monkeypatch.context() as m:
            m.setattr(wavio, "_nat", None)
            got_p, sr_p = wavio.read_wav(p, dtype=np.float32)
        assert sr_n == sr_p == 44100
        assert got_n.shape == got_p.shape == (frames, ch)
        assert np.abs(got_n - got_p).max() <= 2.0 ** -23, f"trial {trial} bits={bits}"


def test_encode_rejects_unsupported_bit_depths():
    """The encoder's depth whitelist is a loud error, not a silent cast."""
    from jefferson_tpu.io.wavio import _encode

    x = np.zeros((4, 1), np.float32)
    with pytest.raises(ValueError, match="unsupported float bit depth"):
        _encode(x, 16, float_format=True)
    with pytest.raises(ValueError, match="unsupported PCM bit depth"):
        _encode(x, 12, float_format=False)


def test_header_enforces_riff_4gib_limit():
    """RIFF sizes are u32: a data chunk pushing riff_size past 4 GiB must
    raise (the StreamingWavWriter append path shares this header builder)."""
    from jefferson_tpu.io.wavio import _header

    # comfortably representable
    assert len(_header(44100, 2, 24, False, 1024)) > 0
    with pytest.raises(ValueError, match="4 GiB RIFF limit"):
        _header(44100, 2, 24, False, 0xFFFFFFFF - 8)


def test_package_lazy_attrs_and_missing_attr():
    """The package root lazy-imports its heavy exports on first touch and
    raises a normal AttributeError for unknown names."""
    import jefferson_tpu as jt

    assert jt.render_oracle is not None  # lazy path
    assert jt.BatchRenderer is not None
    with pytest.raises(AttributeError, match="no attribute 'not_an_export'"):
        jt.not_an_export
