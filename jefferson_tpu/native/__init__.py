"""Native host runtime (C++), with pure-NumPy fallback.

The compiled extension provides the host-side hot paths (WAV codec, block
feeding, overlap-save window build) as native code, mirroring the
reference's all-native host runtime.  Build it with
``python scripts/build_native.py``; absent the .so, the package falls back
to the NumPy implementations transparently.
"""

from __future__ import annotations

import numpy as np

try:
    from . import _jefferson_native as _native

    HAVE_NATIVE = True
except ImportError:
    _native = None
    HAVE_NATIVE = False


def decode_wav(data: bytes):
    """WAV bytes -> (float32[frames, ch], sample_rate)."""
    if HAVE_NATIVE:
        return _native.decode_wav(data)
    import tempfile

    from ..io import wavio

    if b"fmt " not in wavio._parse_chunks(data):
        raise ValueError("malformed WAV (missing fmt/data)")
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(data)
        f.flush()
        return wavio.read_wav(f.name)


def encode_pcm(x: np.ndarray, bits: int) -> bytes:
    if HAVE_NATIVE:
        return _native.encode_pcm(np.ascontiguousarray(x, dtype=np.float32), bits)
    from ..io.wavio import _encode

    return _encode(x, bits, False)


def fed_stream(signal: np.ndarray, num_blocks: int, fpb: int) -> np.ndarray:
    if HAVE_NATIVE:
        return _native.fed_stream(np.ascontiguousarray(signal, dtype=np.float32), num_blocks, fpb)
    total = num_blocks * fpb
    signal = np.asarray(signal, dtype=np.float32)
    reps = int(np.ceil(total / len(signal)))
    return np.tile(signal, reps)[:total]


def build_segments(stream: np.ndarray, hist: np.ndarray, fpb: int, pad: int) -> np.ndarray:
    if HAVE_NATIVE:
        return _native.build_segments(
            np.ascontiguousarray(stream, dtype=np.float32),
            np.ascontiguousarray(hist, dtype=np.float32),
            fpb,
            pad,
        )
    full = np.concatenate([np.asarray(hist, np.float32), np.asarray(stream, np.float32)])
    b = len(stream) // fpb
    idx = np.arange(b)[:, None] * fpb + np.arange(pad)[None, :]
    return full[idx]


def pick_hrtf(ele: np.ndarray, azi: np.ndarray) -> np.ndarray:
    """Native nearest-filter scan; callers fall back to hrtf.kemar.pick_hrtf
    when the extension is absent (this wrapper requires it)."""
    return _native.pick_hrtf(
        np.ascontiguousarray(ele, dtype=np.float32),
        np.ascontiguousarray(azi, dtype=np.float32),
    )


def interp_plan(ele: np.ndarray, azi: np.ndarray):
    """Native interpolationCalculations: (idx (B,4) i32, weights (B,4) f32,
    omegas (B,6) f32, case (B,) i8).  Bit-exact vs the NumPy port
    (tests/test_native.py)."""
    return _native.interp_plan(
        np.ascontiguousarray(ele, dtype=np.float32),
        np.ascontiguousarray(azi, dtype=np.float32),
    )


def distance_phase_split(fsvs: float, radii: np.ndarray, num_bins: int):
    """Native float64-accurate 12-bit phase split (ops/filters port)."""
    return _native.distance_phase_split(
        float(fsvs), np.ascontiguousarray(radii, dtype=np.float32), int(num_bins)
    )
