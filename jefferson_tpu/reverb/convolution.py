"""Convolution reverb: partitioned FFT convolution, TPU-native.

The reference's preprocessing reverb does one whole-file cuFFT convolution
(reference: Jefferson/src/cudaPart.cu:81-196) at size
new_size = signal + ceil(ir/2) (PadData, reference: Jefferson/src/kernels.cu:169-188)
— i.e. a *circular* convolution whose reverb tail wraps onto the beginning —
followed by an RMS renormalization of the output back to the input level.
(The reference's renormalization kernel call has its scale/size arguments
swapped and the whole path is compiled out behind reverbFlag=false; we
implement the intended behavior.)

Two backends:
  * 'host' (offline default): one scipy float64 FFT — reverb is one-shot
    preprocessing (as in the reference), and the deployed TPU stack takes
    minutes to compile the big grouped convolution, so the host transform
    is the right offline tradeoff.
  * 'tpu': uniform pad_len-sized IR partitions convolved in the frequency
    domain with the input's block spectra — the spectral accumulation
    ``y[m] = sum_j S[m-j] * H[j]`` as grouped 1-D convolutions with
    power-of-two size bucketing so compiles cache across lengths.  This is
    also the formulation behind the streaming convolver.
The reference's circular semantics are recovered from the linear result by
folding the tail back (``reverb_reference``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops import fft as fft_ops


def _block_spectra_split(x: np.ndarray, part: int, fft_size: int):
    """Partition 1-D signal into hop=part blocks, zero-padded to fft_size,
    and return stacked (M, bins) re/im spectra as jnp arrays."""
    n = len(x)
    m = max(1, -(-n // part))
    buf = np.zeros((m, fft_size), dtype=np.float32)
    for i in range(m):
        seg = x[i * part : (i + 1) * part]
        buf[i, : len(seg)] = seg
    return fft_ops.rfft_split(jnp.asarray(buf), fft_size)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


@functools.partial(jax.jit, static_argnames=("j_rows",))
def _spectral_conv_grouped(sr, si, hr, hi, j_rows: int):
    """y[m] = sum_j s[m-j] * h[j] per frequency bin (full length M+J-1),
    as 4 grouped 1-D convolutions with one channel group per bin."""
    k = sr.shape[1]

    def gconv(a, b):
        lhs = a.T[None]          # (1, K, M)
        rhs = b.T[:, None, :]    # (K, 1, J)
        out = jax.lax.conv_general_dilated(
            lhs,
            jnp.flip(rhs, axis=-1),
            window_strides=(1,),
            padding=[(j_rows - 1, j_rows - 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=k,
            # fp32 accumulation on TPU (DEFAULT is bf16 — the repo precision
            # rule every other MXU op in this path already follows)
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[0].T          # (M+J-1, K)

    yr = gconv(sr, hr) - gconv(si, hi)
    yi = gconv(sr, hi) + gconv(si, hr)
    return yr, yi


def _spectral_conv_blocks(sr, si, hr, hi):
    """Bucketed wrapper: pads M and J to powers of two so the (expensive,
    minutes-scale on the deployed TPU stack) grouped-conv compile is reused
    across signal/IR lengths, then trims to the true M+J-1."""
    m, k = sr.shape
    j = hr.shape[0]
    m_pad = _next_pow2(m)
    j_pad = _next_pow2(j)
    pad_rows = lambda a, rows: jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))
    yr, yi = _spectral_conv_grouped(
        pad_rows(sr, m_pad), pad_rows(si, m_pad),
        pad_rows(hr, j_pad), pad_rows(hi, j_pad),
        j_rows=j_pad,
    )
    return yr[: m + j - 1], yi[: m + j - 1]


def _overlap_add(y_blocks: jax.Array, part: int, fft_size: int, total: int) -> jax.Array:
    """(M, fft_size) time blocks at hop ``part`` -> (total,) overlap-added."""
    m = y_blocks.shape[0]
    out_len = (m - 1) * part + fft_size
    # scatter-add via reshape trick: split each block into fft_size//part
    # sub-chunks and add shifted copies
    chunks = fft_size // part
    acc = jnp.zeros(out_len + fft_size, dtype=y_blocks.dtype)
    for c in range(chunks):
        sub = y_blocks[:, c * part : (c + 1) * part].reshape(-1)
        acc = acc.at[c * part : c * part + m * part].add(sub)
    return acc[:total]


def convolve_linear(
    signal: np.ndarray,
    ir: np.ndarray,
    config: EngineConfig = DEFAULT_CONFIG,
    partition: int | None = None,
    backend: str = "host",
) -> np.ndarray:
    """Full linear convolution (len = len(signal)+len(ir)-1).

    backend 'host' (default): one float64 scipy FFT on the host — reverb is
    one-shot *preprocessing* (like the reference's cudaFFT before playout),
    and the deployed TPU stack needs minutes to compile the large grouped
    conv, so the host transform is the right offline default.
    backend 'tpu': the uniform partitioned frequency-domain convolution on
    the accelerator (bucketed compiles; also the streaming formulation).
    """
    signal = np.asarray(signal, dtype=np.float32)
    ir = np.asarray(ir, dtype=np.float32)
    if len(ir) == 0:
        # a zero-length IR (truncated/corrupt reverb WAV) must fail loudly,
        # not produce silence or an opaque FFT shape error downstream
        raise ValueError("reverb IR is empty")
    if backend == "host":
        import scipy.fft

        n = len(signal) + len(ir) - 1
        spec = scipy.fft.rfft(signal.astype(np.float64), n) * scipy.fft.rfft(
            ir.astype(np.float64), n
        )
        return scipy.fft.irfft(spec, n).astype(np.float32)
    part = partition or config.pad_len
    fft_size = 2 * part
    sr_, si_ = _block_spectra_split(signal, part, fft_size)
    hr_, hi_ = _block_spectra_split(ir, part, fft_size)
    yr, yi = _spectral_conv_blocks(sr_, si_, hr_, hi_)
    # inverse: full blocks (overlap-add needs all fft_size samples)
    cr, ci = fft_ops._idft_matrices(fft_size)
    p = jax.lax.Precision.HIGHEST
    yt = jnp.matmul(yr, cr, precision=p) + jnp.matmul(yi, ci, precision=p)
    total = len(signal) + len(ir) - 1
    out = _overlap_add(yt, part, fft_size, total)
    return np.asarray(out, dtype=np.float32)


def reverb_reference(
    signal: np.ndarray,
    ir: np.ndarray,
    config: EngineConfig = DEFAULT_CONFIG,
    normalize: bool = True,
    backend: str = "host",
) -> np.ndarray:
    """The reference's preprocessing reverb with intended semantics.

    Output length new_size = len(signal) + ceil(len(ir)/2); the linear
    convolution tail beyond new_size wraps back onto the start (circular FFT
    convolution, reference: Jefferson/src/cudaPart.cu:124-153); the result is
    RMS-renormalized to the dry input level when ``normalize``.
    """
    signal = np.asarray(signal, dtype=np.float32)
    ir = np.asarray(ir, dtype=np.float32)
    min_radius = len(ir) // 2
    new_size = len(signal) + (len(ir) - min_radius)
    lin = convolve_linear(signal, ir, config, backend=backend)
    out = np.zeros(new_size, dtype=np.float32)
    # lin has len(signal)+len(ir)-1 samples, which is new_size-1 for a
    # 1-tap IR — copy what exists (the missing final sample is zero)
    head = lin[:new_size]
    out[: len(head)] = head
    tail = lin[new_size:]
    out[: len(tail)] += tail  # circular wrap (tail < new_size by construction)
    if normalize:
        rms_in = float(np.sqrt(np.mean(signal.astype(np.float64) ** 2)))
        rms_out = float(np.sqrt(np.mean(out.astype(np.float64) ** 2)))
        if rms_out > 0:
            out *= np.float32(rms_in / rms_out)
    return out


def reverb_oracle(signal: np.ndarray, ir: np.ndarray, normalize: bool = True) -> np.ndarray:
    """NumPy/scipy oracle of reverb_reference (whole-signal FFT like the
    reference, float64 accumulation)."""
    import scipy.fft

    signal = np.asarray(signal, dtype=np.float64)
    ir = np.asarray(ir, dtype=np.float64)
    min_radius = len(ir) // 2
    new_size = len(signal) + (len(ir) - min_radius)
    n = new_size
    spec = scipy.fft.rfft(signal, n) * scipy.fft.rfft(ir, n)
    out = scipy.fft.irfft(spec, n)
    if normalize:
        rms_in = float(np.sqrt(np.mean(signal**2)))
        rms_out = float(np.sqrt(np.mean(out**2)))
        if rms_out > 0:
            out *= rms_in / rms_out
    return out.astype(np.float32)


class StreamingConvolver:
    """Uniform partitioned convolution with a frequency-domain delay line —
    the streaming form of the reverb for block-by-block pipelines.

    Feed ``partition``-sized chunks; each call returns the same number of
    samples (latency = one partition).  State is the ring of the last J
    input-block spectra.
    """

    def __init__(self, ir: np.ndarray, partition: int = 1024):
        self.part = partition
        self.fft_size = 2 * partition
        ir = np.asarray(ir, dtype=np.float32)
        if len(ir) == 0:
            # an empty IR would silently mute the stream (all-zero filter)
            raise ValueError("reverb IR is empty")
        # constant IR spectra + state live DEVICE-RESIDENT: process() is on
        # the realtime hot path, and re-uploading them (plus round-tripping
        # the spectral ring) every 2.9 ms block is pure transfer waste
        self._hr, self._hi = _block_spectra_split(ir, partition, self.fft_size)
        j = int(self._hr.shape[0])
        bins = self.fft_size // 2 + 1
        self._ring_r = jnp.zeros((j, bins), jnp.float32)
        self._ring_i = jnp.zeros((j, bins), jnp.float32)
        self._overlap = jnp.zeros(partition, jnp.float32)
        self._step = jax.jit(self._step_fn, static_argnames=())

    def _step_fn(self, ring_r, ring_i, hr, hi, seg, overlap):
        xr, xi = fft_ops.rfft_split(seg[None, :], self.fft_size)
        ring_r = jnp.concatenate([xr, ring_r[:-1]], axis=0)
        ring_i = jnp.concatenate([xi, ring_i[:-1]], axis=0)
        acc_r = jnp.sum(ring_r * hr - ring_i * hi, axis=0)
        acc_i = jnp.sum(ring_r * hi + ring_i * hr, axis=0)
        cr, ci = fft_ops._idft_matrices(self.fft_size)
        p = jax.lax.Precision.HIGHEST
        y = jnp.matmul(acc_r, cr, precision=p) + jnp.matmul(acc_i, ci, precision=p)
        out = y[: self.part] + overlap
        return ring_r, ring_i, out, y[self.part :]

    def prime(self) -> None:
        """Compile the step without mutating the delay-line state (realtime
        callers warm this up before the stream opens)."""
        out = self._step(
            self._ring_r, self._ring_i, self._hr, self._hi,
            jnp.zeros(self.fft_size, jnp.float32), self._overlap,
        )
        np.asarray(out[2])  # force completion

    def process(self, chunk: np.ndarray) -> np.ndarray:
        """Feed exactly one partition of samples (zero-pad the final one)."""
        if len(chunk) > self.part:
            raise ValueError(
                f"chunk of {len(chunk)} samples exceeds the partition "
                f"({self.part}); feed one partition per call"
            )
        seg = np.zeros(self.fft_size, dtype=np.float32)
        seg[: len(chunk)] = chunk
        rr, ri, out, ov = self._step(
            self._ring_r, self._ring_i, self._hr, self._hi,
            jnp.asarray(seg), self._overlap,
        )
        # state stays on device; only the audible block comes back
        self._ring_r, self._ring_i, self._overlap = rr, ri, ov
        return np.asarray(out)
