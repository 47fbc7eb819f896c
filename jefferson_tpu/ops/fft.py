"""FFT ops for the block pipeline.

The reference's cuFFT plans (R2C 1024, batched C2R with interleaved output,
reference: Jefferson/src/GPUSoundSource.cu:44-71) map to XLA's FFT HLO via
``jnp.fft.rfft/irfft``.  A DFT-as-matmul backend is also provided: at the
fixed engine size (1024 -> 513 bins) the transform is small enough that two
fp32 matmuls on the MXU can beat the FFT HLO for large batches, and the
matmul form is what the fused Pallas kernel uses.

Convention: ``rfft`` is unnormalized, ``irfft`` carries the 1/N — together
they reproduce the reference's forward-1/N + unnormalized-C2R pipeline
(see jefferson_tpu.oracle.reference module docstring).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def rfft(x: jax.Array, n: int | None = None) -> jax.Array:
    return jnp.fft.rfft(x, n=n, axis=-1)


def irfft(x: jax.Array, n: int) -> jax.Array:
    return jnp.fft.irfft(x, n=n, axis=-1)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n: int):
    """Forward real-DFT basis (n, bins) as float32 cos/sin matrices.

    Cached as NumPy (not jax.Array): the first call may happen inside a jit
    trace, and caching a traced constant would leak the tracer.
    """
    bins = n // 2 + 1
    k = np.arange(bins)[None, :]
    t = np.arange(n)[:, None]
    ang = 2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_matrices(n: int):
    """Inverse basis (bins, n): y = a @ Cr + b @ Ci with the 1/N and the
    2x weight on interior bins folded in (a=Re, b=Im of the half-spectrum)."""
    bins = n // 2 + 1
    k = np.arange(bins)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((bins, 1), 2.0)
    w[0, 0] = 1.0
    if n % 2 == 0:
        w[-1, 0] = 1.0
    cr = (w * np.cos(ang) / n).astype(np.float32)
    ci = (-w * np.sin(ang) / n).astype(np.float32)
    return cr, ci


def rfft_matmul(x: jax.Array, n: int) -> jax.Array:
    """(…, n) real -> (…, n//2+1) complex64 via two MXU matmuls."""
    cr, ci = _dft_matrices(n)
    re = jnp.matmul(x, cr, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(x, ci, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.complex(re, im)


def irfft_matmul(spec: jax.Array, n: int) -> jax.Array:
    """(…, n//2+1) complex -> (…, n) real via two MXU matmuls (includes 1/N)."""
    cr, ci = _idft_matrices(n)
    y = jnp.matmul(jnp.real(spec), cr, precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.matmul(jnp.imag(spec), ci, precision=jax.lax.Precision.HIGHEST)
    return y


def get_backend(name: str):
    """'fft' -> XLA FFT HLO; 'matmul' -> MXU DFT matmuls."""
    if name == "fft":
        return rfft, irfft
    if name == "matmul":
        return rfft_matmul, irfft_matmul
    raise ValueError(f"unknown fft backend {name!r}")


# --- split (real/imag plane) transforms -----------------------------------
# The deployed TPU runtime exposes no complex64 or FFT HLO, so the flagship
# engine path works on explicit real/imaginary float32 planes: the R2C DFT is
# two MXU matmuls, and the C2R inverse only materializes the final
# ``tail`` output samples (the engine discards everything before the last
# frames_per_buffer samples of every block, so the inverse basis is truncated
# to its last ``tail`` columns — an 8x FLOP cut at the default 1024/128).

def rfft_split(x: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """(…, n) real -> ((…, bins) re, (…, bins) im) float32 planes."""
    cr, ci = _dft_matrices(n)
    p = jax.lax.Precision.HIGHEST
    return jnp.matmul(x, cr, precision=p), jnp.matmul(x, ci, precision=p)


@functools.lru_cache(maxsize=16)
def _idft_tail_matrices(n: int, tail: int):
    cr, ci = _idft_matrices(n)
    return np.ascontiguousarray(cr[:, n - tail :]), np.ascontiguousarray(ci[:, n - tail :])


def irfft_tail_split(re: jax.Array, im: jax.Array, n: int, tail: int) -> jax.Array:
    """Inverse of rfft_split, returning only the last ``tail`` samples."""
    cr, ci = _idft_tail_matrices(n, tail)
    p = jax.lax.Precision.HIGHEST
    return jnp.matmul(re, cr, precision=p) + jnp.matmul(im, ci, precision=p)
