"""Fused Pallas spatializer kernel (optional fast path).

Fuses the post-forward pipeline of the interpolating engine — HRTF
gather/blend (old + new sets), complex filter application, and the
tail-only inverse DFT — into one Mosaic kernel per tile of blocks:

  * the full 710-filter spectra table (4 channel/plane matrices of
    (710, bins) float32, ~5.8 MB) and the truncated inverse-DFT bases stay
    **VMEM-resident across the whole grid**, so the per-block filter reads
    never touch HBM (the XLA path's dominant cost: ~0.5 GB of gather
    traffic per 8k blocks);
  * the 4-bracket weighted gather is expressed as a one-hot matmul
    (weights scattered into a (TB, 710) matrix on the VPU, then one MXU
    matmul per channel/plane/set) — no scalar gather loops;
  * both crossfade sets ride the same tile; the linear crossfade itself is
    applied by the caller (cheap, on (B, fpb) tensors).

This replaces the reference's per-block chain of ~16 CUDA kernel launches
across 8 streams (reference: Jefferson/src/GPUSoundSource.cu:294-385) with
one kernel invocation per TB-block tile.

Measured status (v5e): the kernel is numerically exact vs the XLA core
(tests/test_pallas.py) but does NOT beat the XLA path — selection-as-matmul
costs 8 x (TB,710)@(710,513) fp32-HIGHEST products (~6-pass bf16 on the
MXU), which exceeds the HBM gather traffic it eliminates (2.7 ms/8k blocks
for this stage vs 2.8 ms for the *entire* XLA pipeline).  It is kept as an
alternative backend and a base for future scalar-DMA gather variants; the
production path remains engine/renderer.py's XLA formulation.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops import fft as fft_ops


def _kernel(
    idx_ref,    # (TB, 8) int32 VMEM: old brackets 0..3, new brackets 4..7
    w_ref,      # (TB, 8) float32 VMEM tile
    xdr_ref,    # (TB, bins) float32 — forward spectrum x distance, real
    xdi_ref,    # (TB, bins)
    trl_ref,    # (710, bins) tables: real L
    til_ref,    # imag L
    trr_ref,    # real R
    tir_ref,    # imag R
    icr_ref,    # (bins, fpb) inverse tail basis, cos
    ici_ref,    # (bins, fpb) inverse tail basis, sin
    out_ref,    # (TB, 4*fpb): [oldL | oldR | newL | newR]
    *,
    tb: int,
    num_hrtf: int,
    fpb: int,
):
    f32 = jnp.float32
    hi = jax.lax.broadcasted_iota(jnp.int32, (tb, num_hrtf), 1)

    def onehot_weights(base):
        acc = jnp.zeros((tb, num_hrtf), dtype=f32)
        for j in range(4):
            col = idx_ref[:, base + j][:, None]  # SMEM scalars -> (TB, 1)
            acc = acc + jnp.where(hi == col, w_ref[:, base + j][:, None], f32(0.0))
        return acc

    xdr = xdr_ref[:]
    xdi = xdi_ref[:]
    for s, base in enumerate((0, 4)):          # old set, new set
        wmat = onehot_weights(base)            # (TB, 710)

        def blend(tab_ref):
            return jax.lax.dot_general(
                wmat, tab_ref[:],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32,
            )

        for c, (tr_ref, ti_ref) in enumerate(((trl_ref, til_ref), (trr_ref, tir_ref))):
            gr = blend(tr_ref)
            gi = blend(ti_ref)
            qr = xdr * gr - xdi * gi
            qi = xdr * gi + xdi * gr
            y = jax.lax.dot_general(
                qr, icr_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
            ) + jax.lax.dot_general(
                qi, ici_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
            )
            out_ref[:, (2 * s + c) * fpb : (2 * s + c + 1) * fpb] = y


@functools.partial(jax.jit, static_argnames=("config", "tb", "interpret"))
def fused_apply(
    spectra_planes,  # (trl, til, trr, tir): each (num_hrtf, bins) float32
    xdr,             # (B, bins) float32 — rfft(x) x distance factor, real
    xdi,             # (B, bins)
    idx8,            # (B, 8) int32: old brackets then new brackets
    w8,              # (B, 8) float32
    xfade,           # (B,) bool
    config: EngineConfig = DEFAULT_CONFIG,
    tb: int = 256,
    interpret: bool = False,
):
    """Fused blend+apply+inverse -> (B, fpb, 2) crossfaded stereo tails."""
    trl, til, trr, tir = spectra_planes
    b = xdr.shape[0]
    bins = config.num_bins
    fpb = config.frames_per_buffer
    n_h = trl.shape[0]
    assert b % tb == 0, f"block count {b} must be a multiple of tile {tb}"
    icr, ici = fft_ops._idft_tail_matrices(config.pad_len, fpb)

    kernel = functools.partial(_kernel, tb=tb, num_hrtf=n_h, fpb=fpb)
    grid = (b // tb,)
    tile = lambda cols: pl.BlockSpec((tb, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(8),  # idx (int32) — compiled Mosaic only loads scalars from SMEM
            tile(8),
            tile(bins),
            tile(bins),
            full(), full(), full(), full(),  # tables stay resident
            full(), full(),                  # inverse bases
        ],
        out_specs=tile(4 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 4 * fpb), jnp.float32),
        interpret=interpret,
    )(idx8, w8, xdr, xdi, trl, til, trr, tir, jnp.asarray(icr), jnp.asarray(ici))

    y = out.reshape(b, 4, fpb)  # [oldL, oldR, newL, newR]
    fn = jnp.arange(fpb, dtype=jnp.float32) / jnp.float32(fpb - 1)
    mixed = y[:, :2] * (1.0 - fn) + y[:, 2:] * fn
    res = jnp.where(xfade[:, None, None], mixed, y[:, 2:])
    return jnp.transpose(res, (0, 2, 1))


def kernel_planes(db) -> tuple:
    """(trl, til, trr, tir): per-ear real/imag table planes, kernel order."""
    sp = db.spectra
    r = np.real(sp).astype(np.float32)
    i = np.imag(sp).astype(np.float32)
    return (
        jnp.asarray(r[:, 0, :]),
        jnp.asarray(i[:, 0, :]),
        jnp.asarray(r[:, 1, :]),
        jnp.asarray(i[:, 1, :]),
    )
