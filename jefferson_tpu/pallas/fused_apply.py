"""Fused filter-apply + tail-IDFT + crossfade Pallas kernel.

The apply stage dominates the moving-source step after the combined-plane
blend (measured 1.9 ms of the ~2.6 ms step in isolation,
scripts/bench_stages.py): XLA materializes the 8 complex-multiply products
(old/new x L/R x re/im planes) to HBM before the inverse-DFT matmuls read
them back (~270 MB of avoidable traffic per 8192 blocks).  This kernel keeps
the products in VMEM: per tile of TB blocks it

  * reads the distance-premultiplied forward planes (TB, bins),
  * reads one tile of the OLD-filter blend rows g_old (packed
    [rL|iL|rR|iR] rows; Mosaic handles the non-lane-aligned plane slices,
    and packed rows carry 20% less HBM traffic than a lane-padded stride
    — both measured, bit-identical),
  * derives the NEW-filter rows from the same tile: new[k] = old[k+1]
    within a stream segment (reference crossfade state: old == previous
    new, engine/plan invariant), via a sublane roll patched at segment
    ends with the per-segment last-new rows,
  * does the complex multiplies on the VPU and feeds the MXU tail-IDFT
    matmuls directly from VMEM,
  * applies the crossfade as select-then-multiply weights (bit-exact with
    the where() formulation: a = xf ? 1-f : 0, b = xf ? f : 1).

``seg`` is the per-stream segment length in blocks (the batch's per-source
nb, or the whole chunk for a single stream).  Replaces the XLA chain in
apply_filters_core when enabled; the reference analogue is the per-block
kernel chain + cufft C2R + crossFade of
reference: Jefferson/src/GPUSoundSource.cu:320-385.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import _tail_dots, _xfade_weights


def plane_stride(bins: int) -> int:
    """Per-plane column stride in the padded cat layout (lane multiple)."""
    return (bins + 127) // 128 * 128


def pad_cat_planes(cat: np.ndarray, bins: int) -> np.ndarray:
    """(rows, 4*bins) packed cat -> (rows, 4*stride) lane-aligned layout."""
    stride = plane_stride(bins)
    out = np.zeros((cat.shape[0], 4 * stride), cat.dtype)
    for j in range(4):
        out[:, j * stride : j * stride + bins] = cat[:, j * bins : (j + 1) * bins]
    return out


def _kernel(
    xdr_ref,   # (TB, bins)
    xdi_ref,   # (TB, bins)
    g_ref,     # (TB, 4*stride) old-filter rows [rL|iL|rR|iR], stride-padded
               # (the NEW rows when not with_xfade)
    *rest,     # with_xfade: patch (P, 4*stride), xf (TB, 1), icr, ici, out;
               # else just icr, ici, out
    tb: int,
    seg: int,
    bins: int,
    stride: int,
    fpb: int,
    p_rows: int,
    tail_tree: bool = False,
    with_xfade: bool = True,
):
    if with_xfade:
        patch_ref, xf_ref, icr_ref, ici_ref, out_ref = rest
    else:
        icr_ref, ici_ref, out_ref = rest
    f32 = jnp.float32
    c4 = 4 * stride
    xdr = xdr_ref[:]
    xdi = xdi_ref[:]

    def tail(g, off_r, off_i):
        gr = g[:, off_r : off_r + bins]
        gi = g[:, off_i : off_i + bins]
        qr = xdr * gr - xdi * gi
        qi = xdr * gi + xdi * gr
        return _tail_dots(qr, qi, icr_ref, ici_ref, bins, tail_tree)

    if not with_xfade:
        # no-crossfade fast path (round 5): g_ref carries the NEW rows and
        # the old-side tails/crossfade arithmetic disappear (bit-identical
        # on non-crossfading rows: out = y_old*0 + y_new*1 there)
        g = g_ref[:]
        for c in range(2):  # L, R
            off_r, off_i = 2 * c * stride, (2 * c + 1) * stride
            out_ref[:, c * fpb : (c + 1) * fpb] = tail(g, off_r, off_i)
        return

    go = g_ref[:]
    # new rows: old rows shifted up one block within each segment; segment
    # ends take the patch rows (per-segment last-new filters / boundary)
    rolled = pltpu.roll(go, shift=tb - 1, axis=0)  # rolled[j] = go[(j+1) % tb]
    local = jax.lax.broadcasted_iota(jnp.int32, (tb, c4), 0)
    p = p_rows  # real patch rows; the operand is padded to a sublane multiple
    reps = tb // p  # kernel rows covered by one patch row
    if seg >= tb:
        pred = local == tb - 1
    else:
        pred = (local + 1) % seg == 0
    gn = rolled
    for j in range(p):  # row local takes patch[local // reps] at segment ends
        gn = jnp.where(
            pred & (local // reps == j),
            jnp.broadcast_to(patch_ref[j : j + 1, :], (tb, c4)),
            gn,
        )

    a, b = _xfade_weights(xf_ref, fpb)  # (TB, fpb) old/new crossfade ramps

    for c in range(2):  # L, R
        off_r, off_i = 2 * c * stride, (2 * c + 1) * stride
        y_old = tail(go, off_r, off_i)
        y_new = tail(gn, off_r, off_i)
        out_ref[:, c * fpb : (c + 1) * fpb] = y_old * a + y_new * b


@functools.partial(
    jax.jit, static_argnames=("seg", "bins", "fpb", "tb", "interpret",
                              "tail_tree", "with_xfade")
)
def fused_apply_xfade(
    xdr: jax.Array,     # (B, bins) forward plane x distance, real
    xdi: jax.Array,     # (B, bins)
    g_old: jax.Array,   # (B, 4*stride) old-filter rows, stride-padded
                        # (the NEW rows when not with_xfade)
    g_last: jax.Array,  # (B//seg, 4*stride) per-segment LAST new-filter rows
                        # (None when not with_xfade)
    xf: jax.Array,      # (B, 1) float32 crossfade mask (None when not with_xfade)
    icr: jax.Array,     # (bins, fpb)
    ici: jax.Array,     # (bins, fpb)
    seg: int,
    bins: int,
    fpb: int,
    tb: int = 256,
    interpret: bool | None = None,
    tail_tree: bool = False,
    with_xfade: bool = True,
) -> jax.Array:
    """-> (B, 2*fpb) crossfaded stereo tails [L | R] per block.

    seg: blocks per independent stream segment; within a segment
    new[k] = old[k+1] and the segment's final new row is g_last[segment].
    Requires tb | B and (seg | tb or tb | seg).
    interpret=None auto-selects: compiled Mosaic on TPU backends,
    interpreter elsewhere (so the engine's fused path stays testable on the
    CPU mesh).

    ``with_xfade=False``: no-crossfade fast path — ``g_old`` carries the
    NEW rows, g_last/xf are ignored (pass None), and the kernel computes
    only the new-side tails (half the tail-IDFT MACs; see _kernel).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    b = xdr.shape[0]
    c4 = g_old.shape[1]
    stride = c4 // 4
    assert b % tb == 0, f"block count {b} must be a multiple of tile {tb}"
    assert b % seg == 0
    n_tiles = b // tb
    if seg >= tb:
        assert seg % tb == 0
        p_rows = 1
    else:
        assert tb % seg == 0
        p_rows = tb // seg
    if with_xfade:
        if seg >= tb:
            # per-tile boundary row: old[(i+1)*tb], except at segment ends
            # where it is that segment's g_last row
            cand = jnp.concatenate([g_old[tb::tb], g_last[-1:]], axis=0)  # (n_tiles, C)
            grp = cand.reshape(b // seg, seg // tb, c4)
            patch = jnp.concatenate([grp[:, :-1], g_last[:, None, :]], axis=1).reshape(
                n_tiles, c4
            )
        else:
            patch = g_last  # (n_tiles * p_rows, C), natural order

        # Mosaic block sublane dims must be multiples of 8: pad the per-tile
        # patch block with dummy rows (the kernel only reads the first p_rows)
    p_pad = max(8, (p_rows + 7) // 8 * 8)
    if with_xfade and p_pad != p_rows:
        patch3 = patch.reshape(n_tiles, p_rows, c4)
        patch3 = jnp.pad(patch3, ((0, 0), (0, p_pad - p_rows), (0, 0)))
        patch = patch3.reshape(n_tiles * p_pad, c4)

    kernel = functools.partial(
        _kernel, tb=tb, seg=seg, bins=bins, stride=stride, fpb=fpb,
        p_rows=p_rows, tail_tree=tail_tree, with_xfade=with_xfade,
    )
    tile = lambda cols, rows=tb: pl.BlockSpec(
        (rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    xf_specs = [tile(c4, rows=p_pad), tile(1)] if with_xfade else []
    xf_args = (patch, xf) if with_xfade else ()
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(bins),
            tile(bins),
            tile(c4),
            *xf_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(xdr, xdi, g_old, *xf_args, icr, ici)
