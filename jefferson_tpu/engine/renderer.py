"""Offline batched renderer — the flagship TPU compute path.

Key TPU-first insight (vs the reference's realtime block loop, reference:
Jefferson/src/Audio.cu:94-163): offline, the overlap-save dependency chain is
on the *input*, which is fully known, so output blocks are independent.  The
whole render becomes one batched pipeline per chunk of blocks:

    sliding sub-block forward DFT over the sample stream -> (B, bins) planes
    -> extended HRTF blend (old set = previous block's new set) per ear
    -> x distance factor (shared), x blended filters -> tail-only inverse DFT
    -> crossfade tails -> (B, 128, 2)

with zero sequential state on the device, all tensors channel-split
(B, bins) float32 planes.  The reference needs ~16 kernel
launches + 3 FFTs per 128-sample block (reference:
Jefferson/src/GPUSoundSource.cu:320-385); here XLA sees the entire chunk as
one fused program, and all FLOPs are batched dense ops that tile onto the
MXU/VPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ProcessType
from ..hrtf.kemar import HRTFDatabase
from ..ops import fft as fft_ops
from ..ops.filters import (
    blend_filters,
    cmul,
    crossfade_tails,
    distance_factors,
    distance_factors_split,
)
from .plan import RenderPlan, fed_stream, make_plan


def _segments(full: jax.Array, num_blocks: int, config: EngineConfig) -> jax.Array:
    """(hist + B*fpb,) sample stream -> (B, pad_len) overlap-save windows."""
    fpb = config.frames_per_buffer
    starts = jnp.arange(num_blocks) * fpb
    idx = starts[:, None] + jnp.arange(config.pad_len)[None, :]
    return full[idx]


def _forward_split(full: jax.Array, num_blocks: int, config: EngineConfig):
    """Forward DFT planes of all overlap-save windows (matmul backend).

    Uses the sliding sub-block decomposition when the history is a whole
    number of blocks (the default geometry), avoiding the q-fold duplicated
    window materialization; falls back to explicit windows otherwise.
    """
    if config.history_len % config.frames_per_buffer == 0:
        return fft_ops.rfft_sliding_split(
            full, num_blocks, config.frames_per_buffer, config.pad_len
        )
    segs = _segments(full, num_blocks, config)
    return fft_ops.rfft_split(segs, config.pad_len)


def _fd_complex_chunk(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    idx_new: jax.Array,
    w_new: jax.Array,
    idx_old: jax.Array,
    w_old: jax.Array,
    xfade: jax.Array,
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    *,
    config: EngineConfig,
    num_blocks: int,
    backend: str,
    with_xfade: bool,
):
    """One chunk of the interpolating FD pipeline. Returns ((B, fpb, 2), new_hist).

    backend 'matmul' (default, TPU-native): explicit real/imag planes, DFT as
    MXU matmuls, inverse truncated to the output tail (the deployed TPU
    runtime has no complex64/FFT HLO — and the tail-only inverse is an 8x
    FLOP cut regardless).  backend 'fft': complex64 + XLA FFT HLO (CPU, and
    TPU stacks that support it).
    """
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * config.frames_per_buffer :]
    fpb = config.frames_per_buffer

    if backend == "fft":
        spectra_c = spectra
        x_spec = fft_ops.rfft(_segments(full, num_blocks, config), config.pad_len)
        df = distance_factors(u_hi, u_lo, inv_frac, config.num_bins)
        g_new = blend_filters(spectra_c, idx_new, w_new) * df[:, None, :]
        prod_new = x_spec[:, None, :] * g_new
        if with_xfade:
            g_old = blend_filters(spectra_c, idx_old, w_old) * df[:, None, :]
            prod_old = x_spec[:, None, :] * g_old
            stacked = jnp.concatenate([prod_old, prod_new], axis=1)
            y = fft_ops.irfft(stacked, config.pad_len)[..., config.history_len :]
            out = crossfade_tails(y[:, :2], y[:, 2:], xfade)
        else:
            out = fft_ops.irfft(prod_new, config.pad_len)[..., config.history_len :]
        return jnp.transpose(out, (0, 2, 1)), new_hist

    xr, xi = _forward_split(full, num_blocks, config)
    if with_xfade:
        # old filters of block b are new filters of block b-1 by plan
        # construction, so one extended blend of B+1 rows serves both sets.
        idx_ext = jnp.concatenate([idx_old[:1], idx_new], axis=0)
        w_ext = jnp.concatenate([w_old[:1], w_new], axis=0)
        g = blend_channels(spectra, idx_ext, w_ext)
        g_old = tuple(a[:num_blocks] for a in g)
        g_new = tuple(a[1:] for a in g)
    else:
        g_new = blend_channels(spectra, idx_new, w_new)
        g_old = None
    out = apply_filters_core(
        xr, xi, g_old, g_new, xfade, u_hi, u_lo, inv_frac,
        config=config, with_xfade=with_xfade,
    )
    return out, new_hist


def _fd_complex_chunk_dedup(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    uniq_idx: jax.Array,
    uniq_w: jax.Array,
    inv: jax.Array,
    xfade: jax.Array,
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    *,
    config: EngineConfig,
    num_blocks: int,
    with_xfade: bool,
):
    """Deduplicated variant of the matmul-backend FD chunk.

    Real trajectories hold each position for many blocks, so the (B+1, 4)
    blend rows contain few unique values.  Blend only the U unique rows
    (U << B) and broadcast with one row-gather per plane: 4(B+1) HBM row
    reads per plane become 4U + (B+1).  Bit-identical to the direct path
    (same per-row op order).  ``inv`` maps extended row b -> unique id;
    with_xfade consumes B+1 rows (old[b] == new[b-1] by plan construction),
    otherwise B.
    """
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * config.frames_per_buffer :]
    xr, xi = _forward_split(full, num_blocks, config)
    g_cat = blend_cat(cat_table(spectra), uniq_idx, uniq_w)  # (U, 4*bins)
    g = split_planes(jnp.take(g_cat, inv, axis=0), config.num_bins)
    if with_xfade:
        g_old = tuple(a[:num_blocks] for a in g)
        g_new = tuple(a[1:] for a in g)
    else:
        g_old, g_new = None, g
    out = apply_filters_core(
        xr, xi, g_old, g_new, xfade, u_hi, u_lo, inv_frac,
        config=config, with_xfade=with_xfade,
    )
    return out, new_hist


def fused_supported() -> bool:
    """Fused Pallas apply requires a real TPU backend (Mosaic); the CPU test
    mesh exercises it in interpret mode via tests/test_fused_apply.py."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# Exception type names that justify falling back from a fused Pallas kernel
# to the XLA path: remote-compile-service flakiness (the deployed stack
# routes every Mosaic compile through a remote service with observed HTTP
# 500s, PERF.md) and Mosaic capability limits on exotic shapes.  Genuine
# program bugs (ValueError/TypeError shape errors at trace time, asserts,
# index errors) must PROPAGATE — silently absorbing them into the XLA path
# hides defects and silently changes numerics.
_FUSED_FALLBACK_TYPES = (
    "XlaRuntimeError",      # jaxlib runtime/compile failures (incl. remote)
    "JaxRuntimeError",
    "LoweringException",    # Mosaic lowering capability limits
    "MosaicError",
    "InternalError",
    "ResourceExhaustedError",  # VMEM/scoped-memory overflow at compile
    "UnavailableError",
    "DeadlineExceededError",
)

# Message signatures that mark a BARE RuntimeError as a compile/runtime-stack
# failure (the deployed stack's remote compile service wraps its failures in
# plain RuntimeErrors in some layers — observed forms in PERF.md dead ends).
# A bare RuntimeError with none of these is a program bug and propagates.
_FUSED_FALLBACK_SIGNATURES = (
    "tpu_compile_helper",   # remote Mosaic compile crash (observed HTTP 500)
    "http 500",
    "mosaic",
    "xla",
    "compile",
    "lowering",
    "resource_exhausted",
    "vmem",
    "scoped memory",
    "unavailable",
    "deadline",
)


def _is_fused_fallback_error(e: BaseException) -> bool:
    """True when ``e`` is a compile/runtime-stack failure worth degrading
    gracefully on (see _FUSED_FALLBACK_TYPES); False for program bugs.

    The remote compile service's failures surface as
    jax.errors.JaxRuntimeError, which the name-based MRO check matches (it
    subclasses RuntimeError).  A BARE RuntimeError is absorbed only when
    its message carries a known compile-service signature
    (_FUSED_FALLBACK_SIGNATURES); otherwise it is a program bug and must
    propagate (round-3 advisor).  Trace-time shape/type bugs raise
    ValueError/TypeError and are NOT absorbed."""
    if isinstance(e, (OSError, ConnectionError)):
        return True
    if any(t.__name__ in _FUSED_FALLBACK_TYPES for t in type(e).__mro__):
        return True
    if isinstance(e, RuntimeError):
        msg = str(e).lower()
        return any(sig in msg for sig in _FUSED_FALLBACK_SIGNATURES)
    return False


# consecutive cross-render failures after which a fused variant stops being
# retried by that instance: one flaky remote-compile HTTP 500 is retried on
# the next render, but a DETERMINISTIC failure (Mosaic lowering limit, VMEM
# OOM on a fixed geometry) must not re-pay a 20 s - 5 min compile attempt on
# every render of a long-lived instance (e.g. the serve.py daemon)
_MAX_FUSED_STRIKES = 2


def _warn_fused_fallback(
    e: BaseException, variant: str, fallback: str, strikes: int | None = None
) -> None:
    import sys

    msg = str(e).strip().splitlines()
    head = msg[0][:300] if msg else ""
    if strikes is not None and strikes >= _MAX_FUSED_STRIKES:
        retry = (f"disabled for this instance after {strikes} consecutive "
                 f"failures")
    else:
        retry = "it will be retried on the next render"
    print(
        f"warning: fused kernel ({variant}) failed to compile/run — using "
        f"{fallback} for the rest of this render; {retry}\n"
        f"  {type(e).__name__}: {head}",
        file=sys.stderr,
    )


def dedup_distance(u_hi, u_lo, inv_frac, cap: int | None = None):
    """Compact-distance plan: (duh(8,), dul(8,), df(8,), sel(B,) int32, n)
    when the render's (u_hi, u_lo, inv_frac) triples take at most ``cap``
    unique values, else None.

    The triple depends only on r, so constant-radius workloads (orbits,
    sweeps, the reference benchmark) qualify — note the reference's
    |coordinates| round trip wobbles r by an ulp on scattered blocks
    (contract, reproduced by the oracle), so "constant r" still yields 2-4
    unique triples; exact-match dedup handles that.  The fused kernels then
    compute ONE ramp per unique triple and select per row — BIT-IDENTICAL
    (each row's ramp comes from its exact triple) while removing ~2*B*bins
    VPU cos/sin per step, the largest non-MXU term (PERF.md Roofline:
    measured 0.21 ms = 1.15x at the bench operating point)."""
    from ..pallas.fused_step import MAX_DIST_UNIQ

    cap = MAX_DIST_UNIQ if cap is None else cap
    # the kernels hardcode an (8, 1) unique-triple operand; a larger cap
    # would silently ship an (n, 1) operand into a kernel reading 8 rows
    assert cap <= 8, f"compact-distance cap {cap} exceeds the kernel's 8 rows"
    if len(u_hi) == 0:
        return None
    trip = np.stack([u_hi, u_lo, inv_frac], axis=1)
    uniq, inv = np.unique(trip, axis=0, return_inverse=True)
    n = len(uniq)
    if n > cap:
        return None
    if n < 8:  # pad the triple rows to the kernel's fixed (8, 1) operand
        uniq = np.concatenate([uniq, np.repeat(uniq[-1:], 8 - n, axis=0)])
    return (
        uniq[:, 0].astype(np.float32),
        uniq[:, 1].astype(np.float32),
        uniq[:, 2].astype(np.float32),
        inv.astype(np.int32),
        n,
    )


def pick_fused_tile(b: int, seg: int, max_tb: int = 256) -> int | None:
    """Largest fused-kernel tile <= max_tb compatible with (B, seg), or None.

    Needs tb | B, (seg | tb or tb | seg), and tb % 8 == 0 (Mosaic sublane
    tiling; CPU interpret mode would accept any tile, so enforce the
    hardware constraint here) — see pallas/fused_apply.py."""
    if b <= 0 or seg <= 0 or b % seg:
        return None
    if seg >= max_tb:
        for t in (256, 128, 64, 32, 16, 8):
            if t <= max_tb and seg % t == 0:
                return t
        return None
    n_seg = b // seg
    for m in range(max_tb // seg, 0, -1):
        t = m * seg
        if n_seg % m == 0 and t % 8 == 0:
            return t
    return None


def _fd_complex_chunk_fused(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    idx_old: jax.Array,   # (B, 4) old-aligned rows (plan.idx_old); the NEW
                          # rows (plan.idx_new) when not with_xfade
    w_old: jax.Array,
    idx_last: jax.Array,  # (1, 4) the chunk's final new row (unused when
                          # not with_xfade)
    w_last: jax.Array,
    xfade: jax.Array,     # (unused when not with_xfade)
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    dsel: jax.Array | None = None,
    *,
    config: EngineConfig,
    num_blocks: int,
    tb: int,
    n_dist: int | None = None,
    lane512: bool | None = None,
    tail_tree: bool | None = None,
    with_xfade: bool = True,
):
    """Fused-kernel variant of the interpolating FD chunk (TPU only).
    ``n_dist``: compact-distance mode — u_hi/u_lo/inv_frac arrive as the
    (8,) unique-triple arrays and ``dsel`` (B,) selects per block (see
    renderer.dedup_distance).

    The blend runs on OLD-aligned rows (idx_old[b] == idx_new[b-1] by plan
    construction) plus the single last-new row; the kernel derives new rows
    by roll+patch and fuses cmul + tail-IDFT + crossfade (5.2x the XLA
    apply stage on v5e — scripts/bench_fused_apply.py).

    ``with_xfade=False`` (round 5): the chunk has no crossfading block —
    idx/w arrive as the NEW rows and the kernel skips the old-side tails
    (bit-identical on such chunks, half the tail-IDFT MACs)."""
    fpb = config.frames_per_buffer
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * fpb :]
    # packed (bins-stride) rows: Mosaic handles the non-lane-aligned plane
    # slices, and skipping the pad zeros cuts blend traffic 20% (measured
    # 1.72 vs 2.06 ms full step on v5e, bit-identical)
    cat = cat_table(spectra)
    lane512 = _resolve_lane512(lane512, config, gather=True)
    from ..pallas.fused_step import maybe_lane512

    cat = maybe_lane512(cat, lane512, config.num_bins)
    g_rows = blend_cat(cat, idx_old, w_old)
    if with_xfade:
        g_last = blend_cat(cat, idx_last, w_last)
        xf = xfade.astype(jnp.float32)[:, None]
    else:
        g_last, xf = None, None
    y = _apply_maybe_full_fuse(
        full, u_hi, u_lo, inv_frac, g_rows, g_last, xf, config, num_blocks, tb,
        dsel=dsel, n_dist=n_dist, lane512=lane512,
        tail_tree=_resolve_tail_tree(tail_tree), with_xfade=with_xfade,
    )
    return jnp.transpose(y.reshape(num_blocks, 2, fpb), (0, 2, 1)), new_hist


def _resolve_tail_tree(tail_tree) -> bool:
    """Resolve a chunk function's tail_tree flag (None = module default —
    the pairwise-tree tail-IDFT contraction, see fused_step.TAIL_TREE_DEFAULT)."""
    from ..pallas.fused_step import TAIL_TREE_DEFAULT

    return TAIL_TREE_DEFAULT if tail_tree is None else bool(tail_tree)


def _resolve_fwd512(fwd512, lane512: bool) -> bool:
    """Resolve a chunk function's fwd512 flag (None = module default);
    only meaningful on the lane512 one-hot forms."""
    from ..pallas.fused_step import FWD512_DEFAULT

    if fwd512 is None:
        fwd512 = FWD512_DEFAULT
    return bool(fwd512) and lane512


def _resolve_lane512(lane512, config, gather: bool = False) -> bool:
    """Resolve a chunk function's lane512 flag (None = module default; the
    layout needs the aligned geometry — the fused_apply fallback keeps the
    classic 4*bins rows)."""
    from ..pallas.fused_step import LANE512_DEFAULT, LANE512_GATHER_DEFAULT

    if lane512 is None:
        lane512 = LANE512_GATHER_DEFAULT if gather else LANE512_DEFAULT
    return bool(lane512) and (
        config.history_len % config.frames_per_buffer == 0
    )


def _fd_complex_chunk_onehot(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    uniq_ids: jax.Array,   # (U_pad,) unique filter ids (plan.compact_filter_ids)
    ridx: jax.Array,       # (B, 4) OLD-aligned rows remapped into the table
    w_old: jax.Array,      # (B, 4)
    ridx_last: jax.Array,  # (1, 4)
    w_last: jax.Array,     # (1, 4)
    xfade: jax.Array,
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    dsel: jax.Array | None = None,
    *,
    config: EngineConfig,
    num_blocks: int,
    tb: int,
    n_dist: int | None = None,
    lane512: bool | None = None,
    fwd512: bool | None = None,
    tail_tree: bool | None = None,
):
    """One-hot compact-table chunk for one stream: the unique-filter table
    stays VMEM-resident and the blend runs on the MXU — zero filter
    gathers and no blended-row materialization (PERF.md; subsumes the
    dedup path's blend savings whenever U_pad <= 512)."""
    from ..pallas.fused_step import fused_step_stream_onehot_xfade

    fpb = config.frames_per_buffer
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * fpb :]
    table = jnp.take(cat_table(spectra), uniq_ids, axis=0)
    lane512 = _resolve_lane512(lane512, config)
    from ..pallas.fused_step import maybe_lane512

    table = maybe_lane512(table, lane512, config.num_bins)
    y = fused_step_stream_onehot_xfade(
        full, u_hi[:, None], u_lo[:, None], inv_frac[:, None],
        table, ridx, w_old, ridx_last, w_last,
        xfade.astype(jnp.float32)[:, None],
        pad_len=config.pad_len, bins=config.num_bins, fpb=fpb, tb=tb,
        dsel=None if dsel is None else dsel[:, None], n_dist=n_dist,
        lane512=lane512, fwd512=_resolve_fwd512(fwd512, lane512),
        tail_tree=_resolve_tail_tree(tail_tree),
    )
    return jnp.transpose(y.reshape(num_blocks, 2, fpb), (0, 2, 1)), new_hist


def _fd_complex_chunk_onehot_grouped(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    uniq_ids: jax.Array,   # (G*U_pad,) stacked per-group unique filter ids
    ridx: jax.Array,       # (B, 4) OLD-aligned rows remapped per group
    w_old: jax.Array,      # (B, 4)
    rbnd: jax.Array,       # (n_tiles, 4) per-tile boundary rows, per group
    wbnd: jax.Array,       # (n_tiles, 4)
    xfade: jax.Array,
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    dsel: jax.Array | None = None,
    *,
    config: EngineConfig,
    num_blocks: int,
    tb: int,
    group_tiles: int,
    u_pad: int,
    n_dist: int | None = None,
    lane512: bool | None = None,
    fwd512: bool | None = None,
    tail_tree: bool | None = None,
):
    """Grouped one-hot chunk for wide movers: chunks touching more unique
    filters than one compact table's VMEM gate split into per-group tables
    block-sliced by the kernel — one dispatch per chunk either way (see
    plan.compact_filter_ids_grouped / PERF.md round-3 cliff measurements)."""
    from ..pallas.fused_step import fused_step_stream_onehot_grouped_xfade

    fpb = config.frames_per_buffer
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * fpb :]
    tables = jnp.take(cat_table(spectra), uniq_ids, axis=0)  # (G*U_pad, 4*bins)
    lane512 = _resolve_lane512(lane512, config)
    from ..pallas.fused_step import maybe_lane512

    tables = maybe_lane512(tables, lane512, config.num_bins)
    y = fused_step_stream_onehot_grouped_xfade(
        full, u_hi[:, None], u_lo[:, None], inv_frac[:, None],
        tables, ridx, w_old, rbnd, wbnd,
        xfade.astype(jnp.float32)[:, None],
        pad_len=config.pad_len, bins=config.num_bins, fpb=fpb, tb=tb,
        group_tiles=group_tiles, u_pad=u_pad,
        dsel=None if dsel is None else dsel[:, None], n_dist=n_dist,
        lane512=lane512, fwd512=_resolve_fwd512(fwd512, lane512),
        tail_tree=_resolve_tail_tree(tail_tree),
    )
    return jnp.transpose(y.reshape(num_blocks, 2, fpb), (0, 2, 1)), new_hist


def _apply_maybe_full_fuse(
    full, u_hi, u_lo, inv_frac, g_old, g_last, xf, config, num_blocks, tb,
    dsel=None, n_dist: int | None = None, lane512: bool = False,
    tail_tree: bool = False, with_xfade: bool = True,
):
    """Run the fused step: forward DFT + distance in-kernel when the
    geometry is aligned (history a whole number of blocks), else XLA
    forward/distance + fused apply.

    ``with_xfade=False``: g_old carries the NEW rows and the kernel runs
    the no-crossfade fast path (half the tail-IDFT MACs; bit-identical on
    non-crossfading blocks)."""
    from ..pallas.fused_apply import fused_apply_xfade
    from ..pallas.fused_step import fused_step_stream_xfade

    fpb = config.frames_per_buffer
    if config.history_len % fpb == 0:
        return fused_step_stream_xfade(
            full, u_hi[:, None], u_lo[:, None], inv_frac[:, None],
            g_old, g_last, xf,
            pad_len=config.pad_len, bins=config.num_bins, fpb=fpb, tb=tb,
            dsel=None if dsel is None else dsel[:, None], n_dist=n_dist,
            lane512=lane512, tail_tree=tail_tree, with_xfade=with_xfade,
        )
    assert n_dist is None, "compact distance needs the aligned geometry"
    assert not lane512, "lane512 needs the aligned geometry (see _resolve_lane512)"
    xr, xi = _forward_split(full, num_blocks, config)
    dr, di = distance_factors_split(u_hi, u_lo, inv_frac, config.num_bins)
    xdr, xdi = cmul(xr, xi, dr, di)
    icr, ici = fft_ops._idft_tail_matrices(config.pad_len, fpb)
    return fused_apply_xfade(
        xdr, xdi, g_old, g_last, xf,
        jnp.asarray(icr), jnp.asarray(ici),
        seg=num_blocks, bins=config.num_bins, fpb=fpb, tb=tb,
        tail_tree=tail_tree, with_xfade=with_xfade,
    )


def _apply_xfade_amortization(chunk_xfs: list[bool]) -> list[bool]:
    """Amortization guard for the no-crossfade program election: a SECOND
    program variant costs an uncached remote compile (20 s - 5 min), so the
    no-crossfade variant is only elected when at least two chunks would use
    it (a lone crossfade-free chunk rides the crossfade program; a
    whole-render no-crossfade always qualifies).  THE single policy —
    renderer and BatchRenderer both plan with it (like _sparse_bucket)."""
    if any(chunk_xfs) and 0 < chunk_xfs.count(False) < 2:
        return [True] * len(chunk_xfs)
    return chunk_xfs


def _sparse_bucket(max_ncf: int, rows: int) -> int | None:
    """Static cf-row bucket for the sparse-crossfade side-pass, or None
    when the crossfades are too dense for it to pay (bucket > rows/8).
    THE single policy — renderer and BatchRenderer both plan with it."""
    if max_ncf <= 0:
        return None
    bucket = max(8, 1 << int(np.ceil(np.log2(max_ncf))))
    return bucket if bucket <= rows // 8 else None


def _pad_cf_indices(xfade_rows: np.ndarray, bucket: int) -> np.ndarray:
    """Crossfading-row ids padded to ``bucket`` by repeating the last real
    id (duplicates scatter identical values; an all-hold chunk pads with
    id 0, masked by its False xfade flag)."""
    cfi = np.flatnonzero(xfade_rows)
    if len(cfi) == 0:
        return np.zeros(bucket, np.int64)
    if len(cfi) < bucket:
        cfi = np.concatenate([cfi, np.repeat(cfi[-1:], bucket - len(cfi))])
    return cfi


def _sparse_xfade_fix(
    y, subs_all, cf_idx, g_old_cf, xfade, u_hi, u_lo, inv_frac,
    *, config: EngineConfig, nb_seg: int, xr_cf=None, xi_cf=None,
):
    """Fix up the FEW crossfading rows of a no-crossfade kernel output.

    The reference cadence (one position per 172 blocks,
    precision_test.cu:2093-2148) puts 1-2 crossfades in every chunk, so the
    chunk-level no-crossfade dispatch never fires — yet 99%+ of rows pay
    the full double-tail cost for them.  This side-pass lets such chunks run
    the no-crossfade kernel anyway: ``y`` holds the new-side tails for ALL
    rows; the ``cf_idx`` rows (a small static bucket, padded by repeating a
    real id) are then re-blended with an XLA-computed old-side tail:

      * forward DFT for just those rows in the SLIDING sub-block form
        (identical association to ops/fft.rfft_sliding_split and the
        in-kernel forward — per-row contraction order is unchanged),
      * distance ramp in the XLA op order (bit-identical to in-kernel),
      * old-filter apply + tail-IDFT via the XLA chain (the error budget's
        most accurate association),
      * the reference crossfade formula, masked by each row's actual xfade
        flag so padded/duplicate ids rewrite their unchanged y values.

    subs_all: (S*(nb_seg + q - 1), fpb) per-source sub-block sample rows;
    cf_idx are flattened (source*nb_seg + block) row ids.  When the caller
    already materialized the forward planes for all rows (the fused_apply
    fallback branch), pass their cf gathers as ``xr_cf``/``xi_cf`` and the
    recompute is skipped (bit-identical values, same association).
    """
    fpb = config.frames_per_buffer
    bins = config.num_bins
    n = config.pad_len
    q = n // fpb
    p = jax.lax.Precision.HIGHEST
    if xr_cf is not None:
        xr, xi = xr_cf, xi_cf
    else:
        s_ids = cf_idx // nb_seg
        base = cf_idx + s_ids * (q - 1)
        win = base[:, None] + jnp.arange(q)[None, :]      # (ncf, q)
        subs = subs_all[win]                              # (ncf, q, fpb)
        cr, ci = fft_ops._subblock_dft_matrices(n, fpb)
        ncf = cf_idx.shape[0]
        flat = subs.reshape(ncf * q, fpb)
        pr = jnp.matmul(flat, jnp.asarray(cr), precision=p).reshape(ncf, q, bins)
        pi = jnp.matmul(flat, jnp.asarray(ci), precision=p).reshape(ncf, q, bins)
        twr, twi = fft_ops._sliding_twiddles(n, fpb)
        xr, xi = pr[:, 0], pi[:, 0]
        for m in range(1, q):
            a, b = jnp.asarray(twr[m])[None, :], jnp.asarray(twi[m])[None, :]
            xr = xr + (a * pr[:, m] - b * pi[:, m])
            xi = xi + (a * pi[:, m] + b * pr[:, m])
    dr, di = distance_factors_split(
        u_hi[cf_idx], u_lo[cf_idx], inv_frac[cf_idx], bins
    )
    xdr, xdi = cmul(xr, xi, dr, di)
    grl, gil, grr, gir = split_planes(g_old_cf, bins)
    qs = [cmul(xdr, xdi, grl, gil), cmul(xdr, xdi, grr, gir)]
    qr = jnp.stack([qq[0] for qq in qs])                  # (2, ncf, bins)
    qi = jnp.stack([qq[1] for qq in qs])
    y_old = fft_ops.irfft_tail_split(qr, qi, n, fpb)      # (2, ncf, fpb)
    fn = jnp.arange(fpb, dtype=jnp.float32) / jnp.float32(fpb - 1)
    y_new_cf = y[cf_idx]                                  # (ncf, 2*fpb)
    mask = (xfade[cf_idx])[:, None]
    cols = []
    for c in range(2):
        yn = y_new_cf[:, c * fpb : (c + 1) * fpb]
        mixed = y_old[c] * (1.0 - fn) + yn * fn
        cols.append(jnp.where(mask, mixed, yn))
    return y.at[cf_idx].set(jnp.concatenate(cols, axis=1))


def _fd_complex_chunk_dedup_fused(
    spectra,
    hist: jax.Array,
    fed: jax.Array,
    uniq_idx: jax.Array,  # (U, 4)
    uniq_w: jax.Array,    # (U, 4)
    inv_old: jax.Array,   # (B,) unique-row id of each block's OLD filters
                          # (its NEW filters when not with_xfade)
    inv_last: jax.Array,  # (1,) unique-row id of the chunk's final new row
                          # (unused when not with_xfade)
    xfade: jax.Array,     # (unused when not with_xfade, except sparse mode)
    u_hi: jax.Array,
    u_lo: jax.Array,
    inv_frac: jax.Array,
    dsel: jax.Array | None = None,
    cf_idx: jax.Array | None = None,  # (n_cf,) crossfading row ids (sparse)
    cf_old: jax.Array | None = None,  # (n_cf,) their OLD unique-row ids
    *,
    config: EngineConfig,
    num_blocks: int,
    tb: int,
    n_dist: int | None = None,
    lane512: bool | None = None,
    tail_tree: bool | None = None,
    with_xfade: bool = True,
    n_cf: int | None = None,
):
    """Dedup + fused composition: blend only the unique rows, broadcast with
    one padded-row gather, and run the fused apply kernel.  Covers the
    reference benchmark workload (positions persist for many blocks) with
    both optimizations stacked.

    ``with_xfade=False`` (round 5): the chunk has no crossfading block, so
    ``inv_old`` carries the NEW-row ids, the old-side gather disappears and
    the kernel runs the no-crossfade fast path (half the tail-IDFT MACs) —
    bit-identical to the crossfade program on such chunks.

    ``n_cf`` (round 5, sparse crossfades): the chunk DOES crossfade but on
    at most n_cf rows (reference cadence: 1-2 per 256 blocks) — run the
    no-crossfade kernel for ALL rows (inv_old = NEW ids again), then
    re-blend just the ``cf_idx`` rows with an XLA-computed old-side tail
    (see _sparse_xfade_fix).  One program handles every chunk of the
    render, crossfading or not (padded ids are masked by their xfade
    flag)."""
    fpb = config.frames_per_buffer
    sparse = n_cf is not None
    assert not (sparse and with_xfade), "sparse mode implies the no-crossfade kernel"
    assert not (sparse and n_dist is not None), \
        "sparse side-pass keeps per-row ramps (gather-form policy)"
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * fpb :]
    cat0 = cat_table(spectra)
    lane512 = _resolve_lane512(lane512, config, gather=True)
    from ..pallas.fused_step import maybe_lane512

    cat = maybe_lane512(cat0, lane512, config.num_bins)
    g_u = blend_cat(cat, uniq_idx, uniq_w)
    g_rows = jnp.take(g_u, inv_old, axis=0)
    if with_xfade:
        g_last = jnp.take(g_u, inv_last, axis=0)
        xf = xfade.astype(jnp.float32)[:, None]
    else:
        g_last, xf = None, None
    y = _apply_maybe_full_fuse(
        full, u_hi, u_lo, inv_frac, g_rows, g_last, xf, config, num_blocks, tb,
        dsel=dsel, n_dist=n_dist, lane512=lane512,
        tail_tree=_resolve_tail_tree(tail_tree), with_xfade=with_xfade,
    )
    if sparse:
        # the side-pass applies filters in the classic plane layout: blend
        # ONLY the n_cf old rows it needs (bit-identical to taking them
        # from a full-table blend — per-row op order is unchanged)
        g_old_cf = blend_cat(cat0, jnp.take(uniq_idx, cf_old, axis=0),
                             jnp.take(uniq_w, cf_old, axis=0))
        y = _sparse_xfade_fix(
            y, full.reshape(-1, fpb), cf_idx, g_old_cf,
            xfade, u_hi, u_lo, inv_frac,
            config=config, nb_seg=num_blocks,
        )
    return jnp.transpose(y.reshape(num_blocks, 2, fpb), (0, 2, 1)), new_hist


def cat_table(spectra) -> jax.Array:
    """Combined-plane filter table (num_hrtf, 4*bins) = [rL | iL | rR | iR].

    One wide row per filter: the blend becomes 4 row-gathers of the combined
    table instead of 16 narrow per-plane gathers — measured 1.57x faster on
    v5e (scripts/bench_blend_variants.py: 1.035 vs 1.624 ms at 8448 rows),
    bit-identical.  Built inside the jitted chunk (a (710, 2052) concat,
    ~16 us — negligible vs the gather it accelerates)."""
    hr, hi = spectra
    return jnp.concatenate([hr[:, 0, :], hi[:, 0, :], hr[:, 1, :], hi[:, 1, :]], axis=1)


def blend_cat(table_cat: jax.Array, indices: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted 4-row gather on the combined table -> (rows, 4*bins)."""
    w = weights.astype(jnp.float32)
    acc = w[:, 0:1] * jnp.take(table_cat, indices[:, 0], axis=0)
    for j in range(1, indices.shape[1]):
        acc = acc + w[:, j : j + 1] * jnp.take(table_cat, indices[:, j], axis=0)
    return acc


def split_planes(cat: jax.Array, bins: int):
    """(rows, 4*bins) combined blend -> (grL, giL, grR, giR) column views."""
    return tuple(cat[..., k * bins : (k + 1) * bins] for k in range(4))


def blend_channels(spectra, indices: jax.Array, weights: jax.Array):
    """Per-ear weighted filter blends: (rows, 4) indices/weights ->
    (grL, giL, grR, giR), each (rows, bins).  Combined-plane formulation."""
    hr, hi = spectra
    return split_planes(blend_cat(cat_table(spectra), indices, weights), hr.shape[-1])


def apply_filters_core(
    xr, xi, g_old, g_new, xfade, u_hi, u_lo, inv_frac,
    *, config: EngineConfig, with_xfade: bool,
):
    """Filter application on forward planes -> (B, fpb, 2) stereo tails.

    Channel-split layout: every tensor is (B, bins) — per ear, per plane —
    so nothing carries the (…, 2, bins) sublane padding (a 4x HBM-traffic
    tax on TPU for a second-minor dimension of 2).  The distance factor is
    folded into the input spectrum once ((X·D)·G instead of (X·G)·D, a
    float-safe reassociation within the parity gates), shared by all filter
    sets.  Used by the single-source renderer and the flattened batch.
    """
    fpb = config.frames_per_buffer
    dr, di = distance_factors_split(u_hi, u_lo, inv_frac, config.num_bins)
    xdr, xdi = cmul(xr, xi, dr, di)

    def q_set(g):
        grl, gil, grr, gir = g
        return [cmul(xdr, xdi, grl, gil), cmul(xdr, xdi, grr, gir)]

    qs = (q_set(g_old) if with_xfade else []) + q_set(g_new)
    qr = jnp.stack([q[0] for q in qs])  # (2 or 4, B, bins)
    qi = jnp.stack([q[1] for q in qs])
    y = fft_ops.irfft_tail_split(qr, qi, config.pad_len, fpb)  # (S, B, fpb)
    if with_xfade:
        fn = jnp.arange(fpb, dtype=jnp.float32) / jnp.float32(fpb - 1)
        mixed = y[:2] * (1.0 - fn) + y[2:] * fn
        out = jnp.where(xfade[None, :, None], mixed, y[2:])
    else:
        out = y
    return jnp.transpose(out, (1, 2, 0))


def plan_onehot_chunking(
    plan: "RenderPlan", b_total: int, cb: int, tb: int
) -> tuple[int, int | None]:
    """Render-wide one-hot geometry: (group_blocks, u_pad bucket | None).

    Two jobs:
    * ONE U_pad bucket for every chunk of the render, so the whole render
      compiles a single one-hot program (per-chunk buckets recompile
      whenever a chunk straddles a power-of-two unique count — each remote
      compile costs 20 s - 5 min on the deployed stack).
    * GROUPED tables for wide movers: when a chunk's unique-filter set
      exceeds MAX_ONEHOT_U (the compact table's VMEM residency gate,
      pallas/fused_step.py), the chunk's blocks are split into groups of
      ``group_blocks`` each with its OWN compact table, stacked into one
      (G*U_pad, 4*bins) array that the kernel block-slices per tile —
      still ONE dispatch per chunk.  (Host-side sub-chunking was measured
      and rejected: 16 relay dispatches per 8192 blocks cost 5.3x the one
      big chunk, scripts/bench_onehot_cliff.py / PERF.md dead ends.)

    ``group_blocks`` is a multiple of the kernel tile ``tb`` dividing
    ``cb`` (group == chunk means the ungrouped fast path).  Returns u_pad
    None when even tb-sized groups exceed the gate; callers fall back to
    the gather-blend kernel.
    """
    from ..pallas.fused_step import MAX_ONEHOT_U

    def bucket(group: int) -> int:
        max_u = 1
        for start in range(0, b_total, group):
            stop = min(start + group, b_total)
            # each group's table must also hold its boundary row (the next
            # group's first old row — the kernel's roll patch), which
            # compact_filter_ids includes via idx_last
            bnd = plan.idx_old[stop : stop + 1] if stop < b_total else plan.idx_new[-1:]
            ids = np.unique(
                np.concatenate([plan.idx_old[start:stop].reshape(-1), bnd.reshape(-1)])
            )
            max_u = max(max_u, len(ids))
        return max(8, 1 << int(np.ceil(np.log2(max_u))))

    group = cb
    while True:
        u_pad = bucket(group)
        if u_pad <= MAX_ONEHOT_U:
            return group, u_pad
        nxt = group // 2
        # the kernel block-slices the table by tile group: groups must stay
        # whole multiples of the tile AND divide the chunk (a 1536-block
        # chunk with tb=256 may halve 1536->768 but not 768->384)
        if nxt < tb or nxt % tb or cb % nxt:
            return cb, None
        group = nxt


def _fd_basic_chunk(spectra, hist, fed, nearest, *, config, num_blocks, backend):
    """Nearest-HRTF FD path: no interpolation/distance/crossfade
    (reference: Jefferson/src/CPUSoundSource.cpp:113-142)."""
    full = jnp.concatenate([hist, fed])
    new_hist = full[num_blocks * config.frames_per_buffer :]
    if backend == "fft":
        x_spec = fft_ops.rfft(_segments(full, num_blocks, config), config.pad_len)
        g = spectra[nearest]  # (B, 2, bins)
        y = fft_ops.irfft(x_spec[:, None, :] * g, config.pad_len)[..., config.history_len :]
        return jnp.transpose(y, (0, 2, 1)), new_hist
    hr, hi = spectra
    xr, xi = _forward_split(full, num_blocks, config)
    qs = []
    for ch in (0, 1):
        gr = jnp.take(hr[:, ch, :], nearest, axis=0)
        gi = jnp.take(hi[:, ch, :], nearest, axis=0)
        qs.append(cmul(xr, xi, gr, gi))
    y = fft_ops.irfft_tail_split(
        jnp.stack([q[0] for q in qs]),
        jnp.stack([q[1] for q in qs]),
        config.pad_len,
        config.frames_per_buffer,
    )
    return jnp.transpose(y, (1, 2, 0)), new_hist


def _td_chunk(hrirs, hist, fed, nearest, *, config, num_blocks):
    """Time-domain path: per-block convolution with the nearest HRIR pair via
    a batched grouped convolution (the MXU-native analogue of the reference's
    naive kernel, reference: Jefferson/src/kernels.cu:139-148).

    The output is scaled by the source gain clamped at 1 — the reference's
    GPU TD semantics (`value * gain`, kernels.cu:146, gain clamp
    GPUSoundSource.cu:418-419).  Its CPU TD path hardcodes gain = 1
    (CPUSoundSource.cpp:74), a CPU/GPU divergence in the reference itself;
    this engine is the GPU analogue, and the oracle takes td_gain to match
    either side (PARITY.md defect list)."""
    fpb = config.frames_per_buffer
    taps = config.hrtf_len
    full = jnp.concatenate([hist, fed])
    starts = jnp.arange(num_blocks) * fpb
    # window needed per block: taps-1 history + fpb new samples
    idx = starts[:, None] + (config.history_len - (taps - 1)) + jnp.arange(taps - 1 + fpb)
    segs = full[idx]  # (B, taps-1+fpb)
    h = hrirs[nearest][:, :, :taps]  # (B, 2, taps)
    y = _td_direct(segs, h, fpb, taps)
    gain = min(config.source_gain, 1.0)
    if gain != 1.0:
        y = y * jnp.float32(gain)
    return jnp.transpose(y, (0, 2, 1)), full[num_blocks * fpb :]


def _td_direct(segs: jax.Array, h: jax.Array, fpb: int, taps: int) -> jax.Array:
    """Per-block TD convolution as one einsum over sliding windows.

    segs: (B, taps-1+fpb); h: (B, 2, taps) -> (B, 2, fpb).
    The window matrix is (B, fpb, taps) with win[b, n, k] = segs[b, n+taps-1-k],
    so y = einsum('bnk,bck->bcn', win, h) — a batched matmul on the MXU.
    """
    n_idx = jnp.arange(fpb)[:, None]
    k_idx = jnp.arange(taps)[None, :]
    win = segs[:, n_idx + (taps - 1) - k_idx]  # (B, fpb, taps)
    return jnp.einsum(
        "bnk,bck->bcn", win, h, precision=jax.lax.Precision.HIGHEST
    )


class _StrikeMixin:
    """Per-geometry fused-variant strike accounting — ONE implementation
    shared by Renderer and BatchRenderer (the semantics must not diverge;
    instances provide ``self._fused_strikes`` in __init__)."""

    _fused_strikes: dict

    def _variant_ok(self, variant: tuple) -> bool:
        return self._fused_strikes.get(variant, 0) < _MAX_FUSED_STRIKES

    def _variant_result(self, variant: tuple, ok: bool) -> int:
        """Record a fused-variant outcome; returns the new strike count."""
        if ok:
            self._fused_strikes.pop(variant, None)
            return 0
        n = self._fused_strikes.get(variant, 0) + 1
        self._fused_strikes[variant] = n
        return n


class Renderer(_StrikeMixin):
    """Offline file-to-file renderer (the reference's DEBUGMODE-3 manual
    callback mode made primary, reference: Jefferson/src/main.cu:149-154).

    Usage::

        r = Renderer(db)
        out = r.render(signal, positions)          # (B*128, 2) float32
    """

    def __init__(
        self,
        db: HRTFDatabase,
        config: EngineConfig | None = None,
        chunk_blocks: int = 2048,
        backend: str = "matmul",
        dedup: bool = True,
        fused: bool | None = None,
        mesh=None,
        lane512: bool | None = None,
        fwd512: bool | None = None,
        tail_tree: bool | None = None,
        sparse_xfade: bool = True,
        pipeline_fetch: bool = False,
    ):
        """``dedup``: blend only unique (index, weight) rows per chunk and
        broadcast (bit-identical; auto-disabled when a chunk has too many
        unique positions for it to pay). matmul backend only.
        ``fused``: use the Pallas fused apply kernel for moving-source
        chunks (None = auto: on when a TPU backend is attached).
        ``mesh``: optional 1-D jax Mesh — one render's TIME-BLOCK axis is
        sharded across it ('sp'-style: offline blocks are independent given
        the input stream, so GSPMD partitions the chunk pipeline and
        inserts the sliding-window halo collectives itself; SURVEY §2's
        parallelism map names this the natural single-source extension).
        Mesh renders run the XLA chunk path: a Pallas custom call is not
        GSPMD-partitionable, so fused kernels are single-device-only (the
        multi-source BatchRenderer shard_maps them over SOURCES instead).
        ``pipeline_fetch``: overlap the chunk loop — dispatch chunk i+1
        (device work is queued asynchronously) BEFORE fetching chunk i's
        output, so compute and device->host transfer overlap.  Designed for
        direct-attached TPUs where a ~33 MB chunk fetch is comparable to
        its compute (~2 ms each -> up to ~2x on offline renders); through
        this environment's host relay the render is transfer-bound either
        way, so the win is unmeasurable here and the default stays off
        (ROADMAP: output-fetch pipelining).  Strike semantics are
        preserved: a deferred run-stage failure is detected at the fetch,
        strike-counted against the arm that produced it, and BOTH affected
        chunks (the failed one and its already-dispatched successor, whose
        input history came from the failed program) are re-rendered via
        the always-available XLA chunk program from the saved pre-chunk
        history — bit-equal output ordering either mode."""
        self.db = db
        self.config = config or db.config
        if chunk_blocks < 1:
            # catch library callers up front — a zero/negative chunk size
            # otherwise fails deep in the chunk loop on the first render
            raise ValueError(f"chunk_blocks ({chunk_blocks}) must be positive")
        self.chunk_blocks = chunk_blocks
        self.backend = backend
        self.mesh = mesh
        # lane-aligned 512-bin kernel layout (None = module defaults,
        # pallas.fused_step.LANE512_DEFAULT / LANE512_GATHER_DEFAULT)
        self.lane512 = lane512
        self.fwd512 = fwd512  # truncated-base forward (one-hot forms)
        self.tail_tree = tail_tree  # pairwise-tree tail-IDFT contraction
        # sparse-crossfade side-pass (round 5): False forces the classic
        # crossfade programs (A/Bs; scripts/bench_noxfade.py)
        self.sparse_xfade = sparse_xfade
        self.pipeline_fetch = pipeline_fetch
        if mesh is not None:
            if len(mesh.axis_names) != 1:
                raise ValueError("Renderer mesh must be 1-D (block axis)")
            if chunk_blocks % mesh.size:
                raise ValueError(
                    f"chunk_blocks ({chunk_blocks}) must divide evenly over "
                    f"the {mesh.size}-device mesh"
                )
            fused = False
        self.dedup = dedup and backend != "fft"
        if fused is None:
            fused = fused_supported()
        self.fused = fused and backend != "fft"
        if backend == "fft":
            self._spectra = jnp.asarray(db.spectra)
        else:
            self._spectra = (
                jnp.asarray(np.real(db.spectra).astype(np.float32)),
                jnp.asarray(np.imag(db.spectra).astype(np.float32)),
            )
        self._hrirs = jnp.asarray(db.hrirs)
        cfg = self.config

        def jit_chunk(fn, **kw):
            return jax.jit(functools.partial(fn, **kw))

        self._fd_complex = {}
        self._fd_dedup = {}
        self._fd_basic = {}
        self._td = {}
        self._mk_fd_complex = lambda nb, xf: jit_chunk(
            _fd_complex_chunk, config=cfg, num_blocks=nb, backend=self.backend, with_xfade=xf
        )
        self._mk_fd_dedup = lambda nb, xf: jit_chunk(
            _fd_complex_chunk_dedup, config=cfg, num_blocks=nb, with_xfade=xf
        )
        self._fd_fused = {}
        self._mk_fd_fused = lambda nb, tb, nd=None, xf=True: jit_chunk(
            _fd_complex_chunk_fused, config=cfg, num_blocks=nb, tb=tb,
            n_dist=nd, lane512=self.lane512, tail_tree=self.tail_tree,
            with_xfade=xf,
        )
        self._fd_dedup_fused = {}
        self._mk_fd_dedup_fused = lambda nb, tb, nd=None, xf=True, ncf=None: jit_chunk(
            _fd_complex_chunk_dedup_fused, config=cfg, num_blocks=nb, tb=tb,
            n_dist=nd, lane512=self.lane512, tail_tree=self.tail_tree,
            with_xfade=xf, n_cf=ncf,
        )
        self._fd_onehot = {}
        self._mk_fd_onehot = lambda nb, tb, nd=None: jit_chunk(
            _fd_complex_chunk_onehot, config=cfg, num_blocks=nb, tb=tb,
            n_dist=nd, lane512=self.lane512, fwd512=self.fwd512,
            tail_tree=self.tail_tree,
        )
        self._fd_onehot_grp = {}
        self._mk_fd_onehot_grp = lambda nb, tb, gt, up, nd=None: jit_chunk(
            _fd_complex_chunk_onehot_grouped, config=cfg, num_blocks=nb,
            tb=tb, group_tiles=gt, u_pad=up, n_dist=nd,
            lane512=self.lane512, fwd512=self.fwd512,
            tail_tree=self.tail_tree,
        )
        # consecutive cross-render failure counts per fused variant; a
        # variant at _MAX_FUSED_STRIKES stops being attempted (see
        # _warn_fused_fallback); any success resets its count
        self._fused_strikes: dict[tuple, int] = {}
        self._mk_fd_basic = lambda nb: jit_chunk(
            _fd_basic_chunk, config=cfg, num_blocks=nb, backend=self.backend
        )
        self._mk_td = lambda nb: jit_chunk(_td_chunk, config=cfg, num_blocks=nb)

    # --- public API -------------------------------------------------------
    def render(
        self,
        signal: np.ndarray,
        positions: Sequence | np.ndarray,
        ptype: ProcessType = ProcessType.TPU_FD_COMPLEX,
        initial_old: tuple[float, float] | None = (0.0, 0.0),
    ) -> np.ndarray:
        """Render mono ``signal`` along per-block ``positions`` -> (B*fpb, 2)."""
        plan = make_plan(np.asarray(positions), self.config, initial_old)
        return self.render_plan(signal, plan, ptype)

    def render_plan(
        self, signal: np.ndarray, plan: RenderPlan, ptype: ProcessType = ProcessType.TPU_FD_COMPLEX
    ) -> np.ndarray:
        """Render a prepared plan chunk by chunk.

        FD_COMPLEX dispatch, in measured-preference order (PERF.md):
          1. dedup (+fused kernel) — positions repeat across blocks; the
             deduped blend is nearly free (reference benchmark workload)
          2. one-hot fused kernel — movers whose unique-filter set fits
             VMEM (zero filter gathers)
          3. gather-blend fused kernel — movers with wide filter sets
          4. plain XLA chunk — CPU backends, fft backend, non-TPU, or any
             fused-compile failure (graceful fallback)
        All paths are oracle-gated at the reference's 2e-7 tolerance.
        """
        cfg = self.config
        if ptype in (ProcessType.TPU_FD_COMPLEX, ProcessType.CPU_FD_COMPLEX) and plan.num_blocks > 1:
            # the chunk kernel derives the old filter set from the previous
            # block's new set (one extended blend); make_plan guarantees this
            if not (
                np.array_equal(plan.idx_old[1:], plan.idx_new[:-1])
                and np.array_equal(plan.w_old[1:], plan.w_new[:-1])
            ):
                raise ValueError(
                    "RenderPlan old-position arrays must equal the previous "
                    "block's new arrays (build plans with make_plan)"
                )
        fpb = cfg.frames_per_buffer
        b_total = plan.num_blocks
        cb = min(self.chunk_blocks, b_total) if b_total else self.chunk_blocks
        if self.mesh is not None and cb % self.mesh.size:
            # short renders (b_total < chunk_blocks) must keep the chunk a
            # mesh multiple, or dev()'s divisibility guard silently drops
            # every per-block operand to P() replication and the N-chip
            # sharding is lost; pad up — the constructor guarantees
            # chunk_blocks itself is a mesh multiple, so this never exceeds
            # it, and the padded tail is trimmed like any partial chunk
            cb += self.mesh.size - cb % self.mesh.size
        fed_all = fed_stream(signal, b_total, cfg)
        # block-axis mesh: shard every per-block (and per-sample) chunk
        # argument over the mesh; replicate the small broadcast arrays.
        # Chunks are always padded to cb (divisible by the mesh), so shards
        # stay even; GSPMD inserts the DFT window halo exchange.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, blk_ax = self.mesh, self.mesh.axis_names[0]

            def dev(a, shard=True):
                a = jnp.asarray(a)
                spec = (
                    P(blk_ax, *([None] * (a.ndim - 1)))
                    if shard and a.ndim >= 1 and a.shape[0] % mesh.size == 0
                    else P()
                )
                return jax.device_put(a, NamedSharding(mesh, spec))
        else:
            def dev(a, shard=True):
                return jnp.asarray(a)
        hist = dev(np.zeros(cfg.history_len, dtype=np.float32), shard=False)
        out = np.empty((b_total * fpb, 2), dtype=np.float32)
        # program-count discipline: fixed chunk size (last partial chunk
        # padded and trimmed) and AT MOST TWO xfade variants per path —
        # chunks with no crossfading block use the no-crossfade programs
        # (round 5: half the tail-IDFT MACs; hold renders spend all but
        # chunk 0 there), all others share one crossfade program.  XLA
        # compiles are expensive, especially via remote TPU compile services.
        with_xfade = bool(plan.xfade.any())
        # fused-kernel variants disabled for THE REST OF THIS RENDER after a
        # compile/runtime-stack failure (each remote compile retry costs
        # 20 s - 5 min); a fresh render retries them.  Program bugs propagate
        # (_is_fused_fallback_error).
        fused_off: set[str] = set()
        # compact distance (bit-identical; see dedup_distance): few-unique-
        # triple renders pass the (8,) triple arrays + a per-block selector
        # to the ONE-HOT kernels — a per-render static property (n_dist
        # joins their program cache keys).  The gather-form kernels
        # (_kernel: gather-fused, dedup+fused) keep per-row ramps: a
        # same-session A/B on the reference workload measured the compact
        # form 0.92x THERE (scripts/bench_dedup.py) while the one-hot
        # forms gain 1.15x (PERF.md) — dispatch follows the measurements.
        dist = dedup_distance(plan.u_hi, plan.u_lo, plan.inv_frac)
        nd = None if dist is None else dist[4]

        def pad(a, nb):
            if nb == cb:
                return dev(a)
            return dev(np.concatenate([a, np.repeat(a[-1:], cb - nb, axis=0)]))

        if dist is not None:
            _duh = dev(dist[0], shard=False)
            _dul = dev(dist[1], shard=False)
            _ddf = dev(dist[2], shard=False)
            _dsel_all = dist[3]

            def dist_args(sl_, nb_):
                """(u_hi, u_lo, inv_frac, dsel) operands for a fused call."""
                return (_duh, _dul, _ddf, pad(_dsel_all[sl_], nb_))
        else:
            def dist_args(sl_, nb_):
                return (
                    pad(plan.u_hi[sl_], nb_),
                    pad(plan.u_lo[sl_], nb_),
                    pad(plan.inv_frac[sl_], nb_),
                )

        # static-segment dedup: one pass over the chunks to find the unique
        # blend rows per chunk; one Upad bucket per render (single compiled
        # program).  Pays when positions persist across blocks (the common
        # case); falls back to the direct path for every-block movers.
        dedup_chunks = None
        if (
            self.dedup
            and ptype in (ProcessType.TPU_FD_COMPLEX, ProcessType.CPU_FD_COMPLEX)
            and b_total
        ):
            from .plan import dedup_rows

            dedup_chunks, max_u = [], 1
            for start in range(0, b_total, cb):
                stop = min(start + cb, b_total)
                sl = slice(start, stop)
                # always the extended (cb+1) rows: [old_start, new_0..new_cb-1]
                # serves BOTH chunk variants — [:cb] is the old-aligned set,
                # [1:] the new set (old[b] == new[b-1] by plan construction)
                ext_idx = np.concatenate([plan.idx_old[start : start + 1], plan.idx_new[sl]])
                ext_w = np.concatenate([plan.w_old[start : start + 1], plan.w_new[sl]])
                rows = cb + 1
                if ext_idx.shape[0] < rows:  # final partial chunk
                    reps = rows - ext_idx.shape[0]
                    ext_idx = np.concatenate([ext_idx, np.repeat(ext_idx[-1:], reps, axis=0)])
                    ext_w = np.concatenate([ext_w, np.repeat(ext_w[-1:], reps, axis=0)])
                uniq_idx, uniq_w, inv = dedup_rows(ext_idx, ext_w)
                max_u = max(max_u, uniq_idx.shape[0])
                dedup_chunks.append((uniq_idx, uniq_w, inv))
            u_pad = max(8, 1 << int(np.ceil(np.log2(max_u))))
            if u_pad * 2 > cb:  # not enough duplication to pay off
                dedup_chunks = None

        # sparse-crossfade planning (round 5): when every chunk's crossfade
        # count fits a small static bucket (reference cadence: 1-2 per 256
        # blocks), ONE no-crossfade-kernel + XLA-side-pass program covers
        # every chunk of the render — crossfading or not (masked ids) —
        # instead of paying double tails on 99% of rows.  Render-wide max
        # so the whole render compiles one program.
        sparse_ncf = None
        if (
            dedup_chunks is not None
            and self.fused
            and self.sparse_xfade
            and cfg.history_len % fpb == 0
            and b_total
        ):
            max_ncf = max(
                int(plan.xfade[start : min(start + cb, b_total)].sum())
                for start in range(0, b_total, cb)
            )
            sparse_ncf = _sparse_bucket(max_ncf, cb)

        # per-chunk crossfade flags under the shared amortization guard
        # (_apply_xfade_amortization)
        chunk_xfs = _apply_xfade_amortization([
            bool(plan.xfade[start : min(start + cb, b_total)].any())
            for start in range(0, b_total, cb)
        ])

        # ---- pipelined output fetch (opt-in; see __init__ docstring) ----
        # One chunk deep: after dispatching chunk i+1 (async), fetch chunk
        # i's output.  `pending` carries everything needed to commit the
        # deferred chunk — or, on a deferred run-stage failure, to strike
        # the producing arm and re-render from `hist_before` via the XLA
        # chunk program (the ladder's always-available final arm).
        pipelined = bool(self.pipeline_fetch)
        pending: list | None = None  # [start, stop, nb, y, vkey, cache, ckey, tag, name, hist_before]

        def _xla_redo(start_, stop_, hist_in):
            """Re-render one chunk from a clean history via the plain XLA
            chunk program (deferred-failure redo; honors the chunk's
            crossfade variant like the ladder's final arm)."""
            nb_ = stop_ - start_
            sl_ = slice(start_, stop_)
            fed_np_ = fed_all[start_ * fpb : stop_ * fpb]
            if nb_ < cb:
                fed_np_ = np.concatenate(
                    [fed_np_, np.zeros((cb - nb_) * fpb, np.float32)]
                )
            cxf_ = chunk_xfs[start_ // cb] if chunk_xfs else True
            key_ = (cb, cxf_)
            if key_ not in self._fd_complex:
                self._fd_complex[key_] = self._mk_fd_complex(cb, cxf_)
            y_, hist_ = self._fd_complex[key_](
                self._spectra,
                hist_in,
                dev(fed_np_),
                pad(plan.idx_new[sl_], nb_),
                pad(plan.w_new[sl_], nb_),
                pad(plan.idx_old[sl_], nb_),
                pad(plan.w_old[sl_], nb_),
                pad(plan.xfade[sl_], nb_),
                pad(plan.u_hi[sl_], nb_),
                pad(plan.u_lo[sl_], nb_),
                pad(plan.inv_frac[sl_], nb_),
            )
            return np.asarray(y_).reshape(cb * fpb, 2)[: nb_ * fpb], hist_

        def _flush_pending():
            """Fetch the deferred chunk's output.  Returns None on success,
            or — when the deferred fetch surfaced a fallback-class run-stage
            failure — the clean post-redo history the CURRENT chunk must be
            re-dispatched from (its input history came from the failed
            program).  Non-fallback errors and failures of the non-striking
            arms (vkey None) propagate, exactly as they would have at the
            synchronous materialization point."""
            nonlocal pending
            if pending is None:
                return None
            (pstart, pstop, pnb, py, pvkey, pcache, pckey, ptag, pname,
             phist) = pending
            pending = None
            try:
                y_np_ = np.asarray(py).reshape(cb * fpb, 2)[: pnb * fpb]
            except Exception as e:
                if pvkey is None or not _is_fused_fallback_error(e):
                    raise
                fused_off.add(ptag)
                if pcache is not None:
                    pcache.pop(pckey, None)
                _warn_fused_fallback(
                    e, pname, "the XLA path (deferred-fetch redo)",
                    strikes=self._variant_result(pvkey, False),
                )
                y_np_, hist_ = _xla_redo(pstart, pstop, phist)
                out[pstart * fpb : pstop * fpb] = y_np_
                return hist_
            out[pstart * fpb : pstop * fpb] = y_np_
            if pvkey is not None:
                self._variant_result(pvkey, True)
            return None

        def _commit(y_, y_np_, hist_f_, vkey=None, cache=None, ckey=None,
                    tag=None, name=None):
            """Success-path commit shared by every dispatch arm; returns the
            history to carry into the next chunk.

            Sync mode: ``y_np_`` was materialized INSIDE the arm's try (a
            run-stage failure falls back with an unpoisoned history and a
            strike) — record success, write out.  Pipelined mode (``y_np_``
            is None): the current dispatch is already queued, so flush the
            PREVIOUS chunk now (this is the overlap) and defer this one;
            if the flush reports a failed predecessor, this chunk's input
            history was poisoned — discard its dispatch and re-render both
            via the XLA redo."""
            nonlocal pending
            if y_np_ is not None:
                if vkey is not None:
                    self._variant_result(vkey, True)
                out[start * fpb : stop * fpb] = y_np_
                return hist_f_
            redo_hist = _flush_pending()
            if redo_hist is not None:
                y_np_, hist_ = _xla_redo(start, stop, redo_hist)
                out[start * fpb : stop * fpb] = y_np_
                return hist_
            pending = [start, stop, nb, y_, vkey, cache, ckey, tag, name,
                       hist]
            return hist_f_

        # render-wide one-hot geometry: one U_pad bucket (single compiled
        # program per render) and per-group tables for wide movers — see
        # plan_onehot_chunking
        onehot_u_pad, onehot_group = None, None
        if (
            self.fused
            and with_xfade
            and dedup_chunks is None
            and b_total
            and cfg.history_len % fpb == 0
            and ptype in (ProcessType.TPU_FD_COMPLEX, ProcessType.CPU_FD_COMPLEX)
        ):
            tb_cb = pick_fused_tile(cb, cb)
            if tb_cb is not None:
                onehot_group, onehot_u_pad = plan_onehot_chunking(
                    plan, b_total, cb, tb_cb
                )

        for start in range(0, b_total, cb):
            stop = min(start + cb, b_total)
            nb = stop - start
            sl = slice(start, stop)
            fed_np = fed_all[start * fpb : stop * fpb]
            if nb < cb:
                fed_np = np.concatenate([fed_np, np.zeros((cb - nb) * fpb, np.float32)])
            fed = dev(fed_np)
            # per-chunk crossfade flag (round 5): crossfade-free chunks of a
            # crossfading render (hold workloads crossfade only at block 0)
            # dispatch to the no-crossfade program variants — half the
            # tail-IDFT MACs and no old-side blend rows, bit-identical on
            # such chunks.  At most TWO programs per render per path (see
            # the amortization guard above).
            cxf = chunk_xfs[start // cb] if chunk_xfs else True
            if ptype in (ProcessType.TPU_FD_COMPLEX, ProcessType.CPU_FD_COMPLEX):
                # movers path: one-hot compact-table kernel (zero filter
                # gathers) — needs aligned geometry, the crossfade form, and
                # a unique-filter set that fits VMEM.  When positions repeat
                # (dedup applies) the dedup+fused path below is FASTER
                # (measured 1.04 vs 1.42 ms on the reference workload: the
                # deduped blend is nearly free while one-hot pays two MXU
                # blend matmuls per tile), so dedup takes precedence.
                tb_o = (
                    pick_fused_tile(cb, cb)
                    if onehot_u_pad is not None and "onehot" not in fused_off
                    else None
                )
                if tb_o is not None:
                    # strike keys carry the program geometry so failures of
                    # one shape don't get reset by successes of another
                    # (incl. nd: the compact-distance program and the per-row
                    # nd=None program of the same geometry are distinct
                    # compiles and must accumulate strikes independently)
                    okey = ("onehot", cb, tb_o, onehot_group, onehot_u_pad, nd)
                    if not self._variant_ok(okey):
                        tb_o = None
                if tb_o is not None:
                    last_i = plan.idx_new[stop - 1 : stop]
                    last_w = plan.w_new[stop - 1 : stop]
                    io_np = plan.idx_old[sl]
                    wo_np = plan.w_old[sl]
                    if nb < cb:  # pad with the last NEW row (roll semantics)
                        io_np = np.concatenate([io_np, np.repeat(last_i, cb - nb, 0)])
                        wo_np = np.concatenate([wo_np, np.repeat(last_w, cb - nb, 0)])
                    tail_args = (
                        pad(plan.xfade[sl], nb),
                        *dist_args(sl, nb),
                    )
                if tb_o is not None and onehot_group < cb:
                    # wide mover: per-group compact tables, one dispatch
                    from .plan import compact_filter_ids_grouped

                    uniq_ids, ridx, rbnd = compact_filter_ids_grouped(
                        io_np, last_i, onehot_group, tb_o, onehot_u_pad
                    )
                    wbnd = np.concatenate([wo_np[tb_o::tb_o], last_w])
                    key = (cb, tb_o, onehot_group, onehot_u_pad, nd)
                    if key not in self._fd_onehot_grp:
                        self._fd_onehot_grp[key] = self._mk_fd_onehot_grp(
                            cb, tb_o, onehot_group // tb_o, onehot_u_pad, nd
                        )
                    try:
                        y, hist_f = self._fd_onehot_grp[key](
                            self._spectra,
                            hist,
                            fed,
                            jnp.asarray(uniq_ids),
                            jnp.asarray(ridx),
                            jnp.asarray(wo_np),
                            jnp.asarray(rbnd),
                            jnp.asarray(wbnd),
                            *tail_args,
                        )
                        # materialize BEFORE recording success or
                        # rebinding hist: dispatch is async, and a run-stage
                        # failure surfacing at asarray must leave hist
                        # unpoisoned for the fallback and count as a strike.
                        # Pipelined mode defers the fetch to _commit in the
                        # else clause — OUTSIDE this try, so a deferred
                        # predecessor failure surfacing there is redone,
                        # never misattributed to this arm's strike key.
                        y_np = (
                            None if pipelined
                            else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb]
                        )
                    except Exception as e:
                        if not _is_fused_fallback_error(e):
                            raise
                        fused_off.add("onehot")
                        self._fd_onehot_grp.pop(key, None)
                        _warn_fused_fallback(
                            e, "grouped one-hot", "the gather/XLA path",
                            strikes=self._variant_result(okey, False),
                        )
                    else:
                        hist = _commit(y, y_np, hist_f, okey,
                                       self._fd_onehot_grp, key,
                                       "onehot", "grouped one-hot")
                        continue
                elif tb_o is not None:
                    from .plan import compact_filter_ids

                    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(
                        io_np, last_i, u_pad=onehot_u_pad
                    )
                    key = (cb, tb_o, nd)
                    if key not in self._fd_onehot:
                        self._fd_onehot[key] = self._mk_fd_onehot(cb, tb_o, nd)
                    try:
                        y, hist_f = self._fd_onehot[key](
                            self._spectra,
                            hist,
                            fed,
                            jnp.asarray(uniq_ids),
                            jnp.asarray(ridx),
                            jnp.asarray(wo_np),
                            jnp.asarray(ridx_last),
                            jnp.asarray(last_w),
                            *tail_args,
                        )
                        # materialize BEFORE recording success or
                        # rebinding hist (pipelined: deferred to _commit in
                        # the else clause, outside this try — see the
                        # grouped arm above)
                        y_np = (
                            None if pipelined
                            else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb]
                        )
                    except Exception as e:
                        if not _is_fused_fallback_error(e):
                            raise
                        fused_off.add("onehot")
                        self._fd_onehot.pop(key, None)
                        _warn_fused_fallback(
                            e, "one-hot", "the gather/XLA path",
                            strikes=self._variant_result(okey, False),
                        )
                    else:
                        hist = _commit(y, y_np, hist_f, okey,
                                       self._fd_onehot, key,
                                       "onehot", "one-hot")
                        continue
                if (
                    dedup_chunks is None and "gather" not in fused_off
                    and self.fused
                ):
                    gxf = cxf
                    tb_f = pick_fused_tile(cb, cb)
                    gkey = ("gather", cb, tb_f, gxf)
                    if tb_f is not None and not self._variant_ok(gkey):
                        tb_f = None
                else:
                    tb_f = None
                if tb_f is not None:
                    # old-aligned rows; the padded region's first row must be
                    # the final real block's NEW row (the kernel's roll reads
                    # old[nb] as block nb-1's new filter).  The no-crossfade
                    # program takes the NEW rows directly (same values by
                    # plan construction).
                    last_i = plan.idx_new[stop - 1 : stop]
                    last_w = plan.w_new[stop - 1 : stop]

                    def pad_next(a, nxt):
                        if nb == cb:
                            return jnp.asarray(a)
                        return jnp.asarray(
                            np.concatenate([a, np.repeat(nxt, cb - nb, axis=0)])
                        )

                    key = (cb, tb_f, gxf)
                    if key not in self._fd_fused:
                        self._fd_fused[key] = self._mk_fd_fused(cb, tb_f, xf=gxf)
                    rows_i = plan.idx_old[sl] if gxf else plan.idx_new[sl]
                    rows_w = plan.w_old[sl] if gxf else plan.w_new[sl]
                    try:
                        y, hist_f = self._fd_fused[key](
                            self._spectra,
                            hist,
                            fed,
                            pad_next(rows_i, last_i),
                            pad_next(rows_w, last_w),
                            jnp.asarray(last_i),
                            jnp.asarray(last_w),
                            pad(plan.xfade[sl], nb),
                            pad(plan.u_hi[sl], nb),
                            pad(plan.u_lo[sl], nb),
                            pad(plan.inv_frac[sl], nb),
                        )
                        # materialize BEFORE recording success or
                        # rebinding hist (pipelined: deferred to _commit in
                        # the else clause, outside this try — see the
                        # grouped arm above)
                        y_np = (
                            None if pipelined
                            else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb]
                        )
                    except Exception as e:
                        if not _is_fused_fallback_error(e):
                            raise
                        fused_off.add("gather")
                        self._fd_fused.pop(key, None)
                        _warn_fused_fallback(
                            e, "gather-blend", "the XLA path",
                            strikes=self._variant_result(gkey, False),
                        )
                        # fall through to the XLA dispatch for this chunk
                    else:
                        hist = _commit(y, y_np, hist_f, gkey,
                                       self._fd_fused, key,
                                       "gather", "gather-blend")
                        continue
                if dedup_chunks is not None:
                    uniq_idx, uniq_w, inv = dedup_chunks[start // cb]
                    if uniq_idx.shape[0] < u_pad:  # pad to the render's bucket
                        reps = u_pad - uniq_idx.shape[0]
                        uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], reps, axis=0)])
                        uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], reps, axis=0)])
                    # crossfade-free chunks run the no-crossfade program;
                    # a render whose crossfades are SPARSE (sparse_ncf set)
                    # runs the no-crossfade kernel everywhere with an XLA
                    # side-pass fixing the few crossfading rows — one
                    # program for the whole render
                    dxf = cxf and sparse_ncf is None
                    tb_df = (
                        pick_fused_tile(cb, cb)
                        if self.fused and "dedup" not in fused_off
                        else None
                    )
                    if tb_df is not None:
                        dkey = ("dedup", cb, u_pad, tb_df, dxf, sparse_ncf)
                        if not self._variant_ok(dkey):
                            tb_df = None
                    if tb_df is not None:  # dedup + fused composition
                        key = (cb, u_pad, tb_df, dxf, sparse_ncf)
                        if key not in self._fd_dedup_fused:
                            self._fd_dedup_fused[key] = self._mk_fd_dedup_fused(
                                cb, tb_df, xf=dxf, ncf=sparse_ncf
                            )
                        if sparse_ncf is not None:
                            cfi = _pad_cf_indices(plan.xfade[sl], sparse_ncf)
                            cf_args = (
                                jnp.asarray(cfi.astype(np.int32)),
                                jnp.asarray(inv[:cb][cfi]),
                            )
                        else:
                            cf_args = ()
                        try:
                            y, hist_f = self._fd_dedup_fused[key](
                                self._spectra,
                                hist,
                                fed,
                                jnp.asarray(uniq_idx),
                                jnp.asarray(uniq_w),
                                # old-aligned rows for the crossfade program,
                                # the NEW rows for the no-crossfade one
                                jnp.asarray(inv[:cb] if dxf else inv[1 : cb + 1]),
                                jnp.asarray(inv[cb : cb + 1]),
                                pad(plan.xfade[sl], nb),
                                pad(plan.u_hi[sl], nb),
                                pad(plan.u_lo[sl], nb),
                                pad(plan.inv_frac[sl], nb),
                                None,
                                *cf_args,
                            )
                            # materialize before success/hist commit
                            # (async run-stage failure must fall back clean;
                            # pipelined: deferred to _commit in the else
                            # clause, outside this try)
                            y_np = (
                                None if pipelined
                                else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb]
                            )
                        except Exception as e:
                            if not _is_fused_fallback_error(e):
                                raise
                            fused_off.add("dedup")
                            self._fd_dedup_fused.pop(key, None)
                            _warn_fused_fallback(
                                e, "dedup+fused", "the XLA dedup path",
                                strikes=self._variant_result(dkey, False),
                            )
                        else:
                            hist = _commit(y, y_np, hist_f, dkey,
                                           self._fd_dedup_fused, key,
                                           "dedup", "dedup+fused")
                            continue
                    key = (cb, cxf, u_pad)
                    if key not in self._fd_dedup:
                        self._fd_dedup[key] = self._mk_fd_dedup(cb, cxf)
                    y, hist_f = self._fd_dedup[key](
                        self._spectra,
                        hist,
                        fed,
                        dev(uniq_idx, shard=False),
                        dev(uniq_w, shard=False),
                        # extended rows for the crossfade program, the NEW
                        # rows ([1:]) for the no-crossfade one
                        dev(inv if cxf else inv[1:], shard=False),
                        pad(plan.xfade[sl], nb),
                        pad(plan.u_hi[sl], nb),
                        pad(plan.u_lo[sl], nb),
                        pad(plan.inv_frac[sl], nb),
                    )
                    hist = _commit(
                        y,
                        None if pipelined
                        else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb],
                        hist_f,
                    )
                    continue
                key = (cb, cxf)
                if key not in self._fd_complex:
                    self._fd_complex[key] = self._mk_fd_complex(cb, cxf)
                y, hist_f = self._fd_complex[key](
                    self._spectra,
                    hist,
                    fed,
                    pad(plan.idx_new[sl], nb),
                    pad(plan.w_new[sl], nb),
                    pad(plan.idx_old[sl], nb),
                    pad(plan.w_old[sl], nb),
                    pad(plan.xfade[sl], nb),
                    pad(plan.u_hi[sl], nb),
                    pad(plan.u_lo[sl], nb),
                    pad(plan.inv_frac[sl], nb),
                )
            elif ptype in (ProcessType.TPU_FD_BASIC, ProcessType.CPU_FD_BASIC):
                if cb not in self._fd_basic:
                    self._fd_basic[cb] = self._mk_fd_basic(cb)
                y, hist_f = self._fd_basic[cb](
                    self._spectra, hist, fed, pad(plan.nearest[sl], nb)
                )
            else:
                if cb not in self._td:
                    self._td[cb] = self._mk_td(cb)
                y, hist_f = self._td[cb](self._hrirs, hist, fed, pad(plan.nearest[sl], nb))
            hist = _commit(
                y,
                None if pipelined
                else np.asarray(y).reshape(cb * fpb, 2)[: nb * fpb],
                hist_f,
            )
        # drain the deferred final chunk (pipelined mode); a failure here
        # was redone inside the flush and has no dispatched successor, so
        # the returned redo history is moot
        _flush_pending()
        return out
