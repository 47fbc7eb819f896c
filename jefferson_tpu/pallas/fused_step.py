"""Fully-fused batched step kernel: forward DFT + apply + IDFT + crossfade.

Extends pallas/fused_apply.py by moving the sliding sub-block forward DFT
(ops/fft.rfft_sliding_split_batched) and the distance complex-multiply into
the kernel, so the forward planes xr/xi and the distance-premultiplied xd
are never materialized to HBM (~270 MB/step of traffic at the bench shape).

Batched form only (seg == nb, tile = G whole sources): each source's
sub-block DFT rows live contiguously, so tiles never overlap — the halo
problem of per-block tiling does not arise.  Per tile the kernel

  * computes all sub-block DFTs with one MXU matmul pair
    (G*(nb+q-1+pad), 128) @ (128, bins),
  * twiddle-accumulates the sliding windows per source (pltpu.roll over
    sub-block rows — identical op order to the XLA formulation),
  * computes the distance factors in-kernel from the per-block phase-split
    scalars and multiplies (bit-identical to the former XLA stage, below),
  * then proceeds exactly like fused_apply: blend-row roll/patch for the
    new filters, complex multiplies, tail-IDFT matmuls, crossfade
    select-weights.

The distance factors moved IN-KERNEL in round 3: measured on chip, Mosaic's
cos/sin lower to the SAME hardware transcendental as XLA's (max diff 0.0
over the full radius range, /root/repo round-3 session) — so computing the
phase ramp from the three per-block scalars (u_hi, u_lo, inv_frac) inside
the kernel is bit-identical to the former XLA stage while eliminating its
serialization and the 2x(B, bins) HBM round trip.
"""

from __future__ import annotations

import functools
import warnings

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import fft as fft_ops


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel_bases(pad_len: int, fpb: int, bins: int, q: int,
                  lane512: bool, fwd512: bool):
    """Shared wrapper-side constants: sub-block DFT bases, q-padded sliding
    twiddles, tail-IDFT bases — the fwd512 truncation applied in ONE place
    (the five kernel wrappers previously copy-pasted this block)."""
    cfr, cfi = fft_ops._subblock_dft_matrices(pad_len, fpb)
    twr, twi = fft_ops._sliding_twiddles(pad_len, fpb)
    if fwd512:
        assert lane512, "fwd512 requires lane512"
        b1 = bins - 1
        cfr, cfi, twr, twi = cfr[:, :b1], cfi[:, :b1], twr[:, :b1], twi[:, :b1]
    q_pad = _round_up(q, 8)
    twr = np.pad(twr, ((0, q_pad - q), (0, 0)))
    twi = np.pad(twi, ((0, q_pad - q), (0, 0)))
    icr, ici = fft_ops._idft_tail_matrices(pad_len, fpb)
    return cfr, cfi, twr, twi, icr, ici


def maybe_lane512(table: jax.Array, lane512: bool, bins: int) -> jax.Array:
    """Repack a combined-plane table/blend rows iff lane512 (the renderer/
    batch chunk fns share this one conditional)."""
    return to_lane512(table, bins) if lane512 else table


# Largest compact-table width the one-hot kernel fits in VMEM with its
# double-buffered tiles: U_pad=512 OOMs the 16 MB scoped limit by 13 MB
# (measured); 256 compiles and runs on both variants.
MAX_ONEHOT_U = 256

# Round-5 lane-aligned layout (the PERF.md "bins=513 lane tax" lever): when
# ``lane512`` is on, the combined-plane tables/blend rows carry the four
# 512-bin planes lane-aligned [rL|iL|rR|iR] (offsets 0/512/1024/1536 — all
# multiples of the 128-lane vreg) followed by one 128-lane block holding the
# four Nyquist-bin (k = 512) columns.  Total width 4*512 + 128 = 2176 — the
# SAME physical width the padded 4*513 = 2052 layout already occupied, so
# blend MACs and VMEM footprint are unchanged, but
#   * every plane slice is lane-aligned (no Mosaic lane-rotation relayouts
#     on the 8 q-plane slices per tile), and
#   * the tail-IDFT matmuls contract K = 512 (4 MXU K-tiles) instead of
#     K = 513 padded to 640 (5 tiles) — a 20% MAC cut on the largest
#     matmul family (PERF.md Roofline: tails are 8.6 of 19.6 GMAC).
# The Nyquist bin's tail contribution becomes two VPU rank-1 terms
# (q_nyq_re * icr[512] + q_nyq_im * ici[512]); everything else is the same
# arithmetic on the same values (the forward DFT, twiddle accumulation,
# distance factors, blend and crossfade are column-permutation-identical).
# Numerics: only the tail contraction's association changes (the Nyquist
# product moves from the MXU's 5th K-tile to a VPU fma) — measured on chip
# at 7.45e-9 max|diff| across all three kernel families, and the full
# 7-scenario sweep gate re-run green (PERF.md round-5 section).
# Measured defaults (scripts/bench_lane512.py, same-session A/Bs on chip):
# ONE-HOT forms 1.12x at the 256x64 headline point and 1.68x on the
# grouped wide-mover render -> ON.
LANE512_DEFAULT = True

# Separate default for the GATHER-form paths (_kernel: gather-fused and
# dedup+fused): their blend rows come from XLA row gathers, and the lane512
# layout widens each gathered row 2052 -> 2176 (the Nyquist pad block), a
# ~6% HBM-traffic tax on the stage those paths are bound by — measured
# 0.89x on the scene_hold dedup+fused shape -> OFF.  (Compact distance had
# the same split verdict: 1.15x on one-hot, 0.92x on gather — PERF.md.)
LANE512_GATHER_DEFAULT = False

# fwd512 (round-5 follow-up, one-hot forms, requires lane512): truncated
# (sub, 512) DFT bases + exact VPU Nyquist forward.  Measured DEAD END on
# the production path: 0.466x (1.352 -> 2.901 ms/step at the bench point,
# max|diff| 3.7e-9) — the VPU cross-lane Nyquist reduction + per-source
# (rows_pad, 1) rolls cost more than the 513->640 forward padding they
# remove.  (A raw-wrapper A/B had read 1.256x the other way — only
# production-call-pattern A/Bs decide dispatch; PERF.md round 5.)
# Kept as a measurable flag, default OFF.
FWD512_DEFAULT = False

# tail_tree (round-5 follow-up to the error budget): contract the tail-IDFT
# K dimension as 128-wide lane-aligned chunks summed PAIRWISE instead of one
# sequential dot_general.  The apply-association probe
# (scripts/apply_assoc_probe.py, on chip) showed the whole fused-vs-XLA gate
# delta is the MXU K-accumulation schedule — the VPU products are
# BIT-IDENTICAL between the compilers — and that the chunked tree recovers
# the XLA chain's accuracy inside the kernel (max err vs f64 on realistic
# operands: plain 2.83e-7, tree 1.24e-7, XLA 1.18e-7) at the same MAC
# count.  Default ON everywhere (measured, PERF.md "recovery path, taken"):
# the full-scale worst margin drops 0.894 -> 0.745 (identical max AND
# argmax to the all-XLA chain — the kernel no longer costs ANY headroom),
# and throughput is neutral-to-faster on every dispatch once A/B ordering
# bias is controlled (bench_tail_tree --reverse: one-hot 1.05x/1.22x with
# the tree arm first vs 0.61-1.02x with it second — relay-session drift
# penalizes whichever arm runs later; grouped flips sign across sessions
# at one order, 0.95x/0.95x/1.15x; gather dedup+fused is 1.08x/1.56x
# faster consistently).  One uniform
# numerics contract across every fused form; per-instance
# tail_tree=False restores the plain contraction for A/Bs.
TAIL_TREE_DEFAULT = True


def _stream_subs(stream, b: int, n_tiles: int, tb: int, q: int,
                 fpb: int, rows: int, rows_pad: int):
    """Per-tile sub-block sample rows for the SINGLE-STREAM wrappers: a
    halo gather of each tile's rows (tiles overlap by q-1 sub-blocks),
    padded to the 8-row sublane multiple — one implementation for all
    three stream forms (they previously copy-pasted it)."""
    subs_full = stream.reshape(b + q - 1, fpb)
    idx2 = (jnp.arange(n_tiles) * tb)[:, None] + jnp.arange(rows)[None, :]
    subs_t = subs_full[idx2]
    subs_t = jnp.pad(subs_t, ((0, 0), (0, rows_pad - rows), (0, 0)))
    return subs_t.reshape(n_tiles * rows_pad, fpb)


def _pad_rows8(a):
    """(n, 4) per-tile rows -> (n*8, 4) with 7 zero rows after each (the
    kernels read one boundary/patch row per tile at 8-row stride)."""
    a3 = jnp.pad(a[:, None, :], ((0, 0), (0, 7), (0, 0)))
    return a3.reshape(-1, a.shape[-1])


def _select_distance(uh_ref, ul_ref, f_ref, dsel_ref, n_dist, tb: int, bins: int):
    """Distance planes for a tile: the compact-table selection (n_dist
    unique triples, each row receiving the ramp from ITS exact triple —
    bit-identical to per-row) or the per-row form.  ONE implementation for
    both kernel families: op order here is contract (CLAUDE.md lockstep
    with ops/filters.distance_factors_split)."""
    if n_dist is not None:
        drk, dik = _distance_planes(uh_ref, ul_ref, f_ref, 8, bins)
        sel = dsel_ref[:]
        dr = jnp.broadcast_to(drk[0:1], (tb, bins))
        di = jnp.broadcast_to(dik[0:1], (tb, bins))
        for j in range(1, n_dist):
            m = sel == j
            dr = jnp.where(m, drk[j : j + 1], dr)
            di = jnp.where(m, dik[j : j + 1], di)
        return dr, di
    return _distance_planes(uh_ref, ul_ref, f_ref, tb, bins)


def _xfade_weights(xf_ref, fpb: int):
    """Per-row crossfade ramps (a = old side, b = new side); rows with
    xf <= 0 get (0, 1).  Shared by every crossfading kernel — the ramp
    form is the reference's f[n] = n/(fpb-1) contract."""
    f32 = jnp.float32
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, fpb), 1).astype(f32)
    fn = iota / f32(fpb - 1)
    xf = xf_ref[:]
    a = jnp.where(xf > 0, 1.0 - fn, f32(0.0))
    b = jnp.where(xf > 0, fn, f32(1.0))
    return a, b


def _tail_dots(qr, qi, icr_ref, ici_ref, eb: int, tree: bool):
    """The tail-IDFT contraction pair y = qr @ icr[:eb] + qi @ ici[:eb].

    tree=False: one fp32-HIGHEST dot_general per plane (Mosaic's sequential
    K accumulation).  tree=True: K split at 128-lane boundaries (plus the
    odd final chunk when eb=513), each chunk contracted separately and the
    partials summed pairwise — same MACs, tree-shaped rounding."""
    hp = jax.lax.Precision.HIGHEST
    f32 = jnp.float32

    def dot(q, basis_ref, lo, hi):
        return jax.lax.dot_general(
            q[:, lo:hi], basis_ref[lo:hi], (((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=f32,
        )

    def plane(q, basis_ref):
        if not tree:
            return dot(q, basis_ref, 0, eb)
        bounds = list(range(0, eb, 128)) + [eb]
        parts = [dot(q, basis_ref, lo, hi) for lo, hi in zip(bounds, bounds[1:])]
        while len(parts) > 1:
            parts = [
                parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0]

    return plane(qr, icr_ref) + plane(qi, ici_ref)


def lane512_width(bins: int) -> int:
    """Table/blend-row width of the lane-aligned layout."""
    return 4 * (bins - 1) + 128


def to_lane512(table: jax.Array, bins: int) -> jax.Array:
    """Repack a combined-plane table (N, 4*bins) [rL|iL|rR|iR] into the
    lane-aligned layout (N, 4*(bins-1) + 128): the four planes truncated to
    bins-1 columns, then a 128-lane block whose first four columns are the
    planes' Nyquist bins (rL[512], iL[512], rR[512], iR[512]).

    Pure column permutation + zero fill — blending commutes with it, so
    ``blend_cat(to_lane512(T), i, w) == to_lane512(blend_cat(T, i, w))``
    column-for-column."""
    b1 = bins - 1
    planes = [table[..., k * bins : k * bins + b1] for k in range(4)]
    nyq = jnp.concatenate(
        [table[..., k * bins + b1 : (k + 1) * bins] for k in range(4)], axis=-1
    )
    pad = jnp.zeros(table.shape[:-1] + (128 - 4,), table.dtype)
    return jnp.concatenate([*planes, nyq, pad], axis=-1)


# Compact-distance capacity: renders whose (u_hi, u_lo, inv_frac) triples
# take at most this many unique values (constant-radius workloads — the
# triple depends only on r, though the reference's |coordinates| round trip
# wobbles it by an ulp on scattered blocks, so "constant r" still yields
# 2-4 uniques) compute the distance ramps ONCE per unique triple and select
# per row — bit-identical, and it removes ~2*B*bins VPU cos/sin per step
# (measured 0.21 ms = 1.15x at the bench point, PERF.md Roofline).
MAX_DIST_UNIQ = 8


def _distance_planes(uh_ref, ul_ref, f_ref, rows: int, bins: int):
    """In-kernel distance factor: (rows,1) phase-split scalars -> (rows,bins)
    re/im planes.  Identical op order to ops/filters.distance_factors_split;
    measured BIT-IDENTICAL on chip (same hardware transcendental)."""
    f32 = jnp.float32
    k = jax.lax.broadcasted_iota(jnp.int32, (rows, bins), 1).astype(f32)
    head = uh_ref[:] * k
    head = head - jnp.floor(head)
    cyc = head + ul_ref[:] * k
    cyc = cyc - jnp.floor(cyc)
    arg = (2.0 * np.pi) * cyc
    return jnp.cos(arg) * f_ref[:], -jnp.sin(arg) * f_ref[:]


def _forward_planes(subs_ref, cfr_ref, cfi_ref, twr_ref, twi_ref, *,
                    tb: int, nb: int, q: int, rows_pad: int, bins: int,
                    lane512: bool, fwd512: bool):
    """Shared in-kernel forward: sub-block DFT matmuls + sliding twiddle
    accumulation.  Returns (xr, xi, xn_r, xn_i, eb) where xr/xi are the
    (TB, eb) planes and xn_* the Nyquist columns (None unless lane512).

    ``fwd512`` (round-5 follow-up, lane512 only): the DFT bases arrive
    truncated to (sub, 512) — the matmuls emit N=512 (4 MXU lane-tiles,
    no 513->640 padding) and the whole twiddle accumulation runs 4
    vreg-columns wide instead of 5.  The Nyquist forward column is exact
    on the VPU: cf[n, 512] = cos(pi n) = +-1 exactly in float32, and the
    k=512 sliding twiddles are 1.0f (e^{-2pi i 64 m}), so
    X_ny[b] = sum_m P_{b+m}[512] with P[512] = sum_n (-1)^n subs[n] — a
    lane reduction + q-1 sublane rolls.  Numerics: the nyq column drops
    the ~1e-13 imaginary-part crumbs (float rounding of sin(pi n)) the
    padded matmul carried; absolute output contribution ~1e-13 * signal."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    g_sources = tb // nb

    pr = jax.lax.dot_general(subs_ref[:], cfr_ref[:], (((1,), (0,)), ((), ())),
                             precision=hp, preferred_element_type=f32)
    pi = jax.lax.dot_general(subs_ref[:], cfi_ref[:], (((1,), (0,)), ((), ())),
                             precision=hp, preferred_element_type=f32)
    if fwd512:
        assert lane512, "fwd512 requires the lane512 layout"
        sub = subs_ref.shape[1]
        # the exact-Nyquist identities below need the k=bins-1 sliding
        # twiddle e^{-i*pi*m*sub} to be +1 exactly, i.e. an even sub-block
        # hop (default 128); an odd hop would silently sign-flip odd-m terms
        assert sub % 2 == 0, f"fwd512 requires an even sub-block size, got {sub}"
        lane = jax.lax.broadcasted_iota(jnp.int32, (subs_ref.shape[0], sub), 1)
        alt = jnp.where(lane % 2 == 0, f32(1.0), f32(-1.0))
        pn = jnp.sum(subs_ref[:] * alt, axis=1, keepdims=True)

    def source_planes(s):
        base = s * rows_pad
        blk_r = pr[base : base + rows_pad]
        blk_i = pi[base : base + rows_pad]
        xr = blk_r[:nb]
        xi = blk_i[:nb]
        for m in range(1, q):
            a = twr_ref[m : m + 1, :]
            b = twi_ref[m : m + 1, :]
            prm = pltpu.roll(blk_r, shift=rows_pad - m, axis=0)[:nb]
            pim = pltpu.roll(blk_i, shift=rows_pad - m, axis=0)[:nb]
            xr = xr + (a * prm - b * pim)
            xi = xi + (a * pim + b * prm)
        return xr, xi

    parts = [source_planes(s) for s in range(g_sources)]
    xr = jnp.concatenate([p[0] for p in parts], axis=0)
    xi = jnp.concatenate([p[1] for p in parts], axis=0)

    if not lane512:
        return xr, xi, None, None, bins
    eb = bins - 1
    if fwd512:
        def source_nyq(s):
            base = s * rows_pad
            blk = pn[base : base + rows_pad]
            xn = blk[:nb]
            for m in range(1, q):
                xn = xn + pltpu.roll(blk, shift=rows_pad - m, axis=0)[:nb]
            return xn

        xn_r = jnp.concatenate([source_nyq(s) for s in range(g_sources)], axis=0)
        xn_i = jnp.zeros_like(xn_r)
        return xr, xi, xn_r, xn_i, eb
    xn_r, xn_i = xr[:, eb:bins], xi[:, eb:bins]
    return xr[:, :eb], xi[:, :eb], xn_r, xn_i, eb


def _onehot_kernel(
    subs_ref,   # (G*rows_pad, sub)
    uh_ref,     # (TB, 1) distance phase split, head; (8, 1) when n_dist
    ul_ref,     # (TB, 1) tail
    f_ref,      # (TB, 1) 1/(1+fsvs r^2)
    dsel_ref,   # (TB, 1) int32 unique-triple selector (dummy when n_dist None)
    ridx_ref,   # (TB, 4) int32 — filter ids remapped into the compact table
    w_ref,      # (TB, 4) float32
    rlast_ref,  # (P_pad, 4) int32 — per-segment last-new filter ids
    wlast_ref,  # (P_pad, 4)
    xf_ref,     # (TB, 1)
    table_ref,  # (U_pad, 4*bins) compact filter table, VMEM-resident
    cfr_ref, cfi_ref, twr_ref, twi_ref, icr_ref, ici_ref,
    out_ref,    # (TB, 2*fpb)
    *,
    tb: int,
    nb: int,
    q: int,
    rows_pad: int,
    bins: int,
    fpb: int,
    p_rows: int,
    u_pad: int,
    single_blend: bool = True,
    mstack_tail: bool = False,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
):
    """One-hot-matmul blend variant: the per-chunk COMPACT filter table
    (unique filters only, U_pad <= MAX_ONEHOT_U) stays VMEM-resident and the blend
    becomes (TB, U_pad) @ (U_pad, 4*bins) on the MXU — no HBM filter
    gathers and no blended-row materialization at all.  Numerics: the MXU
    blend accumulates in fp32-HIGHEST (bf16x6) instead of exact sequential
    adds (~1e-7 relative on the blend — gate impact measured before
    enabling by default).

    ``single_blend`` (round-4 roofline attack): the kernel is MXU-bound at
    fp32-HIGHEST (PERF.md Roofline), and the second blend matmul is
    removable — roll(W)@T == roll(W@T) BIT-EXACTLY (rolling rows permutes
    which row each dot product lands in without touching its contraction
    order), so g_new derives from g_old by a VMEM sublane roll + an
    (8, U_pad) patch matmul for the boundary rows, eliminating a
    (TB, U_pad) @ (U_pad, 4*bins) MXU pass (~22% of the kernel's MACs).
    False keeps the two-matmul form (same numerics either way)."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    xr, xi, xn_r, xn_i, eb = _forward_planes(
        subs_ref, cfr_ref, cfi_ref, twr_ref, twi_ref,
        tb=tb, nb=nb, q=q, rows_pad=rows_pad, bins=bins,
        lane512=lane512, fwd512=fwd512,
    )
    dr, di = _select_distance(uh_ref, ul_ref, f_ref, dsel_ref, n_dist, tb, bins)
    if lane512:
        dn_r, dn_i = dr[:, eb:bins], di[:, eb:bins]
        dr, di = dr[:, :eb], di[:, :eb]
        xdn_r = xn_r * dn_r - xn_i * dn_i
        xdn_i = xn_r * dn_i + xn_i * dn_r
    xdr = xr * dr - xi * di
    xdi = xr * di + xi * dr

    # one-hot weight rows: W[b, u] = sum_k w[b,k] * (ridx[b,k] == u)
    ucol = jax.lax.broadcasted_iota(jnp.int32, (tb, u_pad), 1)

    def onehot(idx_ref_, w_ref_, rows):
        acc = jnp.zeros((rows, u_pad), f32)
        uc = ucol[:rows]
        for k in range(4):
            acc = acc + jnp.where(
                uc == idx_ref_[:, k][:, None], w_ref_[:, k][:, None], f32(0.0)
            )
        return acc

    w_old = onehot(ridx_ref, w_ref, tb)          # (TB, U_pad)
    w_patch = onehot(rlast_ref, wlast_ref, rlast_ref.shape[0])
    g_old = jax.lax.dot_general(w_old, table_ref[:], (((1,), (0,)), ((), ())),
                                precision=hp, preferred_element_type=f32)
    c4 = (4 * (bins - 1) + 128) if lane512 else 4 * bins
    if single_blend:
        # g_new = roll(g_old) + boundary patches: bit-identical to blending
        # rolled weights (row permutation commutes with the per-row dot),
        # one MXU blend pass instead of two; patches blend via a tiny
        # (P_pad, U_pad) matmul
        g_patch = jax.lax.dot_general(
            w_patch, table_ref[:], (((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=f32,
        )
        rolled_g = pltpu.roll(g_old, shift=tb - 1, axis=0)
        localg = jax.lax.broadcasted_iota(jnp.int32, (tb, c4), 0)
        reps = tb // p_rows
        predg = (localg + 1) % nb == 0
        g_new = rolled_g
        for j in range(p_rows):
            g_new = jnp.where(
                predg & (localg // reps == j),
                jnp.broadcast_to(g_patch[j : j + 1, :], (tb, c4)),
                g_new,
            )
    else:
        rolled = pltpu.roll(w_old, shift=tb - 1, axis=0)
        localu = jax.lax.broadcasted_iota(jnp.int32, (tb, u_pad), 0)
        reps = tb // p_rows
        pred = (localu + 1) % nb == 0
        w_new = rolled
        for j in range(p_rows):
            w_new = jnp.where(
                pred & (localu // reps == j),
                jnp.broadcast_to(w_patch[j : j + 1, :], (tb, u_pad)),
                w_new,
            )
        g_new = jax.lax.dot_general(w_new, table_ref[:], (((1,), (0,)), ((), ())),
                                    precision=hp, preferred_element_type=f32)

    a, b = _xfade_weights(xf_ref, fpb)

    def q_planes(g, off_r, off_i):
        gr = g[:, off_r : off_r + eb]
        gi = g[:, off_i : off_i + eb]
        return xdr * gr - xdi * gi, xdr * gi + xdi * gr

    if mstack_tail:
        # M-stack the four tail-IDFT pairs into ONE pair of
        # (4*TB, bins) @ (bins, fpb) matmuls: per-row contractions are
        # unchanged (bit-identical), the IDFT bases stay MXU-resident
        # across all four logical products, and six matmul launches
        # disappear.  Costs ~4 MB of stacked q-plane stack — gate at
        # u_pad <= 128 geometries (the u_pad=256 forms already sit near
        # the 16 MB scoped-VMEM edge).
        qs = [q_planes(g, 2 * c * eb, (2 * c + 1) * eb)
              for c in range(2) for g in (g_old, g_new)]  # lane512 gated off
        big_qr = jnp.concatenate([q[0] for q in qs], axis=0)
        big_qi = jnp.concatenate([q[1] for q in qs], axis=0)
        # same contraction policy as the unstacked tail (tail_tree respected
        # — a plain dot here silently reverted the association and made
        # mstack A/Bs compare different numerics; review finding)
        y = _tail_dots(big_qr, big_qi, icr_ref, ici_ref, eb, tail_tree)
        for c in range(2):
            y_old = y[(2 * c) * tb : (2 * c + 1) * tb]
            y_new = y[(2 * c + 1) * tb : (2 * c + 2) * tb]
            out_ref[:, c * fpb : (c + 1) * fpb] = y_old * a + y_new * b
        return

    def tail(g, c):
        off_r, off_i = 2 * c * eb, (2 * c + 1) * eb
        qr, qi = q_planes(g, off_r, off_i)
        y = _tail_dots(qr, qi, icr_ref, ici_ref, eb, tail_tree)
        if lane512:
            # Nyquist-bin contribution as two VPU rank-1 terms: the blended
            # Nyquist columns live at 4*eb + [2c, 2c+1] of the lane512 row
            ny = 4 * eb + 2 * c
            gnr = g[:, ny : ny + 1]
            gni = g[:, ny + 1 : ny + 2]
            qnr = xdn_r * gnr - xdn_i * gni
            qni = xdn_r * gni + xdn_i * gnr
            y = y + qnr * icr_ref[eb : eb + 1, :] + qni * ici_ref[eb : eb + 1, :]
        return y

    for c in range(2):
        y_old = tail(g_old, c)
        y_new = tail(g_new, c)
        out_ref[:, c * fpb : (c + 1) * fpb] = y_old * a + y_new * b


@functools.partial(
    jax.jit,
    static_argnames=("pad_len", "bins", "fpb", "tb", "interpret", "single_blend",
                     "n_dist", "lane512", "fwd512", "tail_tree"),
)
def fused_step_stream_onehot_xfade(
    stream: jax.Array,    # (hist + B*fpb,) one sample stream
    uh: jax.Array,        # (B, 1) distance phase split (head, tail, rolloff)
    ul: jax.Array,
    fr: jax.Array,
    table: jax.Array,     # (U_pad, 4*bins) compact filter table
    ridx: jax.Array,      # (B, 4) int32 OLD-aligned rows, remapped
    w: jax.Array,         # (B, 4)
    ridx_last: jax.Array,  # (1, 4) final new row, remapped
    w_last: jax.Array,     # (1, 4)
    xf: jax.Array,         # (B, 1)
    pad_len: int,
    bins: int,
    fpb: int,
    tb: int = 256,
    interpret: bool | None = None,
    single_blend: bool = True,
    dsel: jax.Array | None = None,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
) -> jax.Array:
    """Single-stream one-hot form: halo-tiled sub-block rows + per-tile
    boundary one-hot row (next tile's first old row; last tile = g_last).

    ``n_dist``: compact-distance mode — uh/ul/fr become the (8, 1) padded
    unique-triple arrays and ``dsel`` (B, 1) int32 selects per block (see
    MAX_DIST_UNIQ)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    q = pad_len // fpb
    b = dsel.shape[0] if n_dist is not None else uh.shape[0]
    dsel_arr = dsel if n_dist is not None else jnp.zeros((8, 1), jnp.int32)
    assert stream.shape[0] == b * fpb + (q - 1) * fpb
    assert b % tb == 0
    n_tiles = b // tb
    u_pad = table.shape[0]
    c4 = table.shape[1]
    assert c4 == (lane512_width(bins) if lane512 else 4 * bins), \
        "table layout does not match lane512 flag"

    rows = tb + q - 1
    rows_pad = _round_up(rows, 8)
    subs = _stream_subs(stream, b, n_tiles, tb, q, fpb, rows, rows_pad)

    # per-tile boundary new row (one-hot inputs): next tile's first old row,
    # last tile takes the final new row
    rbnd = jnp.concatenate([ridx[tb::tb], ridx_last], axis=0)  # (n_tiles, 4)
    wbnd = jnp.concatenate([w[tb::tb], w_last], axis=0)
    rbnd, wbnd = _pad_rows8(rbnd), _pad_rows8(wbnd)

    cfr, cfi, twr, twi, icr, ici = _kernel_bases(
        pad_len, fpb, bins, q, lane512, fwd512
    )

    kernel = functools.partial(
        _onehot_kernel, tb=tb, nb=tb, q=q, rows_pad=rows_pad, bins=bins,
        fpb=fpb, p_rows=1, u_pad=u_pad, single_blend=single_blend,
        n_dist=n_dist, lane512=lane512, fwd512=fwd512, tail_tree=tail_tree,
    )
    tile = lambda cols, r=tb: pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = (lambda: tile(1)) if n_dist is None else full
    sspec = full if n_dist is None else (lambda: tile(1))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(fpb, r=rows_pad),
            dspec(), dspec(), dspec(),
            sspec(),
            tile(4),
            tile(4),
            tile(4, r=8),
            tile(4, r=8),
            tile(1),
            full(),
            full(), full(),
            full(), full(),
            full(), full(),
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(
        subs, uh, ul, fr, dsel_arr, ridx, w, rbnd, wbnd, xf, table,
        jnp.asarray(cfr), jnp.asarray(cfi),
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(icr), jnp.asarray(ici),
    )


@functools.partial(
    jax.jit,
    static_argnames=("pad_len", "bins", "fpb", "tb", "group_tiles", "u_pad",
                     "single_blend", "n_dist", "lane512", "fwd512", "tail_tree"),
)
def fused_step_stream_onehot_grouped_xfade(
    stream: jax.Array,    # (hist + B*fpb,) one sample stream
    uh: jax.Array,        # (B, 1) distance phase split (head, tail, rolloff)
    ul: jax.Array,
    fr: jax.Array,
    tables: jax.Array,    # (G*U_pad, 4*bins) stacked per-group compact tables
    ridx: jax.Array,      # (B, 4) int32 OLD-aligned rows, remapped PER GROUP
    w: jax.Array,         # (B, 4)
    rbnd: jax.Array,      # (n_tiles, 4) per-tile boundary rows, remapped PER GROUP
    wbnd: jax.Array,      # (n_tiles, 4)
    xf: jax.Array,        # (B, 1)
    pad_len: int,
    bins: int,
    fpb: int,
    tb: int,
    group_tiles: int,     # tiles per table group (group_blocks // tb)
    u_pad: int,
    single_blend: bool = True,
    dsel: jax.Array | None = None,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """GROUPED one-hot form for wide movers: each group of ``group_tiles``
    tiles blends against its OWN compact table (a block-sliced row range of
    ``tables``), so chunks touching more unique filters than one table's
    VMEM gate still run as ONE kernel dispatch.  Host-side sub-chunking was
    measured and rejected — 16 relay dispatches per 8192 blocks cost 5.3x
    one big chunk (scripts/bench_onehot_cliff.py).  Kernel body is
    identical to the ungrouped form; only the table BlockSpec differs.
    ``interpret``: force the Pallas interpreter / compiled Mosaic like
    every sibling wrapper (None = interpret off-TPU)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    q = pad_len // fpb
    b = dsel.shape[0] if n_dist is not None else uh.shape[0]
    dsel_arr = dsel if n_dist is not None else jnp.zeros((8, 1), jnp.int32)
    assert stream.shape[0] == b * fpb + (q - 1) * fpb
    assert b % tb == 0
    n_tiles = b // tb
    assert n_tiles % group_tiles == 0
    assert tables.shape[0] == (n_tiles // group_tiles) * u_pad
    c4 = tables.shape[1]
    assert c4 == (lane512_width(bins) if lane512 else 4 * bins), \
        "tables layout does not match lane512 flag"

    rows = tb + q - 1
    rows_pad = _round_up(rows, 8)
    subs = _stream_subs(stream, b, n_tiles, tb, q, fpb, rows, rows_pad)

    rbnd_p, wbnd_p = _pad_rows8(rbnd), _pad_rows8(wbnd)

    cfr, cfi, twr, twi, icr, ici = _kernel_bases(
        pad_len, fpb, bins, q, lane512, fwd512
    )

    kernel = functools.partial(
        _onehot_kernel, tb=tb, nb=tb, q=q, rows_pad=rows_pad, bins=bins,
        fpb=fpb, p_rows=1, u_pad=u_pad, single_blend=single_blend,
        n_dist=n_dist, lane512=lane512, fwd512=fwd512, tail_tree=tail_tree,
    )
    tile = lambda cols, r=tb: pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = (lambda: tile(1)) if n_dist is None else full
    sspec = full if n_dist is None else (lambda: tile(1))
    # per-group table slice: tile i reads rows [g*U_pad, (g+1)*U_pad) with
    # g = i // group_tiles — the kernel sees a (U_pad, 4*bins) ref as usual
    table_spec = pl.BlockSpec(
        (u_pad, c4), lambda i: (i // group_tiles, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(fpb, r=rows_pad),
            dspec(), dspec(), dspec(),
            sspec(),
            tile(4),
            tile(4),
            tile(4, r=8),
            tile(4, r=8),
            tile(1),
            table_spec,
            full(), full(),
            full(), full(),
            full(), full(),
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(
        subs, uh, ul, fr, dsel_arr, ridx, w, rbnd_p, wbnd_p, xf, tables,
        jnp.asarray(cfr), jnp.asarray(cfi),
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(icr), jnp.asarray(ici),
    )


@functools.partial(
    jax.jit,
    static_argnames=("nb", "pad_len", "bins", "fpb", "tb", "group_tiles",
                     "interpret", "single_blend", "mstack_tail", "n_dist",
                     "lane512", "fwd512", "tail_tree"),
)
def fused_step_onehot_xfade(
    streams: jax.Array,   # (S, hist + nb*fpb)
    uh: jax.Array,        # (S*nb, 1) distance phase split (head, tail, rolloff)
    ul: jax.Array,
    fr: jax.Array,
    table: jax.Array,     # (U_pad, 4*bins) compact table; (G*U_pad, 4*bins) grouped
    ridx: jax.Array,      # (S*nb, 4) int32, remapped into the compact table
    w: jax.Array,         # (S*nb, 4)
    ridx_last: jax.Array,  # (S, 4) int32 per-source final new rows
    w_last: jax.Array,     # (S, 4)
    xf: jax.Array,         # (S*nb, 1)
    nb: int,
    pad_len: int,
    bins: int,
    fpb: int,
    tb: int = 256,
    group_tiles: int | None = None,
    interpret: bool | None = None,
    single_blend: bool = True,
    mstack_tail: bool | None = None,
    dsel: jax.Array | None = None,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
) -> jax.Array:
    """Batched fully-fused step with the in-kernel one-hot blend.

    ``group_tiles``: per-group tables for wide scenes — every
    ``group_tiles`` consecutive tiles (= group_tiles * tb/nb sources)
    blend against their own table slice of the stacked (G*U_pad, 4*bins)
    ``table`` (ids pre-remapped per group, plan.compact_filter_ids_grouped
    semantics); None = one shared table (the fast path when the whole
    scene's unique set fits the VMEM gate)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    s = streams.shape[0]
    b = s * nb
    q = pad_len // fpb
    assert streams.shape[1] == nb * fpb + (q - 1) * fpb
    assert tb % nb == 0 and b % tb == 0
    g_sources = tb // nb
    rows = nb + q - 1
    rows_pad = _round_up(rows, 8)
    if group_tiles is None:
        u_pad = table.shape[0]
    else:
        # groups must tile the render exactly: a remainder would make the
        # table BlockSpec index i // group_tiles address rows past the end
        # of the stacked table for the trailing tiles (silent out-of-bounds
        # block read) — the grouped stream wrapper asserts this too
        assert (b // tb) % group_tiles == 0, (b, tb, group_tiles)
        n_groups = (b // tb) // group_tiles
        assert table.shape[0] % n_groups == 0
        u_pad = table.shape[0] // n_groups
    c4 = table.shape[1]
    assert c4 == (lane512_width(bins) if lane512 else 4 * bins), \
        "table layout does not match lane512 flag"

    subs = streams.reshape(s, rows, fpb)
    subs = jnp.pad(subs, ((0, 0), (0, rows_pad - rows), (0, 0)))
    subs = subs.reshape(s * rows_pad, fpb)

    p_rows = g_sources
    p_pad = _round_up(p_rows, 8)
    if p_pad != p_rows:
        r3 = ridx_last.reshape(-1, p_rows, 4)
        w3 = w_last.reshape(-1, p_rows, 4)
        r3 = jnp.pad(r3, ((0, 0), (0, p_pad - p_rows), (0, 0)))
        w3 = jnp.pad(w3, ((0, 0), (0, p_pad - p_rows), (0, 0)))
        ridx_last, w_last = r3.reshape(-1, 4), w3.reshape(-1, 4)

    cfr, cfi, twr, twi, icr, ici = _kernel_bases(
        pad_len, fpb, bins, q, lane512, fwd512
    )

    if mstack_tail is None:
        # measured dead end (PERF.md): on chip the M-stacked tails were
        # BIT-IDENTICAL to the then-default plain contraction (max diff 0.0
        # — MXU K-accumulation is M-invariant) but throughput-neutral
        # (1.636 vs 1.650 ms at 256x64/U=128): Mosaic's pipeline already
        # hides the per-matmul launch overhead, so the stacked q-plane
        # copies buy nothing.  Kept measurable; the stacked branch follows
        # the SAME tail_tree contraction policy as the unstacked one, so
        # the M-invariance equivalence still holds under today's tree
        # default.
        mstack_tail = False
    elif mstack_tail and (u_pad > 128 or lane512):
        # enforce the documented gate: the stacked q-planes cost ~4 MB of
        # kernel stack and the u_pad=256 forms already sit near the 16 MB
        # scoped-VMEM edge — ignore the bench-only flag there rather than
        # rely on the strike machinery to absorb the compile failure.
        # Warn loudly: a silent drop would make an A/B of the flag at these
        # geometries compare two identical programs and read a fake 1.00x.
        warnings.warn(
            f"mstack_tail=True ignored (u_pad={u_pad}, lane512={lane512}): "
            "the stacked form is gated to u_pad<=128 non-lane512 geometries "
            "(scoped-VMEM edge, PERF.md) — this A/B arm runs the UNstacked kernel",
            stacklevel=2,
        )
        mstack_tail = False
    kernel = functools.partial(
        _onehot_kernel, tb=tb, nb=nb, q=q, rows_pad=rows_pad, bins=bins,
        fpb=fpb, p_rows=p_rows, u_pad=u_pad, single_blend=single_blend,
        mstack_tail=mstack_tail, n_dist=n_dist, lane512=lane512, fwd512=fwd512, tail_tree=tail_tree,
    )
    dsel_arr = dsel if n_dist is not None else jnp.zeros((8, 1), jnp.int32)
    n_tiles = b // tb
    tile = lambda cols, r=tb: pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = (lambda: tile(1)) if n_dist is None else full
    sspec = full if n_dist is None else (lambda: tile(1))
    if group_tiles is None:
        table_spec = full()  # one compact table resident across the grid
    else:  # per-group slice: tile i reads rows [g*U_pad, (g+1)*U_pad)
        gt = group_tiles
        table_spec = pl.BlockSpec(
            (u_pad, c4), lambda i: (i // gt, 0), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(fpb, r=g_sources * rows_pad),
            dspec(), dspec(), dspec(),
            sspec(),
            tile(4),
            tile(4),
            tile(4, r=p_pad),
            tile(4, r=p_pad),
            tile(1),
            table_spec,
            full(), full(),
            full(), full(),
            full(), full(),
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(
        subs, uh, ul, fr, dsel_arr, ridx, w, ridx_last, w_last, xf, table,
        jnp.asarray(cfr), jnp.asarray(cfi),
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(icr), jnp.asarray(ici),
    )


def _kernel(
    subs_ref,   # (G*rows_pad, sub) — per-source sub-block sample rows
    uh_ref,     # (TB, 1) distance phase split, head; (8, 1) when n_dist
    ul_ref,     # (TB, 1) tail
    f_ref,      # (TB, 1) rolloff
    dsel_ref,   # (TB, 1) int32 unique-triple selector (dummy when n_dist None)
    g_ref,      # (TB, 4*bins) old-filter blend rows (NEW rows when not with_xfade)
    *rest,      # with_xfade: patch (P_pad, 4*bins), xf (TB, 1), then the 6
                # basis refs + out_ref; else just the bases + out_ref
    tb: int,
    nb: int,
    q: int,
    rows_pad: int,
    bins: int,
    fpb: int,
    p_rows: int,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
    with_xfade: bool = True,
):
    """Gather-form fused step.  ``with_xfade=False`` (round 5, the
    no-crossfade fast path): ``g_ref`` carries the NEW-filter rows directly
    (callers gather them host/XLA-side — plan old[b+1] == new[b] makes the
    values identical to the roll-derived set) and the kernel skips the
    roll/patch derivation, the whole old-side tail (half the tail-IDFT
    MACs and q products) and the crossfade arithmetic.  Bit-identical to
    the crossfade form on non-crossfading rows: there out = y_old*0 +
    y_new*1 = y_new, the very planes this form computes."""
    if with_xfade:
        (patch_ref, xf_ref, cfr_ref, cfi_ref, twr_ref, twi_ref,
         icr_ref, ici_ref, out_ref) = rest
    else:
        cfr_ref, cfi_ref, twr_ref, twi_ref, icr_ref, ici_ref, out_ref = rest
    f32 = jnp.float32
    xr, xi, xn_r, xn_i, eb = _forward_planes(
        subs_ref, cfr_ref, cfi_ref, twr_ref, twi_ref,
        tb=tb, nb=nb, q=q, rows_pad=rows_pad, bins=bins,
        lane512=lane512, fwd512=fwd512,
    )

    dr, di = _select_distance(uh_ref, ul_ref, f_ref, dsel_ref, n_dist, tb, bins)
    if lane512:
        # Nyquist split — see LANE512_DEFAULT / _onehot_kernel
        dn_r, dn_i = dr[:, eb:bins], di[:, eb:bins]
        dr, di = dr[:, :eb], di[:, :eb]
        xdn_r = xn_r * dn_r - xn_i * dn_i
        xdn_i = xn_r * dn_i + xn_i * dn_r
    xdr = xr * dr - xi * di
    xdi = xr * di + xi * dr

    # --- identical to fused_apply from here on -----------------------------
    c4 = (4 * (bins - 1) + 128) if lane512 else 4 * bins

    def tail(g, c):
        off_r, off_i = 2 * c * eb, (2 * c + 1) * eb
        gr = g[:, off_r : off_r + eb]
        gi = g[:, off_i : off_i + eb]
        qr = xdr * gr - xdi * gi
        qi = xdr * gi + xdi * gr
        y = _tail_dots(qr, qi, icr_ref, ici_ref, eb, tail_tree)
        if lane512:
            ny = 4 * eb + 2 * c
            gnr = g[:, ny : ny + 1]
            gni = g[:, ny + 1 : ny + 2]
            qnr = xdn_r * gnr - xdn_i * gni
            qni = xdn_r * gni + xdn_i * gnr
            y = y + qnr * icr_ref[eb : eb + 1, :] + qni * ici_ref[eb : eb + 1, :]
        return y

    if not with_xfade:
        g = g_ref[:]  # NEW-filter rows, gathered by the caller
        for c in range(2):
            out_ref[:, c * fpb : (c + 1) * fpb] = tail(g, c)
        return

    go = g_ref[:]
    rolled = pltpu.roll(go, shift=tb - 1, axis=0)
    local = jax.lax.broadcasted_iota(jnp.int32, (tb, c4), 0)
    reps = tb // p_rows
    pred = (local + 1) % nb == 0  # seg == nb in the batched form
    gn = rolled
    for j in range(p_rows):
        gn = jnp.where(
            pred & (local // reps == j),
            jnp.broadcast_to(patch_ref[j : j + 1, :], (tb, c4)),
            gn,
        )

    a, b = _xfade_weights(xf_ref, fpb)

    for c in range(2):
        y_old = tail(go, c)
        y_new = tail(gn, c)
        out_ref[:, c * fpb : (c + 1) * fpb] = y_old * a + y_new * b


@functools.partial(
    jax.jit,
    static_argnames=("pad_len", "bins", "fpb", "tb", "interpret", "n_dist",
                     "lane512", "fwd512", "tail_tree", "with_xfade"),
)
def fused_step_stream_xfade(
    stream: jax.Array,  # (hist + B*fpb,) one sample stream (hist == (q-1)*fpb)
    uh: jax.Array,      # (B, 1) distance phase split (head, tail, rolloff)
    ul: jax.Array,
    fr: jax.Array,
    g_old: jax.Array,   # (B, 4*bins); the NEW rows when not with_xfade
    g_last: jax.Array,  # (1, 4*bins) the final new-filter row (None when not with_xfade)
    xf: jax.Array,      # (B, 1) (None when not with_xfade)
    pad_len: int,
    bins: int,
    fpb: int,
    tb: int = 256,
    interpret: bool | None = None,
    dsel: jax.Array | None = None,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
    with_xfade: bool = True,
) -> jax.Array:
    """Single-stream form: tiles of tb blocks over one stream; each tile's
    sub-block rows are gathered with a duplicated q-1-row halo (tiny), and
    the new-filter boundary row comes from the next tile (or g_last).

    ``with_xfade=False``: no-crossfade fast path — ``g_old`` carries the
    NEW rows, g_last/xf are ignored (pass None), and the kernel computes
    only the new-side tails (see _kernel)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    q = pad_len // fpb
    b = dsel.shape[0] if n_dist is not None else uh.shape[0]
    dsel_arr = dsel if n_dist is not None else jnp.zeros((8, 1), jnp.int32)
    assert stream.shape[0] == b * fpb + (q - 1) * fpb, "aligned geometry only"
    assert b % tb == 0
    n_tiles = b // tb
    c4 = g_old.shape[1]
    assert c4 == (lane512_width(bins) if lane512 else 4 * bins), \
        "blend-row layout does not match lane512 flag"

    rows = tb + q - 1
    rows_pad = _round_up(rows, 8)
    subs = _stream_subs(stream, b, n_tiles, tb, q, fpb, rows, rows_pad)

    if with_xfade:
        # per-tile boundary new row: old[(i+1)*tb], last tile takes g_last
        patch = jnp.concatenate([g_old[tb::tb], g_last[-1:]], axis=0)  # (n_tiles, C)
        p3 = jnp.pad(patch[:, None, :], ((0, 0), (0, 7), (0, 0)))
        patch = p3.reshape(n_tiles * 8, c4)

    cfr, cfi, twr, twi, icr, ici = _kernel_bases(
        pad_len, fpb, bins, q, lane512, fwd512
    )

    kernel = functools.partial(
        _kernel, tb=tb, nb=tb, q=q, rows_pad=rows_pad, bins=bins, fpb=fpb,
        p_rows=1, n_dist=n_dist, lane512=lane512, fwd512=fwd512, tail_tree=tail_tree,
        with_xfade=with_xfade,
    )
    tile = lambda cols, r=tb: pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = (lambda: tile(1)) if n_dist is None else full
    sspec = full if n_dist is None else (lambda: tile(1))
    xf_specs = [tile(c4, r=8), tile(1)] if with_xfade else []
    xf_args = (patch, xf) if with_xfade else ()
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(fpb, r=rows_pad),
            dspec(), dspec(), dspec(),
            sspec(),
            tile(c4),
            *xf_specs,
            full(), full(),
            full(), full(),
            full(), full(),
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(
        subs, uh, ul, fr, dsel_arr, g_old, *xf_args,
        jnp.asarray(cfr), jnp.asarray(cfi),
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(icr), jnp.asarray(ici),
    )


@functools.partial(
    jax.jit,
    static_argnames=("nb", "pad_len", "bins", "fpb", "tb", "interpret",
                     "n_dist", "lane512", "fwd512", "tail_tree", "with_xfade"),
)
def fused_step_xfade(
    streams: jax.Array,  # (S, hist + nb*fpb) raw per-source sample streams
    uh: jax.Array,       # (S*nb, 1) distance phase split (head, tail, rolloff)
    ul: jax.Array,
    fr: jax.Array,
    g_old: jax.Array,    # (S*nb, 4*bins) old-filter rows; NEW rows when not with_xfade
    g_last: jax.Array,   # (S, 4*bins) per-source final new rows (None when not with_xfade)
    xf: jax.Array,       # (S*nb, 1) (None when not with_xfade)
    nb: int,
    pad_len: int,
    bins: int,
    fpb: int,
    tb: int = 256,
    interpret: bool | None = None,
    dsel: jax.Array | None = None,
    n_dist: int | None = None,
    lane512: bool = False,
    fwd512: bool = False,
    tail_tree: bool = False,
    with_xfade: bool = True,
) -> jax.Array:
    """-> (S*nb, 2*fpb) crossfaded stereo tails; forward DFT done in-kernel.

    Requires the aligned geometry (hist == (q-1)*fpb), tb = G*nb with G
    whole sources per tile, and tb | S*nb.

    ``with_xfade=False``: no-crossfade fast path — ``g_old`` carries the
    NEW rows, g_last/xf are ignored (pass None), and the kernel computes
    only the new-side tails (half the tail-IDFT MACs; see _kernel).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    s = streams.shape[0]
    b = s * nb
    q = pad_len // fpb
    assert streams.shape[1] == nb * fpb + (q - 1) * fpb, "aligned geometry only"
    assert tb % nb == 0 and b % tb == 0
    g_sources = tb // nb
    rows = nb + q - 1
    rows_pad = _round_up(rows, 8)
    c4 = g_old.shape[1]
    assert c4 == (lane512_width(bins) if lane512 else 4 * bins), \
        "blend-row layout does not match lane512 flag"

    # per-source sub-block rows, padded to a sublane multiple
    subs = streams.reshape(s, rows, fpb)
    subs = jnp.pad(subs, ((0, 0), (0, rows_pad - rows), (0, 0)))
    subs = subs.reshape(s * rows_pad, fpb)

    cfr, cfi, twr, twi, icr, ici = _kernel_bases(
        pad_len, fpb, bins, q, lane512, fwd512
    )

    p_rows = g_sources
    p_pad = _round_up(p_rows, 8)
    if with_xfade:
        if p_pad != p_rows:
            g3 = g_last.reshape(b // (nb * p_rows), p_rows, c4)
            g3 = jnp.pad(g3, ((0, 0), (0, p_pad - p_rows), (0, 0)))
            patch = g3.reshape(-1, c4)
        else:
            patch = g_last

    kernel = functools.partial(
        _kernel, tb=tb, nb=nb, q=q, rows_pad=rows_pad, bins=bins, fpb=fpb,
        p_rows=p_rows, n_dist=n_dist, lane512=lane512, fwd512=fwd512, tail_tree=tail_tree,
        with_xfade=with_xfade,
    )
    dsel_arr = dsel if n_dist is not None else jnp.zeros((8, 1), jnp.int32)
    n_tiles = b // tb
    tile = lambda cols, r=tb: pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = (lambda: tile(1)) if n_dist is None else full
    sspec = full if n_dist is None else (lambda: tile(1))
    xf_specs = [tile(c4, r=p_pad), tile(1)] if with_xfade else []
    xf_args = (patch, xf) if with_xfade else ()
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(fpb, r=g_sources * rows_pad),  # subs rows per tile
            dspec(), dspec(), dspec(),
            sspec(),
            tile(c4),
            *xf_specs,
            full(), full(),  # sub-block DFT bases
            full(), full(),  # twiddles
            full(), full(),  # inverse bases
        ],
        out_specs=tile(2 * fpb),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fpb), jnp.float32),
        interpret=interpret,
    )(
        subs, uh, ul, fr, dsel_arr, g_old, *xf_args,
        jnp.asarray(cfr), jnp.asarray(cfi),
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(icr), jnp.asarray(ici),
    )
