"""Roofline for the one-hot fused step at the bench operating point (TPU).

Quantifies WHERE the remaining kernel time goes (round-3 verdict: the
"compute-saturated" claim was inferred from shape-flatness, never costed)
and A/Bs the round-4 MXU-reduction attempt (single-blend one-hot: g_new by
VMEM roll + patch matmul instead of a second full blend matmul — designed
bit-identical, verified in interpret mode and here on chip).

Arithmetic at 256 sources x 64 blocks/step (B = 16384 rows, tb = 256,
U_pad = 128, bins = 513, fpb = 128, q = 8, rows_pad = 72):

MXU MACs per tile (fp32 Precision.HIGHEST = 6 bf16 passes on v5e):
  forward sub-block DFT   2 x (288 x 128 x 513)   =  37.8 MMAC
  one-hot blends          2 x (256 x 128 x 2052)  = 134.5 MMAC  (1x if single)
  tail IDFTs              8 x (256 x 513 x 128)   = 134.5 MMAC
  total                   ~306.8 MMAC/tile x 64 tiles = 19.6 GMAC/step
v5e MXU peak 197 TFLOP/s bf16 = 98.5 TMAC/s; fp32-HIGHEST = 6 bf16 passes
  -> 16.4 TMAC/s effective
  -> MXU floor ~1.20 ms/step (two-blend), ~0.94 ms (single-blend)

VPU (elementwise) per step: sliding twiddle accumulation + distance
cos/sin + complex products + crossfade ~ 1.1 GFLOP + 16.8M transcendentals
  -> ~0.2-0.3 ms at ~7 TOP/s VPU

HBM per step: subs 9.4 MB in + out 16.8 MB + table ~1 MB + row args ~1 MB
  ~ 28 MB -> 0.034 ms at 819 GB/s -- NOT bandwidth bound.

So the kernel is MXU-bound at the CHOSEN precision: the fp32-HIGHEST MXU
floor (~1.2 ms) accounts for most of the measured ~1.78 ms in-kernel time;
further gains need fewer MACs (this script's A/B) or lower precision
(measured dead end: HIGH is slower, DEFAULT fails the gates — PERF.md).

Run on the chip: python scripts/bench_roofline.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import cat_table, pick_fused_tile
    from jefferson_tpu.pallas.fused_step import fused_step_onehot_xfade
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    # bench operating point; override for CPU smoke runs / tile A-Bs
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    tb_arg = int(sys.argv[3]) if len(sys.argv) > 3 else None
    fpb = cfg.frames_per_buffer
    rng = np.random.default_rng(0)
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(s)
    ]
    idx_old = np.stack([p.idx_old for p in plans])
    idx_last = np.stack([p.idx_new[-1] for p in plans])
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(idx_old, idx_last)
    tb = tb_arg or pick_fused_tile(s * nb, nb)
    print(f"workload: {s}x{nb}, tb={tb}, U_pad={u_pad}", file=sys.stderr)

    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    hists = np.zeros((s, cfg.history_len), np.float32)
    feds = (rng.standard_normal((s, nb * fpb)) * 0.2).astype(np.float32)
    streams = jnp.asarray(np.concatenate([hists, feds], axis=1))
    table = jnp.take(cat_table(spectra), jnp.asarray(uniq_ids), axis=0)
    b = s * nb
    flat = lambda a: jnp.asarray(np.stack([getattr(p, a) for p in plans]).reshape(b, -1))
    col = lambda a: flat(a)[:, :1]
    args = (
        streams, col("u_hi"), col("u_lo"), col("inv_frac"),
        table, jnp.asarray(ridx.reshape(b, 4)),
        flat("w_old").reshape(b, 4),
        jnp.asarray(ridx_last), jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        jnp.asarray(np.stack([p.xfade for p in plans]).astype(np.float32).reshape(b, 1)),
    )
    kw = dict(nb=nb, pad_len=cfg.pad_len, bins=cfg.num_bins, fpb=fpb, tb=tb)
    probe = jax.jit(lambda o: jnp.sum(o))

    def bench(sb: bool):
        fn = jax.jit(
            lambda *a: fused_step_onehot_xfade(*a, **kw, single_blend=sb)
        )
        t0 = time.time()
        out = fn(*args)
        float(probe(out))
        label = "single-blend" if sb else "two-blend   "
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            t0 = time.time()
            for _ in range(k):
                out = fn(*args)
            float(probe(out))
            return time.time() - t0

        run(4)
        t_s, t_l = run(4), run(84)
        per = (t_l - t_s) / 80
        print(f"{label}: {per*1e3:.3f} ms/step ({s*nb/per:,.0f} blocks/s)",
              file=sys.stderr)
        return per, np.asarray(out)

    t_two, out_two = bench(False)
    t_one, out_one = bench(True)
    diff = float(np.abs(out_one - out_two).max())
    print(f"single vs two blend: {t_two/t_one:.3f}x, max|diff|={diff:.3e}",
          file=sys.stderr)

    # roofline bookkeeping (MACs; see module docstring for the derivation)
    n_tiles = b // tb
    g_sources = tb // nb
    rows_pad = -(-(nb + cfg.pad_len // fpb - 1) // 8) * 8
    mm_fwd = 2 * (g_sources * rows_pad) * fpb * cfg.num_bins
    mm_blend = tb * u_pad * 4 * cfg.num_bins
    mm_idft = 8 * tb * cfg.num_bins * fpb
    macs_two = (mm_fwd + 2 * mm_blend + mm_idft) * n_tiles
    macs_one = (mm_fwd + 1 * mm_blend + mm_idft) * n_tiles
    eff = lambda t_s, macs: macs / t_s / 1e12  # effective TMAC/s
    res = {
        "bench": "roofline_onehot",
        "tb": tb, "u_pad": int(u_pad),
        "two_blend_ms": round(t_two * 1e3, 3),
        "single_blend_ms": round(t_one * 1e3, 3),
        "speedup": round(t_two / t_one, 3),
        "max_diff": diff,
        "gmac_two": round(macs_two / 1e9, 2),
        "gmac_single": round(macs_one / 1e9, 2),
        "eff_tmacs_two": round(eff(t_two, macs_two), 2),
        "eff_tmacs_single": round(eff(t_one, macs_one), 2),
        # v5e MXU peak: 197 TFLOP/s bf16 = 98.5 TMAC/s; fp32 HIGHEST is 6
        # bf16 passes -> 16.4 TMAC/s effective ceiling for these matmuls
        "mxu_peak_highest_tmacs": 16.4,
    }
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
