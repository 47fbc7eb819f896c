"""Error budget for the sweep gate's worst-case margin (round-5 verdict #2).

The full-scale gate's worst margin has sat at 0.894 (1.79e-7 of the 2e-7
reference eps, anchor: Jefferson/src/precision_test.cu:2158) since round 2,
and that headroom folklore has been *blocking* measured-candidate
optimizations.  This script decomposes where the 1.79e-7 comes from by
rendering the worst scenario (azi3_ele0, full 73-position x 172-block
scale) through per-stage hybrid configurations, each against the same
float32 NumPy oracle:

  xla          — Renderer(fused=False): the all-XLA chain (round-1 margin
                 0.60 = 1.19e-7); every later config differs from it only
                 by which stages move into the Mosaic kernel.
  apply_kernel — XLA forward DFT + XLA distance + the fused APPLY kernel
                 (cmul + tail-IDFT + crossfade in-kernel).  Isolates the
                 tail-matmul contraction order.
  fused        — production dedup+fused (in-kernel forward + distance too).
                 apply_kernel == fused  =>  the in-kernel forward/distance
                 contribute ZERO (they are bit-identical by construction,
                 PERF.md round-3) and the delta vs xla is ALL tail-IDFT.
  lane512      — dedup+fused with the lane-aligned layout (K=512 tails +
                 VPU Nyquist rank-1): the round-5 contraction change.

plus a direct on-chip micro A/B of the one-hot MXU blend vs the XLA gather
blend on the scenario's actual unique rows (the one reassociation the
configs above do not isolate), and an anatomy of each config's argmax
sample (block, in-block position, channel, crossfade state).

Run under the ambient axon env: python scripts/error_budget.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=172)
    ap.add_argument("--steps", type=int, default=72)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hrtf-dir", default=None,
                    help="compact KEMAR dir (default: $JEFFERSON_HRTF_DIR, "
                         "else the synthetic set) — the documented ladder "
                         "uses the real set, like bench/sweep")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    log("devices:", jax.devices())

    import jefferson_tpu.engine.renderer as R
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.cli.main import load_hrtf
    from jefferson_tpu.config import ProcessType
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    config = DEFAULT_CONFIG
    db = load_hrtf(args.hrtf_dir, config, quiet=False)
    ref = "/root/reference/Jefferson/media/Castanets-441.wav"
    if os.path.exists(ref):
        from jefferson_tpu.io.wavio import read_wav_mono

        signal, _ = read_wav_mono(ref)
    else:
        signal = (np.random.default_rng(0).standard_normal(131072) * 0.2).astype(np.float32)

    traj = AzimuthSweep(start_azi=3.0, ele=0.0, r=0.5, step_deg=5.0,
                        blocks_per_step=args.blocks, num_steps=args.steps)
    pos = traj.sample(traj.total_blocks, config)
    fpb = config.frames_per_buffer
    log(f"worst scenario azi3_ele0: {traj.total_blocks} blocks")

    t0 = time.time()
    want = render_oracle(signal, db, [tuple(p) for p in pos], config,
                         initial_old=(0.0, 0.0))
    log(f"oracle: {time.time()-t0:.0f}s")
    plan = make_plan(pos, config, (0.0, 0.0))

    def anatomy(rep):
        blk, rem = divmod(rep.max_index, 2 * fpb)
        sample, chan = divmod(rem, 2)
        return {
            "max_abs": rep.max_abs_diff,
            "margin": round(rep.max_abs_diff / 2e-7, 4),
            "block": int(blk),
            "in_block_sample": int(sample),
            "channel": int(chan),
            "xfade_at_block": bool(plan.xfade[blk]) if blk < len(plan.xfade) else None,
            "rms": rep.rms,
        }

    results = {}

    def run_config(name, renderer):
        t0 = time.time()
        got = renderer.render(signal, pos, ProcessType.TPU_FD_COMPLEX,
                              initial_old=(0.0, 0.0))
        rep = precision_check(got, want, eps=2e-7)
        results[name] = anatomy(rep)
        # distribution of large deviations: how lonely is the worst case?
        d = np.abs(got - want)
        results[name]["n_above_1e7"] = int((d > 1.0e-7).sum())
        results[name]["n_above_1p5e7"] = int((d > 1.5e-7).sum())
        log(f"[{name}] {rep}  ({time.time()-t0:.0f}s)  "
            f">1e-7: {results[name]['n_above_1e7']}, "
            f">1.5e-7: {results[name]['n_above_1p5e7']}")

    # 1. all-XLA chain
    run_config("xla", R.Renderer(db, config, fused=False))

    # 2. apply-kernel only: force the fused_apply branch (XLA forward +
    # distance) by making the aligned-geometry check fail inside
    # _apply_maybe_full_fuse; disable compact distance (its operands only
    # exist on the full-fuse branch)
    orig_apply = R._apply_maybe_full_fuse
    orig_dd = R.dedup_distance

    def apply_only(full, u_hi, u_lo, inv_frac, g_old, g_last, xf, config_,
                   num_blocks, tb, dsel=None, n_dist=None, lane512=False,
                   tail_tree=False, with_xfade=True):
        # signature mirrors renderer._apply_maybe_full_fuse — since round 5
        # the sparse-crossfade dispatch passes with_xfade=False on this very
        # workload (1 crossfade per 172 blocks), so it must pass through
        from jefferson_tpu.ops import fft as fft_ops
        from jefferson_tpu.ops.filters import cmul, distance_factors_split
        from jefferson_tpu.pallas.fused_apply import fused_apply_xfade

        assert n_dist is None and not lane512
        xr, xi = R._forward_split(full, num_blocks, config_)
        dr, di = distance_factors_split(u_hi, u_lo, inv_frac, config_.num_bins)
        xdr, xdi = cmul(xr, xi, dr, di)
        icr, ici = fft_ops._idft_tail_matrices(config_.pad_len, config_.frames_per_buffer)
        return fused_apply_xfade(
            xdr, xdi, g_old, g_last, xf,
            jnp.asarray(icr), jnp.asarray(ici),
            seg=num_blocks, bins=config_.num_bins,
            fpb=config_.frames_per_buffer, tb=tb, tail_tree=tail_tree,
            with_xfade=with_xfade,
        )

    # Stages 2-4 pin tail_tree=False: they decompose the PLAIN contraction's
    # 0.894 margin, which is what this budget was built to explain.  (Since
    # TAIL_TREE_DEFAULT flipped to True, omitting the flag would silently
    # measure the tree three times and the ladder would show no deltas.)
    try:
        R._apply_maybe_full_fuse = apply_only
        R.dedup_distance = lambda *a, **k: None
        run_config("apply_kernel", R.Renderer(db, config, fused=True,
                                              lane512=False, tail_tree=False))
    finally:
        R._apply_maybe_full_fuse = orig_apply
        R.dedup_distance = orig_dd

    # 3. production dedup+fused (in-kernel forward + distance)
    run_config("fused", R.Renderer(db, config, fused=True, lane512=False,
                                   tail_tree=False))

    # 4. lane512 tail contraction
    run_config("lane512", R.Renderer(db, config, fused=True, lane512=True,
                                     tail_tree=False))

    # 4b. pairwise-tree tail contraction at the production defaults — the
    # probe-guided recovery path (apply_assoc_probe.py): does tree-shaped
    # MXU accumulation pull the kernel margin back toward the XLA chain's?
    run_config("tail_tree", R.Renderer(db, config, fused=True, tail_tree=True))

    # 5. micro A/B: one-hot MXU blend vs XLA gather blend on this scenario's
    # actual rows (sampled: the first 2048 blocks' old rows)
    from jefferson_tpu.engine.plan import compact_filter_ids

    nbs = min(2048, plan.num_blocks)
    io = plan.idx_old[:nbs][None]
    il = plan.idx_new[nbs - 1 : nbs][None, 0]
    uniq_ids, ridx, _, u_pad = compact_filter_ids(io, il[None])
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    cat = R.cat_table(spectra)
    table = jnp.take(cat, jnp.asarray(uniq_ids), axis=0)
    w = jnp.asarray(plan.w_old[:nbs].astype(np.float32))
    g_xla = R.blend_cat(cat, jnp.asarray(plan.idx_old[:nbs]), w)
    onehot = np.zeros((nbs, u_pad), np.float32)
    for k in range(4):
        np.add.at(onehot, (np.arange(nbs), ridx[0, :, k]), plan.w_old[:nbs, k])
    g_mxu = jnp.matmul(jnp.asarray(onehot), table,
                       precision=jax.lax.Precision.HIGHEST)
    blend_diff = float(jnp.max(jnp.abs(g_xla - g_mxu)))
    rel = float(jnp.max(jnp.abs(g_xla)))
    results["blend_micro_ab"] = {
        "max_abs": blend_diff, "table_peak": rel, "u_pad": int(u_pad),
        "note": "one-hot MXU blend vs XLA gather blend, same rows",
    }
    log(f"[blend] one-hot MXU vs XLA gather: max|diff| {blend_diff:.3e} "
        f"(peak {rel:.3f})")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
