"""Chunk-size A/B for the batched scene path (TPU): fused_apply vs fused_step.

The fully-fused step kernel requires ``tb % num_blocks == 0`` (tiles own
whole per-source block runs), so chunk sizes above 256 silently route the
batched dedup+fused dispatch to the ``fused_apply`` fallback (XLA forward +
apply-only kernel).  The pre-retune production defaults sat exactly there
(``BatchRenderer(chunk_blocks=512)``, CLI scene path 2048) while bench.py's
headline and the sweep's scene gate both ran 64/256-block chunks on the
fused step — this script's measurements are what moved the defaults to
auto sizing (``chunk_blocks=None``, engine/batch._auto_chunk).  It measures
the SAME total workload (S sources x B_total hold-scene blocks, the
reference's multi-source callback shape, Jefferson/src/Audio.cu:98-158)
rendered as chained chunks of 512 / 256 / 64 blocks, timing the full
chained-dispatch render (so the per-dispatch overhead of smaller chunks is
charged against their kernel win).

Steady-state no-crossfade programs (hold scene past the first chunk is
exactly this; one program per arm).  Slope timing via a device-side scalar
probe, bench.py's pattern.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=2048)
    ap.add_argument("--chunks", type=int, nargs="+", default=[512, 256, 64])
    ap.add_argument("--cadence", type=int, default=0,
                    help="position step every N blocks (reference cadence "
                         "172; sparse-crossfade programs dispatch). "
                         "0 = pure hold scene (default)")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import batched_chunk_fn_dedup_fused
    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import (
        _pad_cf_indices,
        _sparse_bucket,
        pick_fused_tile,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    fpb = cfg.frames_per_buffer
    s, b_total = args.sources, args.blocks

    rng = np.random.default_rng(0)
    az0 = rng.integers(0, 360, s).astype(float)
    el = rng.integers(-40, 90, s).astype(float)
    rr = 0.5 + 0.5 * rng.random(s)
    if args.cadence:
        # reference-cadence scene: each source steps 15 deg every --cadence
        # blocks, phase-offset across sources so crossfades spread evenly
        i = np.arange(b_total)
        positions = np.stack([
            np.stack([
                (az0[si] + 15.0 * ((i + (si * args.cadence) // s)
                                   // args.cadence)) % 360,
                np.full(b_total, el[si]), np.full(b_total, rr[si]),
            ], axis=1)
            for si in range(s)
        ])
        plans = [make_plan(positions[si], cfg) for si in range(s)]
    else:
        # hold scene with initial_old == position: zero crossfades anywhere,
        # so every arm runs one no-crossfade program for the whole render
        positions = np.stack([
            np.stack([np.full(b_total, az0[i]), np.full(b_total, el[i]),
                      np.full(b_total, rr[i])], axis=1)
            for i in range(s)
        ])
        plans = [make_plan(positions[i], cfg, initial_old=(az0[i], el[i]))
                 for i in range(s)]
        assert not any(p.xfade.any() for p in plans), "hold scene must not crossfade"
    sigs = (rng.standard_normal((s, b_total * fpb)) * 0.2).astype(np.float32)
    feds = jnp.asarray(np.stack([fed_stream(sigs[i], b_total, cfg)
                                 for i in range(s)]))
    hists0 = jnp.zeros((s, cfg.history_len), jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    # render-wide u_pad bucket (mirrors BatchRenderer.render): hold scene,
    # so every chunk shares the same unique set
    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))

    bad = [nb for nb in args.chunks if b_total % nb]
    if bad:
        raise SystemExit(
            f"--blocks {b_total} must be a multiple of every chunk size "
            f"(one compiled program per arm; offending: {bad})"
        )

    results = {}
    outs_by_nb = {}
    for nb in args.chunks:
        k = b_total // nb
        tb = pick_fused_tile(s * nb, nb)
        if tb is None:
            raise SystemExit(
                f"no fused tile for sources={s} x nb={nb} "
                f"(rows={s * nb}; pick a geometry with a 128/256-row tile)"
            )
        kernel = "fused_step" if tb % nb == 0 else "fused_apply"

        # per-chunk dedup args (identical across chunks on a hold scene,
        # but built per chunk exactly like BatchRenderer.render)
        chunk_args = []
        u_pad = 8
        chunks = []
        for start in range(0, b_total, nb):
            sl = slice(start, start + nb)
            ei = np.concatenate(
                [np.stack([p.idx_old[start:start + 1] for p in plans], 0),
                 np.stack([p.idx_new[sl] for p in plans], 0)], axis=1)
            ew = np.concatenate(
                [np.stack([p.w_old[start:start + 1] for p in plans], 0),
                 np.stack([p.w_new[sl] for p in plans], 0)], axis=1)
            rows = ei.shape[0] * ei.shape[1]
            uniq_idx, uniq_w, inv = dedup_rows(ei.reshape(rows, 4),
                                               ew.reshape(rows, 4))
            u_pad = max(u_pad, 1 << int(np.ceil(np.log2(uniq_idx.shape[0]))))
            chunks.append((uniq_idx, uniq_w, inv.reshape(s, nb + 1)))
        # sparse-crossfade bucket (cadence mode): per-chunk cf counts, the
        # production policy (renderer._sparse_bucket, meshless)
        ncf = None
        if args.cadence:
            max_cf = max(
                int(sum(p.xfade[st : st + nb].sum() for p in plans))
                for st in range(0, b_total, nb)
            )
            ncf = _sparse_bucket(max_cf, s * nb)
            assert ncf is not None, (
                f"cadence too dense for sparse at nb={nb} (max_cf={max_cf})"
            )

        for start, (uniq_idx, uniq_w, inv) in zip(range(0, b_total, nb), chunks):
            sl = slice(start, start + nb)
            if uniq_idx.shape[0] < u_pad:
                reps = u_pad - uniq_idx.shape[0]
                uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], reps, 0)])
                uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], reps, 0)])
            cf_args = ()
            if ncf is not None:
                xf = np.stack([p.xfade[sl] for p in plans])
                cfi = _pad_cf_indices(xf.reshape(-1), ncf)
                cf_args = (
                    None,  # dsel placeholder
                    jnp.asarray(cfi.astype(np.int32)),
                    jnp.asarray(inv[:, :nb].reshape(-1)[cfi]),
                )
            chunk_args.append((
                feds[:, start * fpb : (start + nb) * fpb],
                jnp.asarray(uniq_idx), jnp.asarray(uniq_w),
                jnp.asarray(np.ascontiguousarray(inv[:, 1:])),   # NEW rows (no-xfade)
                jnp.asarray(np.ascontiguousarray(inv[:, nb])),
                jnp.asarray(np.stack([p.xfade[sl] for p in plans])),
                jnp.asarray(np.stack([p.u_hi[sl] for p in plans])),
                jnp.asarray(np.stack([p.u_lo[sl] for p in plans])),
                jnp.asarray(np.stack([p.inv_frac[sl] for p in plans])),
                *cf_args,
            ))

        fn = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb,
                                                  with_xfade=False, n_cf=ncf))

        def render(hh):
            last = None
            for a in chunk_args:
                last, hh = fn(spectra, hh, a[0], *a[1:])
            return last, hh

        t0 = time.time()
        out, hh = render(hists0)
        float(probe(out, hh))
        print(f"nb={nb} ({kernel}, tb={tb}, {k} chunks, u_pad={u_pad}, "
              f"ncf={ncf}): compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)

        def run(reps):
            t0 = time.time()
            hh = hists0
            for _ in range(reps):
                out, hh = render(hh)
            float(probe(out, hh))
            return time.time() - t0

        run(3)
        t_s, t_l = run(3), run(23)
        per = (t_l - t_s) / 20
        results[nb] = (per, kernel, k)
        print(f"nb={nb}: {per*1e3:.2f} ms / {b_total}-block render "
              f"({s*b_total/per:,.0f} blocks/s)", file=sys.stderr)

        # one full render's outputs for the cross-arm identity check
        outs, hh = [], hists0
        for a in chunk_args:
            y, hh = fn(spectra, hh, a[0], *a[1:])
            outs.append(np.asarray(y))
        outs_by_nb[nb] = np.concatenate(outs, axis=1)

    base_nb = args.chunks[0]
    base = results[base_nb][0]
    print(f"\n| chunk nb | kernel | chunks | ms/render | blocks/s | vs nb={base_nb} |")
    print("|---|---|---|---|---|---|")
    for nb, (per, kernel, k) in sorted(results.items(), reverse=True):
        print(f"| {nb} | {kernel} | {k} | {per*1e3:.2f} | "
              f"{s*b_total/per:,.0f} | {base/per:.3f}x |")
    for nb in args.chunks[1:]:
        d = np.abs(outs_by_nb[nb] - outs_by_nb[base_nb]).max()
        print(f"max|diff| nb={nb} vs nb={base_nb}: {d:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
