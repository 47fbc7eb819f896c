"""On-chip A/B: pairwise-tree tail-IDFT contraction vs the plain dot_general.

Round-5 follow-up to the error budget: the apply-association probe
(scripts/apply_assoc_probe.py) showed the whole fused-vs-XLA gate delta is
the MXU K-accumulation schedule, and that chunked 128-lane dot_generals
summed pairwise recover the XLA chain's accuracy inside the kernel.  This
script measures whether the tree form costs throughput on the production
dispatches (layouts at their measured defaults):

  onehot  — the bench.py headline path (batched one-hot, compact distance,
            single-blend, lane512) at the 256x64 operating point
  grouped — the wide-mover cliff geometry (single stream, per-group tables)
  gather  — batched dedup+fused (scene_hold shape, classic layout)

Each A/B reports ms/step (slope timing), the speedup, and the on-chip
max|diff| between contraction orders.  Run under the ambient axon env:

    python scripts/bench_tail_tree.py [--which onehot,grouped,gather]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(run, k_short=4, k_long=24):
    run(3)  # warm
    t_s, t_l = run(k_short), run(k_long)
    return (t_l - t_s) / (k_long - k_short)


def bench_onehot():
    import jax
    import jax.numpy as jnp

    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import batched_chunk_fn_fused
    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import dedup_distance, pick_fused_tile
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    n_sources, nb = 256, 64
    rng = np.random.default_rng(0)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    hists = jnp.zeros((n_sources, cfg.history_len), jnp.float32)
    feds = jnp.asarray(
        rng.standard_normal((n_sources, nb * cfg.frames_per_buffer)).astype(np.float32) * 0.2
    )
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(n_sources)
    ]
    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    tb_f = pick_fused_tile(n_sources * nb, nb)
    idx_old_np = np.stack([p.idx_old for p in plans])
    idx_last_np = np.stack([p.idx_new[-1] for p in plans])
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(idx_old_np, idx_last_np)
    dist = dedup_distance(
        np.concatenate([p.u_hi for p in plans]),
        np.concatenate([p.u_lo for p in plans]),
        np.concatenate([p.inv_frac for p in plans]),
    )
    nd = None if dist is None else dist[4]
    d_args = (
        (jnp.asarray(dist[0]), jnp.asarray(dist[1]), jnp.asarray(dist[2]),
         jnp.asarray(dist[3].reshape(n_sources, nb)))
        if dist is not None
        else (stack("u_hi"), stack("u_lo"), stack("inv_frac"))
    )
    xs = (
        jnp.asarray(uniq_ids), jnp.asarray(ridx), stack("w_old"),
        jnp.asarray(ridx_last),
        jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        stack("xfade"), *d_args,
    )
    log(f"[onehot] 256x64, tb={tb_f}, U_pad={u_pad}, n_dist={nd}")
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    results = {}
    outs = {}
    for tree in ARM_ORDER:
        step = jax.jit(batched_chunk_fn_fused(
            cfg, num_blocks=nb, tb=tb_f, onehot=True, n_dist=nd,
            tail_tree=tree,
        ))
        t0 = time.time()
        out, h2 = step(spectra, hists, feds, *xs)
        float(probe(out, h2))
        log(f"[onehot] tail_tree={tree}: compile+first {time.time()-t0:.1f}s")
        outs[tree] = np.asarray(out)

        def run(k, step=step):
            h2 = hists
            t0 = time.time()
            for _ in range(k):
                out, h2 = step(spectra, h2, feds, *xs)
            float(probe(out, h2))
            return time.time() - t0

        per = slope(run)
        bps = n_sources * nb / per
        results[tree] = per
        log(f"[onehot] tail_tree={tree}: {per*1e3:.3f} ms/step = {bps:,.0f} blocks/s")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[onehot] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_grouped():
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.renderer import Renderer

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    rng = np.random.default_rng(1)
    b = 8192
    pos = np.stack([
        np.linspace(0, 4 * 360, b) % 360,
        40 * np.sin(np.linspace(0, 20, b)) + 20,
        np.full(b, 1.0),
    ], axis=1).astype(np.float32)
    sig = (rng.standard_normal(b * cfg.frames_per_buffer) * 0.2).astype(np.float32)

    results, outs = {}, {}
    for tree in ARM_ORDER:
        r = Renderer(db, cfg, chunk_blocks=b, dedup=False, fused=True,
                     tail_tree=tree)
        t0 = time.time()
        out = r.render(sig, pos)
        log(f"[grouped] tail_tree={tree}: compile+first {time.time()-t0:.1f}s "
            f"(onehot_grp programs: {list(r._fd_onehot_grp)})")
        outs[tree] = out

        def run(k, r=r):
            t0 = time.time()
            for _ in range(k):
                out = r.render(sig, pos)
            return time.time() - t0

        per = slope(run, k_short=2, k_long=8)
        results[tree] = per
        log(f"[grouped] tail_tree={tree}: {per*1e3:.1f} ms/render "
            f"({b/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[grouped] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_gather():
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import BatchRenderer
    from jefferson_tpu.trajectory.trajectory import StaticPosition

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    s, nb = 128, 64
    rng = np.random.default_rng(2)
    signals = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2).astype(np.float32)
    positions = np.stack([
        StaticPosition(azi=(360 / s) * i, ele=5, r=0.9).sample(nb, cfg)
        for i in range(s)
    ])

    results, outs = {}, {}
    for tree in ARM_ORDER:
        br = BatchRenderer(db, chunk_blocks=nb, dedup=True, fused=True,
                           tail_tree=tree)
        t0 = time.time()
        out = br.render(signals, positions)
        dedup_fused = any(k[1] is not None and k[2] is not None for k in br._jitted)
        log(f"[gather] tail_tree={tree}: compile+first {time.time()-t0:.1f}s "
            f"(dedup+fused: {dedup_fused})")
        outs[tree] = out

        def run(k, br=br):
            t0 = time.time()
            for _ in range(k):
                out = br.render(signals, positions)
            return time.time() - t0

        per = slope(run, k_short=2, k_long=10)
        results[tree] = per
        log(f"[gather] tail_tree={tree}: {per*1e3:.2f} ms/render "
            f"({s*nb/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[gather] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


ARM_ORDER = (False, True)


def main() -> int:
    global ARM_ORDER
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="onehot,grouped,gather")
    ap.add_argument("--reverse", action="store_true",
                    help="run the tree arm FIRST (ordering-bias check: the "
                         "relay session drifts over minutes, biasing the "
                         "second arm)")
    args = ap.parse_args()
    if args.reverse:
        ARM_ORDER = (True, False)
    out = {}
    for name in args.which.split(","):
        out[name] = {"onehot": bench_onehot, "grouped": bench_grouped,
                     "gather": bench_gather}[name]()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
