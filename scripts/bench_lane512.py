"""On-chip A/B: lane-aligned 512-bin kernel layout vs the classic 513 layout.

Round-5 attack on the PERF.md "bins=513 lane tax": the lane512 layout makes
every plane slice lane-aligned and contracts the tail IDFTs over K=512
(4 MXU K-tiles) instead of 513-padded-to-640 (5 tiles), with the Nyquist
bin folded back as VPU rank-1 terms.  Same-session A/Bs (PERF.md margins
rule):

  onehot  — the bench.py headline path (batched one-hot, compact distance,
            single-blend) at the 256x64 operating point
  grouped — the wide-mover cliff geometry (single stream, per-group tables)
  gather  — batched dedup+fused (scene_hold shape: sources holding
            positions, gather-form kernel)

Each A/B reports ms/step (slope timing), the speedup, and the on-chip
max|diff| between layouts.  Run under the ambient axon env:

    python scripts/bench_lane512.py [--which onehot,grouped,gather]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# arm order for the three A/B loops; main()'s --reverse flips it so two runs
# bracket session drift (round-5 script review: fixed off-then-on ordering
# confounds the reported speedups with the relay's 0.6x-1.2x drift swings —
# same rationale as bench_tail_tree's --reverse)
ARM_ORDER = (False, True)


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
    for lane512 in ARM_ORDER:
        step = jax.jit(batched_chunk_fn_fused(
            cfg, num_blocks=nb, tb=tb_f, onehot=True, n_dist=nd,
            lane512=lane512,
        ))
        t0 = time.time()
        out, h2 = step(spectra, hists, feds, *xs)
        float(probe(out, h2))
        log(f"[onehot] lane512={lane512}: compile+first {time.time()-t0:.1f}s")
        outs[lane512] = np.asarray(out)

        def run(k, step=step):
            h2 = hists
            t0 = time.time()
            for _ in range(k):
                out, h2 = step(spectra, h2, feds, *xs)
            float(probe(out, h2))
            return time.time() - t0

        per = slope(run)
        bps = n_sources * nb / per
        results[lane512] = per
        log(f"[onehot] lane512={lane512}: {per*1e3:.3f} ms/step = {bps:,.0f} blocks/s")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[onehot] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_grouped():
    import jax
    import jax.numpy as jnp

    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.oracle.reference import render_oracle  # noqa: F401

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    # full-sphere mover: wide unique-filter set -> grouped tables
    rng = np.random.default_rng(1)
    b = 8192
    pos = np.stack([
        np.linspace(0, 4 * 360, b) % 360,
        40 * np.sin(np.linspace(0, 20, b)) + 20,
        np.full(b, 1.0),
    ], axis=1).astype(np.float32)
    sig = (rng.standard_normal(b * cfg.frames_per_buffer) * 0.2).astype(np.float32)

    results, outs = {}, {}
    for lane512 in ARM_ORDER:
        r = Renderer(db, cfg, chunk_blocks=b, dedup=False, fused=True,
                     lane512=lane512)
        t0 = time.time()
        out = r.render(sig, pos)
        log(f"[grouped] lane512={lane512}: compile+first {time.time()-t0:.1f}s "
            f"(onehot_grp programs: {list(r._fd_onehot_grp)}, "
            f"onehot: {list(r._fd_onehot)})")
        outs[lane512] = out

        def run(k, r=r):
            t0 = time.time()
            for _ in range(k):
                out = r.render(sig, pos)
            return time.time() - t0

        per = slope(run, k_short=2, k_long=8)
        results[lane512] = per
        log(f"[grouped] lane512={lane512}: {per*1e3:.1f} ms/render "
            f"({b/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[grouped] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_gather():
    import jax
    import jax.numpy as jnp

    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import BatchRenderer
    from jefferson_tpu.trajectory.trajectory import StaticPosition

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    # scene_hold shape: sources holding positions -> dedup+fused (gather form)
    s, nb = 128, 64
    rng = np.random.default_rng(2)
    signals = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2).astype(np.float32)
    positions = np.stack([
        StaticPosition(azi=(360 / s) * i, ele=5, r=0.9).sample(nb, cfg)
        for i in range(s)
    ])

    results, outs = {}, {}
    for lane512 in ARM_ORDER:
        br = BatchRenderer(db, chunk_blocks=nb, dedup=True, fused=True,
                           lane512=lane512)
        t0 = time.time()
        out = br.render(signals, positions)
        dedup_fused = any(k[1] is not None and k[2] is not None for k in br._jitted)
        log(f"[gather] lane512={lane512}: compile+first {time.time()-t0:.1f}s "
            f"(dedup+fused: {dedup_fused})")
        outs[lane512] = out

        def run(k, br=br):
            t0 = time.time()
            for _ in range(k):
                out = br.render(signals, positions)
            return time.time() - t0

        per = slope(run, k_short=2, k_long=10)
        results[lane512] = per
        log(f"[gather] lane512={lane512}: {per*1e3:.2f} ms/render "
            f"({s*nb/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[gather] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_fwd512():
    """lane512 on + fwd512 off/on: truncated (sub, 512) DFT bases (N=512
    forward matmuls) with the exact VPU Nyquist forward column."""
    import jax
    import jax.numpy as jnp

    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import cat_table, dedup_distance, pick_fused_tile
    from jefferson_tpu.pallas.fused_step import fused_step_onehot_xfade, to_lane512
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    n_sources, nb = 256, 64
    fpb = cfg.frames_per_buffer
    rng = np.random.default_rng(0)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(n_sources)
    ]
    hist = (q := cfg.pad_len // fpb - 1) * fpb
    streams = jnp.asarray(
        rng.standard_normal((n_sources, nb * fpb + hist)).astype(np.float32) * 0.2
    )
    tb = pick_fused_tile(n_sources * nb, nb)
    idx_old_np = np.stack([p.idx_old for p in plans])
    idx_last_np = np.stack([p.idx_new[-1] for p in plans])
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(idx_old_np, idx_last_np)
    dist = dedup_distance(
        np.concatenate([p.u_hi for p in plans]),
        np.concatenate([p.u_lo for p in plans]),
        np.concatenate([p.inv_frac for p in plans]),
    )
    nd = dist[4]
    b = n_sources * nb
    table = to_lane512(jnp.take(cat_table(spectra), jnp.asarray(uniq_ids), axis=0),
                       cfg.num_bins)
    w_old = jnp.asarray(np.concatenate([p.w_old for p in plans]))
    w_last = jnp.asarray(np.stack([p.w_new[-1] for p in plans]))
    xf = jnp.asarray(np.concatenate([p.xfade for p in plans]).astype(np.float32)[:, None])
    duh, dul, ddf = (jnp.asarray(dist[i][:, None]) for i in range(3))
    dsel = jnp.asarray(dist[3].astype(np.int32)[:, None])
    kw = dict(nb=nb, pad_len=cfg.pad_len, bins=cfg.num_bins, fpb=fpb, tb=tb,
              n_dist=nd, lane512=True)
    probe = jax.jit(lambda o: jnp.sum(o))
    results, outs = {}, {}
    for fwd512 in (False, True):
        def call(fwd512=fwd512):
            return fused_step_onehot_xfade(
                streams, duh, dul, ddf, table,
                jnp.asarray(ridx.reshape(b, 4)), w_old,
                jnp.asarray(ridx_last), w_last, xf, dsel=dsel,
                fwd512=fwd512, **kw)
        t0 = time.time()
        y = call()
        float(probe(y))
        log(f"[fwd512] fwd512={fwd512}: compile+first {time.time()-t0:.1f}s")
        outs[fwd512] = np.asarray(y)

        def run(k):
            t0 = time.time()
            for _ in range(k):
                y = call()
            float(probe(y))
            return time.time() - t0

        per = slope(run)
        results[fwd512] = per
        log(f"[fwd512] fwd512={fwd512}: {per*1e3:.3f} ms/step "
            f"({n_sources*nb/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[fwd512] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def bench_fwd512_prod():
    """Production-path fwd512 A/B: the bench.py workload through
    batched_chunk_fn_fused(onehot, lane512 default on) with fwd512 off/on."""
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
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(
        np.stack([p.idx_old for p in plans]),
        np.stack([p.idx_new[-1] for p in plans]),
    )
    dist = dedup_distance(
        np.concatenate([p.u_hi for p in plans]),
        np.concatenate([p.u_lo for p in plans]),
        np.concatenate([p.inv_frac for p in plans]),
    )
    nd = dist[4]
    d_args = (jnp.asarray(dist[0]), jnp.asarray(dist[1]), jnp.asarray(dist[2]),
              jnp.asarray(dist[3].reshape(n_sources, nb)))
    xs = (
        jnp.asarray(uniq_ids), jnp.asarray(ridx), stack("w_old"),
        jnp.asarray(ridx_last),
        jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        stack("xfade"), *d_args,
    )
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))
    results, outs = {}, {}
    for fwd512 in (False, True):
        step = jax.jit(batched_chunk_fn_fused(
            cfg, num_blocks=nb, tb=tb_f, onehot=True, n_dist=nd,
            lane512=True, fwd512=fwd512,
        ))
        t0 = time.time()
        out, h2 = step(spectra, hists, feds, *xs)
        float(probe(out, h2))
        log(f"[fwdprod] fwd512={fwd512}: compile+first {time.time()-t0:.1f}s")
        outs[fwd512] = np.asarray(out)

        def run(k, step=step):
            h2 = hists
            t0 = time.time()
            for _ in range(k):
                out, h2 = step(spectra, h2, feds, *xs)
            float(probe(out, h2))
            return time.time() - t0

        per = slope(run)
        results[fwd512] = per
        log(f"[fwdprod] fwd512={fwd512}: {per*1e3:.3f} ms/step "
            f"({n_sources*nb/per:,.0f} blocks/s)")
    d = float(np.abs(outs[True] - outs[False]).max())
    log(f"[fwdprod] speedup {results[False]/results[True]:.3f}x, max|diff| {d:.3e}")
    return {"ms_off": results[False] * 1e3, "ms_on": results[True] * 1e3,
            "speedup": results[False] / results[True], "max_diff": d}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="onehot,grouped,gather")
    ap.add_argument("--reverse", action="store_true",
                    help="run the lane512=True arm FIRST (pair with a "
                         "normal-order run to bracket session drift)")
    args = ap.parse_args()
    if args.reverse:
        global ARM_ORDER
        ARM_ORDER = (True, False)
    import jax

    log("devices:", jax.devices())
    import json

    out = {}
    for name in args.which.split(","):
        fn = {"onehot": bench_onehot, "grouped": bench_grouped,
              "gather": bench_gather, "fwd512": bench_fwd512,
              "fwdprod": bench_fwd512_prod}[name.strip()]
        out[name.strip()] = fn()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
