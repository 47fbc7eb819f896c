"""A/B the no-crossfade fast path on the hold-scene workload (TPU).

Workload: the steady-state multi-source scene step — S sources each holding
its position (the common scene/serving case; reference callback shape,
Jefferson/src/Audio.cu:98-158), chained batched dedup+fused steps whose
plans contain NO crossfading block (after the first step a hold scene never
crossfades again; BatchRenderer dispatches these chunks to the
``with_xfade=False`` programs since round 5).

Arms (ABBA ordering — PERF.md: relay-session drift penalizes whichever arm
runs later, so each arm runs once early and once late and the pair is
averaged):
  xfade   — the crossfade program fed all-False xfade rows (the pre-round-5
            behavior: both tail sets computed, old rows gathered)
  noxf    — the no-crossfade program (new rows only, half the tail MACs)

Geometries: 128x64 (tb=256, fully-fused fused_step path — the scene bench
shape) and 128x512 (tb=256 < nb: the fused_apply fallback path, the CLI's
default chunk_blocks=512 shape).

Usage: python scripts/bench_noxfade.py  (run on the TPU; forces nothing)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench_shape(cfg, db, s, nb, reps=30):
    from jefferson_tpu.engine.batch import batched_chunk_fn_dedup_fused
    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import pick_fused_tile

    rng = np.random.default_rng(0)
    # steady-state hold plans: old == new everywhere -> zero crossfades
    plans = [
        make_plan(
            np.stack([
                np.full(nb, float(rng.integers(0, 360))),
                np.full(nb, float(rng.integers(-40, 90))),
                np.full(nb, 0.5 + 0.5 * rng.random()),
            ], axis=1),
            cfg, initial_old=None,
        )
        for _ in range(s)
    ]
    assert not any(p.xfade.any() for p in plans), "steady state must not crossfade"
    sigs = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2).astype(np.float32)
    feds = jnp.asarray(np.stack([fed_stream(sigs[i], nb, cfg) for i in range(s)]))
    hists = jnp.zeros((s, cfg.history_len), jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    ei = np.concatenate([np.stack([p.idx_old[:1] for p in plans], 0),
                         np.stack([p.idx_new for p in plans], 0)], axis=1)
    ew = np.concatenate([np.stack([p.w_old[:1] for p in plans], 0),
                         np.stack([p.w_new for p in plans], 0)], axis=1)
    rows = ei.shape[0] * ei.shape[1]
    uniq_idx, uniq_w, inv = dedup_rows(ei.reshape(rows, 4), ew.reshape(rows, 4))
    u = uniq_idx.shape[0]
    u_pad = max(8, 1 << int(np.ceil(np.log2(u))))
    uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], u_pad - u, 0)])
    uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], u_pad - u, 0)])
    inv = inv.reshape(s, nb + 1)
    tb = pick_fused_tile(s * nb, nb)
    assert tb is not None, f"no fused tile for ({s}x{nb}) — pick other shapes"
    path = "fused_step" if tb % nb == 0 else "fused_apply fallback"
    print(f"--- {s}x{nb}, {u} unique rows (pad {u_pad}), tb={tb} ({path})",
          file=sys.stderr)

    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    tail = (stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"))
    uq, uw = jnp.asarray(uniq_idx), jnp.asarray(uniq_w)
    inv_old = jnp.asarray(np.ascontiguousarray(inv[:, :nb]))
    inv_new = jnp.asarray(np.ascontiguousarray(inv[:, 1:]))
    inv_last = jnp.asarray(np.ascontiguousarray(inv[:, nb]))
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    fn_xf = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb, with_xfade=True))
    fn_nx = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb, with_xfade=False))
    arms = {
        "xfade": (fn_xf, (uq, uw, inv_old, inv_last)),
        "noxf ": (fn_nx, (uq, uw, inv_new, inv_last)),
    }

    outs = {}
    for label, (fn, mid) in arms.items():
        t0 = time.time()
        out, h = fn(spectra, hists, feds, *mid, *tail)
        float(probe(out, h))
        outs[label] = np.asarray(out)
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    d = np.abs(outs["xfade"] - outs["noxf "]).max()
    print(f"bit-identity: max|diff| = {d:.3e}", file=sys.stderr)

    def run(fn, mid, k):
        hh = hists
        t0 = time.time()
        for _ in range(k):
            out, hh = fn(spectra, hh, feds, *mid, *tail)
        float(probe(out, hh))
        return time.time() - t0

    def slope(label):
        fn, mid = arms[label]
        run(fn, mid, 3)
        t_s, t_l = run(fn, mid, 3), run(fn, mid, 3 + reps)
        return (t_l - t_s) / reps

    # ABBA: each arm once early, once late; average the pair
    order = ["xfade", "noxf ", "noxf ", "xfade"]
    times = {"xfade": [], "noxf ": []}
    for label in order:
        times[label].append(slope(label))
    per = {k: sum(v) / len(v) for k, v in times.items()}
    for k, v in times.items():
        print(f"{k}: {per[k]*1e3:.3f} ms/step (runs: "
              + ", ".join(f"{x*1e3:.3f}" for x in v)
              + f") = {s*nb/per[k]:,.0f} blocks/s", file=sys.stderr)
    sp = per["xfade"] / per["noxf "]
    print(f"no-crossfade speedup: {sp:.3f}x", file=sys.stderr)
    return {"s": s, "nb": nb, "tb": tb, "path": path,
            "ms_xfade": per["xfade"] * 1e3, "ms_noxf": per["noxf "] * 1e3,
            "speedup": sp, "max_diff": float(d)}


def bench_sparse(cfg, db, reps=30):
    """Sparse-crossfade side-pass on the REFERENCE-cadence workload: one
    source, 8192-block chunks, position steps every 172 blocks (48
    crossfading rows per chunk) — the single-source dedup+fused chunk fn,
    crossfade program vs no-crossfade kernel + XLA side-pass."""
    import functools

    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import (
        _fd_complex_chunk_dedup_fused,
        pick_fused_tile,
    )
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    nb = 8192
    traj = AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5.0,
                        blocks_per_step=172, num_steps=nb // 172)
    plan = make_plan(traj.sample(nb, cfg), cfg, initial_old=(0.0, 0.0))
    ncf = int(plan.xfade.sum())
    n_cf = max(8, 1 << int(np.ceil(np.log2(ncf))))
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(nb * cfg.frames_per_buffer) * 0.2).astype(np.float32)
    fed = jnp.asarray(fed_stream(sig, nb, cfg))
    hist = jnp.zeros(cfg.history_len, jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    ext_idx = np.concatenate([plan.idx_old[:1], plan.idx_new])
    ext_w = np.concatenate([plan.w_old[:1], plan.w_new])
    uniq_idx, uniq_w, inv = dedup_rows(ext_idx, ext_w)
    u = uniq_idx.shape[0]
    u_pad = max(8, 1 << int(np.ceil(np.log2(u))))
    uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], u_pad - u, 0)])
    uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], u_pad - u, 0)])
    tb = pick_fused_tile(nb, nb)
    assert tb is not None, f"no fused tile for 1x{nb} — pick another nb"
    print(f"--- 1x{nb} reference cadence: {ncf} crossfades (bucket {n_cf}), "
          f"{u} unique rows (pad {u_pad}), tb={tb}", file=sys.stderr)

    cfi = np.flatnonzero(plan.xfade)
    cfi = np.concatenate([cfi, np.repeat(cfi[-1:], n_cf - len(cfi))])
    uq, uw = jnp.asarray(uniq_idx), jnp.asarray(uniq_w)
    tail = (jnp.asarray(plan.xfade), jnp.asarray(plan.u_hi),
            jnp.asarray(plan.u_lo), jnp.asarray(plan.inv_frac))
    mk = lambda **kw: jax.jit(functools.partial(
        _fd_complex_chunk_dedup_fused, config=cfg, num_blocks=nb, tb=tb, **kw))
    arms = {
        "xfade ": (mk(), (uq, uw, jnp.asarray(inv[:nb]),
                          jnp.asarray(inv[nb : nb + 1]), *tail)),
        "sparse": (mk(with_xfade=False, n_cf=n_cf),
                   (uq, uw, jnp.asarray(inv[1 : nb + 1]),
                    jnp.asarray(inv[nb : nb + 1]), *tail, None,
                    jnp.asarray(cfi.astype(np.int32)),
                    jnp.asarray(inv[:nb][cfi]))),
    }
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))
    outs = {}
    for label, (fn, a) in arms.items():
        t0 = time.time()
        out, h = fn(spectra, hist, fed, *a)
        float(probe(out, h))
        outs[label] = np.asarray(out)
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    d = np.abs(outs["xfade "] - outs["sparse"]).max()
    print(f"sparse vs crossfade program: max|diff| = {d:.3e} "
          f"(XLA old-tail on the {ncf} crossfading rows only)", file=sys.stderr)

    def run(fn, a, k):
        hh = hist
        t0 = time.time()
        for _ in range(k):
            out, hh = fn(spectra, hh, fed, *a)
        float(probe(out, hh))
        return time.time() - t0

    def slope(label):
        fn, a = arms[label]
        run(fn, a, 3)
        t_s, t_l = run(fn, a, 3), run(fn, a, 3 + reps)
        return (t_l - t_s) / reps

    order = ["xfade ", "sparse", "sparse", "xfade "]
    times = {"xfade ": [], "sparse": []}
    for label in order:
        times[label].append(slope(label))
    per = {k: sum(v) / len(v) for k, v in times.items()}
    for k, v in times.items():
        print(f"{k}: {per[k]*1e3:.3f} ms/step (runs: "
              + ", ".join(f"{x*1e3:.3f}" for x in v)
              + f") = {nb/per[k]:,.0f} blocks/s", file=sys.stderr)
    sp = per["xfade "] / per["sparse"]
    print(f"sparse speedup: {sp:.3f}x", file=sys.stderr)
    return {"workload": "reference-cadence 8192", "n_cf": n_cf, "tb": tb,
            "ms_xfade": per["xfade "] * 1e3, "ms_sparse": per["sparse"] * 1e3,
            "speedup": sp, "max_diff": float(d)}


def bench_sparse_batched(cfg, db, s=16, nb=256, reps=30):
    """Batched sparse on the sweep's scene_hold cadence: S sources each
    stepping position every 172 blocks (1-2 crossfades per source per
    chunk), through batched_chunk_fn_dedup_fused — crossfade program vs
    sparse (ABBA)."""
    from jefferson_tpu.engine.batch import batched_chunk_fn_dedup_fused
    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import (
        _pad_cf_indices,
        _sparse_bucket,
        pick_fused_tile,
    )

    rng = np.random.default_rng(0)
    i = np.arange(nb)
    step = i // 172
    plans = [
        make_plan(
            np.stack([(sidx * (360.0 / s) + 5.0 * step) % 360.0,
                      np.full(nb, [0.0, 10.0, -20.0, 40.0][sidx % 4]),
                      np.full(nb, 0.5 + 0.1 * (sidx % 3))], 1),
            cfg, initial_old=(0.0, 0.0),
        )
        for sidx in range(s)
    ]
    ncf = int(sum(p.xfade.sum() for p in plans))
    n_cf = _sparse_bucket(ncf, s * nb)
    sigs = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2).astype(np.float32)
    feds = jnp.asarray(np.stack([fed_stream(sigs[k], nb, cfg) for k in range(s)]))
    hists = jnp.zeros((s, cfg.history_len), jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    ei = np.concatenate([np.stack([p.idx_old[:1] for p in plans], 0),
                         np.stack([p.idx_new for p in plans], 0)], axis=1)
    ew = np.concatenate([np.stack([p.w_old[:1] for p in plans], 0),
                         np.stack([p.w_new for p in plans], 0)], axis=1)
    rows = ei.shape[0] * ei.shape[1]
    uniq_idx, uniq_w, inv = dedup_rows(ei.reshape(rows, 4), ew.reshape(rows, 4))
    u = uniq_idx.shape[0]
    u_pad = max(8, 1 << int(np.ceil(np.log2(u))))
    uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], u_pad - u, 0)])
    uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], u_pad - u, 0)])
    inv = inv.reshape(s, nb + 1)
    tb = pick_fused_tile(s * nb, nb)
    assert tb is not None and n_cf is not None
    print(f"--- batched {s}x{nb} scene_hold cadence: {ncf} crossfades "
          f"(bucket {n_cf}), {u} unique rows (pad {u_pad}), tb={tb}",
          file=sys.stderr)

    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    xf_np = np.stack([p.xfade for p in plans])
    tail = (jnp.asarray(xf_np), stack("u_hi"), stack("u_lo"), stack("inv_frac"))
    uq, uw = jnp.asarray(uniq_idx), jnp.asarray(uniq_w)
    cfi = _pad_cf_indices(xf_np.reshape(-1), n_cf)
    fn_xf = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb, with_xfade=True))
    fn_sp = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb,
                                                 with_xfade=False, n_cf=n_cf))
    arms = {
        "xfade ": (fn_xf, (uq, uw,
                           jnp.asarray(np.ascontiguousarray(inv[:, :nb])),
                           jnp.asarray(np.ascontiguousarray(inv[:, nb])),
                           *tail)),
        "sparse": (fn_sp, (uq, uw,
                           jnp.asarray(np.ascontiguousarray(inv[:, 1:])),
                           jnp.asarray(np.ascontiguousarray(inv[:, nb])),
                           *tail, None,
                           jnp.asarray(cfi.astype(np.int32)),
                           jnp.asarray(inv[:, :nb].reshape(-1)[cfi]))),
    }
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))
    outs = {}
    for label, (fn, a) in arms.items():
        t0 = time.time()
        out, h = fn(spectra, hists, feds, *a)
        float(probe(out, h))
        outs[label] = np.asarray(out)
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    d = np.abs(outs["xfade "] - outs["sparse"]).max()
    print(f"sparse vs crossfade program: max|diff| = {d:.3e}", file=sys.stderr)

    def run(fn, a, k):
        hh = hists
        t0 = time.time()
        for _ in range(k):
            out, hh = fn(spectra, hh, feds, *a)
        float(probe(out, hh))
        return time.time() - t0

    def slope(label):
        fn, a = arms[label]
        run(fn, a, 3)
        t_s, t_l = run(fn, a, 3), run(fn, a, 3 + reps)
        return (t_l - t_s) / reps

    times = {"xfade ": [], "sparse": []}
    for label in ["xfade ", "sparse", "sparse", "xfade "]:
        times[label].append(slope(label))
    per = {k: sum(v) / len(v) for k, v in times.items()}
    for k, v in times.items():
        print(f"{k}: {per[k]*1e3:.3f} ms/step (runs: "
              + ", ".join(f"{x*1e3:.3f}" for x in v)
              + f") = {s*nb/per[k]:,.0f} blocks/s", file=sys.stderr)
    sp = per["xfade "] / per["sparse"]
    print(f"batched sparse speedup: {sp:.3f}x", file=sys.stderr)
    return {"workload": f"scene_hold cadence {s}x{nb}", "n_cf": n_cf, "tb": tb,
            "ms_xfade": per["xfade "] * 1e3, "ms_sparse": per["sparse"] * 1e3,
            "speedup": sp, "max_diff": float(d)}


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    results = [
        bench_shape(cfg, db, 128, 64),
        bench_shape(cfg, db, 128, 512, reps=6),
        bench_sparse(cfg, db),
        bench_sparse_batched(cfg, db),
    ]
    import json

    print(json.dumps({"bench": "noxfade", "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
