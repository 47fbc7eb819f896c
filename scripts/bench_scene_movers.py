"""Grouped one-hot vs gather on WIDE-MOVER SCENES across tile geometries (TPU).

Workload: many sources spread over the full sphere, all moving every block
— the cross-source unique-filter set exceeds one compact table's VMEM gate
(MAX_ONEHOT_U).  Round 3 groups consecutive sources onto per-group table
slices inside the same dispatch (plan.compact_filter_ids_grouped_sources);
round 4 adds the GROUPED_MIN_TB dispatch policy (engine/batch.py): grouped
only at full-size (256-row) tiles, gather at shrunken tiles.

This script measures BOTH paths at the two geometry regimes the policy
distinguishes and reports whether the policy's choice is ever the slower
one (the round-3 verdict's acceptance bar):

  * 128 sources x 64-block steps  -> group-aligned tiles shrink (tb=128)
  * 16  sources x 256-block steps -> tiles stay at the flagship 256 rows

Run on the chip: python scripts/bench_scene_movers.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure_geometry(s: int, nb: int, cfg, db, seed: int = 1):
    """Measure gather vs grouped one-hot on an (s, nb) mover scene; returns
    a dict with per-path ms and the policy verdict, or None if grouping is
    not viable at this geometry."""
    from jefferson_tpu.engine.batch import (
        GROUPED_MIN_TB,
        _plan_source_groups,
        batched_chunk_fn_fused,
    )
    from jefferson_tpu.engine.plan import (
        compact_filter_ids,
        compact_filter_ids_grouped_sources,
        fed_stream,
        make_plan,
    )
    from jefferson_tpu.engine.renderer import pick_fused_tile
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    rng = np.random.default_rng(seed)
    plans = [
        make_plan(
            CircularOrbit(
                period_s=0.3 + 0.02 * (i % 9),
                ele=float(rng.uniform(-40, 85)),
                r=1.0,
                start_azi=float(rng.uniform(0, 360)),
            ).sample(nb, cfg),
            cfg,
        )
        for i in range(s)
    ]
    idx_old = np.stack([p.idx_old for p in plans])
    idx_last = np.stack([p.idx_new[-1] for p in plans])
    _, _, _, u_pad_all = compact_filter_ids(idx_old, idx_last)
    g_srcs, g_upad = _plan_source_groups(idx_old, idx_last, s, 1)
    if g_srcs is None:
        print(f"[{s}x{nb}] no viable source grouping (bucket {u_pad_all})",
              file=sys.stderr)
        return None
    # mirror the dispatcher's tile choice (engine/batch.py mover branch)
    tb_g = pick_fused_tile(s * nb, nb, max_tb=min(256, g_srcs * nb))
    if tb_g is None or tb_g % nb or (g_srcs * nb) % tb_g:
        tb_g = nb if nb % 8 == 0 and nb <= 256 else None
    if tb_g is None:
        print(f"[{s}x{nb}] no whole-source tile", file=sys.stderr)
        return None
    gt = (g_srcs * nb) // tb_g
    print(f"[{s}x{nb}] cross-source bucket {u_pad_all}; groups of {g_srcs} "
          f"sources, bucket {g_upad}, grouped tb={tb_g} ({gt} tiles/group)",
          file=sys.stderr)

    sigs = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2).astype(np.float32)
    feds = jnp.asarray(np.stack([fed_stream(sigs[i], nb, cfg) for i in range(s)]))
    hists = jnp.zeros((s, cfg.history_len), jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    tail = (stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"))
    w_old = stack("w_old")
    w_last = jnp.asarray(np.stack([p.w_new[-1] for p in plans]))
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    def prep(fn, head, last, label):
        """Compile + warm one arm; return a slope-timing closure so the two
        arms can be timed INTERLEAVED (ABBA) — the verdict below is
        machine-checked, and a fixed compile-then-time-each-arm order lets
        relay-session drift (observed 0.6x-1.2x swings, PERF.md tail_tree
        section) decide it (round-5 script review)."""
        t0 = time.time()
        out, h = fn(spectra, hists, feds, *head, w_old, last, w_last, *tail)
        float(probe(out, h))
        print(f"[{s}x{nb}] {label}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)

        def run(k):
            hh = hists
            t0 = time.time()
            for _ in range(k):
                out, hh = fn(spectra, hh, feds, *head, w_old, last, w_last, *tail)
            float(probe(out, hh))
            return time.time() - t0

        run(3)

        def slope():
            t_s, t_l = run(3), run(33)
            return (t_l - t_s) / 30

        return slope, np.asarray(out), label

    tb = pick_fused_tile(s * nb, nb)
    arm_g = None
    try:
        gather = jax.jit(batched_chunk_fn_fused(cfg, nb, tb=tb, onehot=False))
        arm_g = prep(
            gather, (jnp.asarray(idx_old),), jnp.asarray(idx_last), f"gather tb={tb}"
        )
    except Exception as e:
        # the gather-form kernel at nb=tb=256 sits ~0.4 MB over the 16 MB
        # scoped-VMEM edge in some compile sessions (observed round 4) —
        # production absorbs this via the strike ladder; here it is data
        print(f"[{s}x{nb}] gather tb={tb} failed to compile: "
              f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)

    uniq_ids, ridx, rlast = compact_filter_ids_grouped_sources(
        idx_old, idx_last, g_srcs, g_upad
    )
    arm_o = None
    try:
        grouped = jax.jit(
            batched_chunk_fn_fused(cfg, nb, tb=tb_g, onehot=True, group_tiles=gt)
        )
        arm_o = prep(
            grouped,
            (jnp.asarray(uniq_ids), jnp.asarray(ridx)),
            jnp.asarray(rlast),
            f"grouped tb={tb_g}",
        )
    except Exception as e:
        print(f"[{s}x{nb}] grouped tb={tb_g} failed to compile: "
              f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)

    # timing: ABBA when both arms compiled (g, o, o, g — pooled means cancel
    # linear session drift); single slope otherwise
    t_g = t_o = out_g = out_o = None
    if arm_g is not None and arm_o is not None:
        g1 = arm_g[0](); o1 = arm_o[0](); o2 = arm_o[0](); g2 = arm_g[0]()
        t_g, t_o = (g1 + g2) / 2, (o1 + o2) / 2
        out_g, out_o = arm_g[1], arm_o[1]
        for label, per, pair in ((arm_g[2], t_g, (g1, g2)),
                                 (arm_o[2], t_o, (o1, o2))):
            print(f"[{s}x{nb}] {label}: {per*1e3:.2f} ms / step "
                  f"({s*nb/per:,.0f} blocks/s; ABBA pair "
                  f"{pair[0]*1e3:.2f}/{pair[1]*1e3:.2f} ms)", file=sys.stderr)
    elif arm_g is not None:
        t_g, out_g = arm_g[0](), arm_g[1]
        print(f"[{s}x{nb}] {arm_g[2]}: {t_g*1e3:.2f} ms / step", file=sys.stderr)
    elif arm_o is not None:
        t_o, out_o = arm_o[0](), arm_o[1]
        print(f"[{s}x{nb}] {arm_o[2]}: {t_o*1e3:.2f} ms / step", file=sys.stderr)

    policy_pick = "grouped" if tb_g >= GROUPED_MIN_TB else "gather"
    picked_ms = t_o if policy_pick == "grouped" else t_g
    other_ms = t_g if policy_pick == "grouped" else t_o
    # the policy is wrong only when its pick ran measurably slower than an
    # AVAILABLE alternative; a path that cannot compile is not a choice
    policy_ok = picked_ms is not None and (
        other_ms is None or picked_ms <= other_ms * 1.05  # 5% noise band
    )
    res = {
        "geometry": f"{s}x{nb}",
        "tb_gather": tb,
        "tb_grouped": tb_g,
        "gather_ms": None if t_g is None else round(t_g * 1e3, 3),
        "grouped_ms": None if t_o is None else round(t_o * 1e3, 3),
        "grouped_vs_gather": (
            None if t_g is None or t_o is None else round(t_g / t_o, 3)
        ),
        "max_diff": (
            None if out_g is None or out_o is None
            else float(np.abs(out_o - out_g).max())
        ),
        "policy_pick": policy_pick,
        "policy_ok": bool(policy_ok),
    }
    print(f"[{s}x{nb}] policy picks {policy_pick} "
          f"({'OK' if res['policy_ok'] else 'SLOWER — revisit GROUPED_MIN_TB'}); "
          f"gather {res['gather_ms']} ms, grouped {res['grouped_ms']} ms, "
          f"max|diff|={res['max_diff']}", file=sys.stderr)
    return res


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    results = []
    for s, nb in ((128, 64), (16, 256)):
        r = measure_geometry(s, nb, cfg, db)
        if r is not None:
            results.append(r)
    print(json.dumps({"bench": "scene_movers_policy", "results": results}))
    return 0 if all(r["policy_ok"] for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
