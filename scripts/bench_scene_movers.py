"""Measure grouped one-hot vs gather on a WIDE-MOVER SCENE (TPU).

Workload: many sources spread over the full sphere, all moving every block
— the cross-source unique-filter set exceeds one compact table's VMEM gate
(MAX_ONEHOT_U), the case that previously fell back to the gather blend.
Round 3 groups consecutive sources onto per-group table slices inside the
same dispatch (plan.compact_filter_ids_grouped_sources).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import _plan_source_groups, batched_chunk_fn_fused
    from jefferson_tpu.engine.plan import (
        compact_filter_ids,
        compact_filter_ids_grouped_sources,
        fed_stream,
        make_plan,
    )
    from jefferson_tpu.engine.renderer import pick_fused_tile
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    s, nb = 128, 64

    rng = np.random.default_rng(1)
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
        print(f"no viable source grouping (cross-source bucket {u_pad_all}, "
              f"even single-source sets exceed the VMEM gate) — nothing to "
              f"measure", file=sys.stderr)
        return 1
    print(f"{s} movers x {nb} blocks: cross-source bucket {u_pad_all}; "
          f"groups of {g_srcs} sources, bucket {g_upad}", file=sys.stderr)

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

    def bench(fn, head, last, label):
        t0 = time.time()
        out, h = fn(spectra, hists, feds, *head, w_old, last, w_last, *tail)
        float(probe(out, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            hh = hists
            t0 = time.time()
            for _ in range(k):
                out, hh = fn(spectra, hh, feds, *head, w_old, last, w_last, *tail)
            float(probe(out, hh))
            return time.time() - t0

        run(3)
        t_s, t_l = run(3), run(33)
        per = (t_l - t_s) / 30
        print(f"{label}: {per*1e3:.2f} ms / {s}x{nb}-block step "
              f"({s*nb/per:,.0f} blocks/s)", file=sys.stderr)
        return per, np.asarray(out)

    tb = pick_fused_tile(s * nb, nb)
    gather = jax.jit(batched_chunk_fn_fused(cfg, nb, tb=tb, onehot=False))
    t_g, out_g = bench(
        gather, (jnp.asarray(idx_old),), jnp.asarray(idx_last), f"gather (tb={tb})   "
    )

    tb_g = pick_fused_tile(s * nb, nb, max_tb=g_srcs * nb)
    if tb_g % nb or (g_srcs * nb) % tb_g:  # tiles own whole sources
        tb_g = nb
    gt = (g_srcs * nb) // tb_g
    uniq_ids, ridx, rlast = compact_filter_ids_grouped_sources(
        idx_old, idx_last, g_srcs, g_upad
    )
    grouped = jax.jit(
        batched_chunk_fn_fused(cfg, nb, tb=tb_g, onehot=True, group_tiles=gt)
    )
    t_o, out_o = bench(
        grouped,
        (jnp.asarray(uniq_ids), jnp.asarray(ridx)),
        jnp.asarray(rlast),
        f"grouped onehot (tb={tb_g}, {gt} tiles/group)",
    )
    print(f"grouped vs gather: {t_g/t_o:.2f}x, max|diff|={np.abs(out_o-out_g).max():.3e}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
