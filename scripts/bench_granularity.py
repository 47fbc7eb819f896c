"""Step-granularity sweep for the headline workload (TPU).

The round-1 sweep (32/64/128 blocks per step) predates the one-hot fused
kernel, whose VMEM/HBM profile differs; this re-measures (sources x blocks)
shapes with the CURRENT dispatch (one-hot table, or per-source-group tables
when a shape's unique set exceeds the gate) to pick bench.py's operating
point on evidence.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# nb=128 geometries OOM the scoped VMEM at u_pad=256 (measured: 17.65M vs
# the 16M limit — the orbit ring's full unique set is needed per table once
# a step spans the whole orbit), so the sweep varies SOURCES at the proven
# nb; more sources amortize dispatch the same way.
SHAPES = [(256, 64), (512, 64), (1024, 64), (512, 32), (2048, 64)]


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import _plan_source_groups, batched_chunk_fn_fused
    from jefferson_tpu.engine.plan import (
        compact_filter_ids,
        compact_filter_ids_grouped_sources,
        make_plan,
    )
    from jefferson_tpu.engine.renderer import pick_fused_tile
    from jefferson_tpu.pallas.fused_step import MAX_ONEHOT_U
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    rng = np.random.default_rng(0)
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    for s, nb in SHAPES:
      try:
        plans = [
            make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
            for i in range(s)
        ]
        hists = jnp.zeros((s, cfg.history_len), jnp.float32)
        feds = jnp.asarray(
            rng.standard_normal((s, nb * cfg.frames_per_buffer)).astype(np.float32) * 0.2
        )
        stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
        idx_old = np.stack([p.idx_old for p in plans])
        idx_last = np.stack([p.idx_new[-1] for p in plans])
        tb = pick_fused_tile(s * nb, nb)
        uniq_ids, ridx, rlast, u_pad = compact_filter_ids(idx_old, idx_last)
        gt = None
        mode = f"onehot U={u_pad}"
        if u_pad > MAX_ONEHOT_U:
            g_srcs, g_upad = _plan_source_groups(idx_old, idx_last, s, 1)
            tb = pick_fused_tile(s * nb, nb, max_tb=g_srcs * nb)
            if (g_srcs * nb) % tb:
                tb = nb
            gt = (g_srcs * nb) // tb
            uniq_ids, ridx, rlast = compact_filter_ids_grouped_sources(
                idx_old, idx_last, g_srcs, g_upad
            )
            mode = f"grouped U={g_upad} x{g_srcs}src"
        fn = jax.jit(batched_chunk_fn_fused(cfg, nb, tb=tb, onehot=True, group_tiles=gt))
        xs = (
            jnp.asarray(uniq_ids), jnp.asarray(ridx), stack("w_old"),
            jnp.asarray(rlast), jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
            stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"),
        )

        t0 = time.time()
        out, h = fn(spectra, hists, feds, *xs)
        float(probe(out, h))
        comp = time.time() - t0

        def run(k):
            hh = hists
            t0 = time.time()
            for _ in range(k):
                out, hh = fn(spectra, hh, feds, *xs)
            float(probe(out, hh))
            return time.time() - t0

        run(3)
        t_s, t_l = run(4), run(44)
        per = (t_l - t_s) / 40
        bps = s * nb / per
        print(
            f"{s:4d} x {nb:3d} (tb={tb:3d}, {mode:>22s}): {per*1e3:6.2f} ms/step "
            f"{bps:12,.0f} blocks/s  {bps*128/44100:8,.0f}x RT  (compile {comp:.0f}s)",
            file=sys.stderr,
        )
      except Exception as e:  # e.g. VMEM OOM at this geometry — keep sweeping
        lines = str(e).splitlines()
        print(f"{s:4d} x {nb:3d}: FAILED {type(e).__name__}: "
              f"{lines[0][:140] if lines else ''}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
