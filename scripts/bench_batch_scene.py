"""Measure the dedup+fused composition on a MULTI-SOURCE scene (TPU).

Workload: the reference's multi-source callback shape (reference:
Jefferson/src/Audio.cu:98-158) — S concurrent sources, each holding its own
position (the common scene case), through the batched chunk fns:

  direct        batched_chunk_fn          (every row blended)
  dedup         batched_chunk_fn_dedup    (unique rows only, XLA apply)
  dedup+fused   batched_chunk_fn_dedup_fused (round 3: + fused step kernel)

Slope timing (short vs long run, device-side scalar probe) like bench.py.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import (
        batched_chunk_fn,
        batched_chunk_fn_dedup,
        batched_chunk_fn_dedup_fused,
    )
    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import pick_fused_tile

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    s, nb = 128, 64  # 8192 rows/step, bench.py's step granularity

    rng = np.random.default_rng(0)
    positions = np.stack([
        np.stack([
            np.full(nb, float(rng.integers(0, 360))),
            np.full(nb, float(rng.integers(-40, 90))),
            np.full(nb, 0.5 + 0.5 * rng.random()),
        ], axis=1)
        for _ in range(s)
    ])
    plans = [make_plan(positions[i], cfg, initial_old=(0.0, 0.0)) for i in range(s)]
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
    print(f"{s} sources x {nb} blocks, {u} unique blend rows (pad {u_pad})",
          file=sys.stderr)

    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    tail = (stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"))
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    def bench(fn, mid, label):
        t0 = time.time()
        out, h = fn(spectra, hists, feds, *mid, *tail)
        float(probe(out, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            hh = hists
            t0 = time.time()
            for _ in range(k):
                out, hh = fn(spectra, hh, feds, *mid, *tail)
            float(probe(out, hh))
            return time.time() - t0

        run(3)
        t_s, t_l = run(3), run(33)
        per = (t_l - t_s) / 30
        print(f"{label}: {per*1e3:.2f} ms / {s}x{nb}-block step "
              f"({s*nb/per:,.0f} blocks/s)", file=sys.stderr)
        return per, np.asarray(out)

    direct = jax.jit(batched_chunk_fn(cfg, nb, with_xfade=True))
    dd = jax.jit(batched_chunk_fn_dedup(cfg, nb, with_xfade=True))
    t_direct, out_direct = bench(
        direct,
        (stack("idx_new"), stack("w_new"), stack("idx_old"), stack("w_old")),
        "direct     ",
    )
    t_dedup, out_dedup = bench(
        dd, (jnp.asarray(uniq_idx), jnp.asarray(uniq_w), jnp.asarray(inv)), "dedup      "
    )
    print("dedup bit-identical:", np.array_equal(out_direct, out_dedup), file=sys.stderr)

    tb = pick_fused_tile(s * nb, nb)
    df = jax.jit(batched_chunk_fn_dedup_fused(cfg, nb, tb=tb))
    t_df, out_df = bench(
        df,
        (jnp.asarray(uniq_idx), jnp.asarray(uniq_w),
         jnp.asarray(np.ascontiguousarray(inv[:, :nb])),
         jnp.asarray(np.ascontiguousarray(inv[:, nb]))),
        f"dedup+fused (tb={tb})",
    )
    d = np.abs(out_df - out_direct).max()
    print(f"dedup+fused vs direct: max|diff|={d:.3e}", file=sys.stderr)
    print(f"speedups: dedup {t_direct/t_dedup:.2f}x, "
          f"dedup+fused {t_direct/t_df:.2f}x (vs dedup {t_dedup/t_df:.2f}x)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
