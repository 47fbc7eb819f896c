"""Measure the one-hot sub-chunking win past the 256-unique-filter cliff (TPU).

Workload: the sweep gate's full-sphere per-block mover (bench.sweep
mover_positions) over 8192 blocks — far more than MAX_ONEHOT_U unique
filters per 8192-block chunk, the case that used to abandon the one-hot
blend entirely and pay the full gather cost (round-2 verdict item 4).

Compared (all through the renderer-level chunk fns, hist carried between
sub-chunks, slope timing):

  gather@8192   _fd_complex_chunk_fused, one 8192-block chunk (old behavior)
  gather@cs     same kernel at the sub-chunk size (isolates chunking cost)
  onehot@cs     _fd_complex_chunk_onehot at the planned sub-chunk size
  grouped@8192  _fd_complex_chunk_onehot_grouped: per-group tables inside
                ONE dispatch (the round-3 design; host sub-chunking was
                measured 5.3x slower through the relay)
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
    from jefferson_tpu.bench.sweep import mover_positions
    from jefferson_tpu.engine.plan import compact_filter_ids, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import (
        _fd_complex_chunk_fused,
        _fd_complex_chunk_onehot,
        pick_fused_tile,
        plan_onehot_chunking,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    b = 8192

    pos = mover_positions(b)
    plan = make_plan(pos, cfg, initial_old=(0.0, 0.0))
    total_u = len(np.unique(plan.idx_new))
    cs, u_pad = plan_onehot_chunking(plan, b, b, tb=pick_fused_tile(b, b))
    print(f"{b} blocks, {total_u} unique filters total; "
          f"one-hot plan: sub-chunk {cs}, bucket {u_pad}", file=sys.stderr)

    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(b * cfg.frames_per_buffer) * 0.2).astype(np.float32)
    fed_all = fed_stream(sig, b, cfg)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    fpb = cfg.frames_per_buffer
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    def chunk_args(start, stop, nb):
        sl = slice(start, stop)
        last_i = plan.idx_new[stop - 1 : stop]
        last_w = plan.w_new[stop - 1 : stop]
        return {
            "fed": jnp.asarray(fed_all[start * fpb : stop * fpb]),
            "idx_old": jnp.asarray(plan.idx_old[sl]),
            "w_old": jnp.asarray(plan.w_old[sl]),
            "last_i": jnp.asarray(last_i),
            "last_w": jnp.asarray(last_w),
            "tail": (
                jnp.asarray(plan.xfade[sl]),
                jnp.asarray(plan.u_hi[sl]),
                jnp.asarray(plan.u_lo[sl]),
                jnp.asarray(plan.inv_frac[sl]),
            ),
        }

    def bench_gather(nb, label):
        tb = pick_fused_tile(nb, nb)
        fn = jax.jit(functools.partial(
            _fd_complex_chunk_fused, config=cfg, num_blocks=nb, tb=tb))
        chunks = [chunk_args(st, st + nb, nb) for st in range(0, b, nb)]

        def full_pass():
            hist = jnp.zeros(cfg.history_len, jnp.float32)
            outs = None
            for c in chunks:
                outs, hist = fn(spectra, hist, c["fed"], c["idx_old"], c["w_old"],
                                c["last_i"], c["last_w"], *c["tail"])
            return outs, hist

        t0 = time.time()
        o, h = full_pass()
        float(probe(o, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            t0 = time.time()
            for _ in range(k):
                o, h = full_pass()
            float(probe(o, h))
            return time.time() - t0

        run(2)
        t_s, t_l = run(2), run(12)
        per = (t_l - t_s) / 10
        print(f"{label}: {per*1e3:.2f} ms / {b} blocks ({b/per:,.0f} blocks/s)",
              file=sys.stderr)
        return per, np.asarray(o)

    def bench_onehot(nb, bucket, label):
        tb = pick_fused_tile(nb, nb)
        fn = jax.jit(functools.partial(
            _fd_complex_chunk_onehot, config=cfg, num_blocks=nb, tb=tb))
        chunks = []
        for st in range(0, b, nb):
            c = chunk_args(st, st + nb, nb)
            uniq_ids, ridx, ridx_last, _ = compact_filter_ids(
                plan.idx_old[st : st + nb], plan.idx_new[st + nb - 1 : st + nb],
                u_pad=bucket,
            )
            c.update(uniq_ids=jnp.asarray(uniq_ids), ridx=jnp.asarray(ridx),
                     ridx_last=jnp.asarray(ridx_last))
            chunks.append(c)

        def full_pass():
            hist = jnp.zeros(cfg.history_len, jnp.float32)
            outs = None
            for c in chunks:
                outs, hist = fn(spectra, hist, c["fed"], c["uniq_ids"], c["ridx"],
                                c["w_old"], c["ridx_last"], c["last_w"], *c["tail"])
            return outs, hist

        t0 = time.time()
        o, h = full_pass()
        float(probe(o, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            t0 = time.time()
            for _ in range(k):
                o, h = full_pass()
            float(probe(o, h))
            return time.time() - t0

        run(2)
        t_s, t_l = run(2), run(12)
        per = (t_l - t_s) / 10
        print(f"{label}: {per*1e3:.2f} ms / {b} blocks ({b/per:,.0f} blocks/s)",
              file=sys.stderr)
        return per, np.asarray(o)

    def bench_grouped(label):
        from jefferson_tpu.engine.plan import compact_filter_ids_grouped
        from jefferson_tpu.engine.renderer import _fd_complex_chunk_onehot_grouped

        tb = pick_fused_tile(b, b)
        fn = jax.jit(functools.partial(
            _fd_complex_chunk_onehot_grouped, config=cfg, num_blocks=b,
            tb=tb, group_tiles=cs // tb, u_pad=u_pad))
        c = chunk_args(0, b, b)
        uniq_ids, ridx, rbnd = compact_filter_ids_grouped(
            plan.idx_old, plan.idx_new[-1:], cs, tb, u_pad)
        wbnd = np.concatenate([plan.w_old[tb::tb], plan.w_new[-1:]])
        args = (jnp.asarray(uniq_ids), jnp.asarray(ridx), c["w_old"],
                jnp.asarray(rbnd), jnp.asarray(wbnd))
        hist0 = jnp.zeros(cfg.history_len, jnp.float32)

        t0 = time.time()
        o, h = fn(spectra, hist0, c["fed"], *args, *c["tail"])
        float(probe(o, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            t0 = time.time()
            for _ in range(k):
                o, h = fn(spectra, hist0, c["fed"], *args, *c["tail"])
            float(probe(o, h))
            return time.time() - t0

        run(2)
        t_s, t_l = run(2), run(12)
        per = (t_l - t_s) / 10
        print(f"{label}: {per*1e3:.2f} ms / {b} blocks ({b/per:,.0f} blocks/s)",
              file=sys.stderr)
        return per, np.asarray(o)

    t_g_big, out_g_big = bench_gather(b, f"gather@{b}   ")
    t_g_cs, out_g_cs = bench_gather(cs, f"gather@{cs}   ")
    t_oh, out_oh = bench_onehot(cs, u_pad, f"onehot@{cs}   ")
    t_gr, out_gr = bench_grouped(f"grouped@{b} (tables of {u_pad} per {cs} blocks)")

    print(f"gather sub-chunk cost: {t_g_cs/t_g_big:.2f}x of one big chunk",
          file=sys.stderr)
    print(f"onehot@{cs} vs gather@{b}: {t_g_big/t_oh:.2f}x "
          f"(vs gather@{cs}: {t_g_cs/t_oh:.2f}x)", file=sys.stderr)
    print(f"grouped@{b} vs gather@{b}: {t_g_big/t_gr:.2f}x", file=sys.stderr)
    print(f"onehot vs gather last-chunk max|diff|: "
          f"{np.abs(out_oh - out_g_cs).max():.3e}", file=sys.stderr)
    print(f"grouped vs gather@{b} full-render max|diff|: "
          f"{np.abs(out_gr - out_g_big).max():.3e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
