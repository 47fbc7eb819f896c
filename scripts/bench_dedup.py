"""Measure the static-segment dedup win on the reference benchmark workload.

Workload: the reference's benchmarkTesting trajectory — 172 blocks per
position, azimuth += 5 per step (reference: Jefferson/src/precision_test.cu:
2093-2148) — through the matmul-backend FD chunk, direct vs dedup, on the
attached TPU.  Slope timing (short vs long run, device-side scalar probe)
like bench.py; see PERF.md for methodology notes.
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
    from jefferson_tpu.engine.plan import dedup_rows, fed_stream, make_plan
    from jefferson_tpu.engine.renderer import _fd_complex_chunk, _fd_complex_chunk_dedup
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    print("devices:", jax.devices(), file=sys.stderr)
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    nb = 8192  # blocks per step (one chunk)

    traj = AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5.0,
                        blocks_per_step=172, num_steps=nb // 172)
    pos = traj.sample(nb, cfg)
    plan = make_plan(pos, cfg, initial_old=(0.0, 0.0))
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
    reps = u_pad - u
    uniq_idx = np.concatenate([uniq_idx, np.repeat(uniq_idx[-1:], reps, axis=0)])
    uniq_w = np.concatenate([uniq_w, np.repeat(uniq_w[-1:], reps, axis=0)])
    print(f"{nb} blocks, {u} unique blend rows (pad {u_pad})", file=sys.stderr)

    direct = jax.jit(functools.partial(
        _fd_complex_chunk, config=cfg, num_blocks=nb, backend="matmul", with_xfade=True))
    dedup = jax.jit(functools.partial(
        _fd_complex_chunk_dedup, config=cfg, num_blocks=nb, with_xfade=True))
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    args_direct = (jnp.asarray(plan.idx_new), jnp.asarray(plan.w_new),
                   jnp.asarray(plan.idx_old), jnp.asarray(plan.w_old))
    args_dedup = (jnp.asarray(uniq_idx), jnp.asarray(uniq_w), jnp.asarray(inv))
    tail = (jnp.asarray(plan.xfade), jnp.asarray(plan.u_hi),
            jnp.asarray(plan.u_lo), jnp.asarray(plan.inv_frac))

    def bench(fn, mid, label):
        t0 = time.time()
        out, h = fn(spectra, hist, fed, *mid, *tail)
        float(probe(out, h))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

        def run(k):
            hh = hist
            t0 = time.time()
            for _ in range(k):
                out, hh = fn(spectra, hh, fed, *mid, *tail)
            float(probe(out, hh))
            return time.time() - t0

        run(3)
        t_s, t_l = run(3), run(33)
        per = (t_l - t_s) / 30
        print(f"{label}: {per*1e3:.2f} ms / {nb}-block step "
              f"({nb/per:,.0f} blocks/s)", file=sys.stderr)
        return per, np.asarray(out)

    t_direct, out_direct = bench(direct, args_direct, "direct")
    t_dedup, out_dedup = bench(dedup, args_dedup, "dedup ")
    same = np.array_equal(out_direct, out_dedup)
    print(f"bit-identical outputs: {same}", file=sys.stderr)
    print(f"speedup: {t_direct/t_dedup:.2f}x on the 172-blocks/position workload",
          file=sys.stderr)

    # dedup + fused kernel composition (TPU only)
    from jefferson_tpu.engine.renderer import (
        _fd_complex_chunk_dedup_fused, fused_supported, pick_fused_tile,
    )

    tb_f = pick_fused_tile(nb, nb) if fused_supported() else None
    if tb_f is not None:
        dfused = jax.jit(functools.partial(
            _fd_complex_chunk_dedup_fused, config=cfg, num_blocks=nb, tb=tb_f))
        args_df = (jnp.asarray(uniq_idx), jnp.asarray(uniq_w),
                   jnp.asarray(inv[:nb]), jnp.asarray(inv[nb : nb + 1]))
        t_df, out_df = bench(dfused, args_df, "dedup+fused")
        d = np.abs(out_df - out_direct).max()
        print(f"dedup+fused vs direct: max|diff|={d:.3e}; "
              f"{t_direct/t_df:.2f}x vs direct, {t_dedup/t_df:.2f}x vs dedup",
              file=sys.stderr)

        # + compact distance (round 4): what the production Renderer runs
        from jefferson_tpu.engine.renderer import dedup_distance

        dist = dedup_distance(plan.u_hi, plan.u_lo, plan.inv_frac)
        if dist is not None:
            nd = dist[4]
            print(f"compact distance: {nd} unique triples", file=sys.stderr)
            dfused_cd = jax.jit(functools.partial(
                _fd_complex_chunk_dedup_fused, config=cfg, num_blocks=nb,
                tb=tb_f, n_dist=nd))
            saved_tail = tail

            def bench_cd():
                nonlocal tail
                tail = (jnp.asarray(plan.xfade), jnp.asarray(dist[0]),
                        jnp.asarray(dist[1]), jnp.asarray(dist[2]),
                        jnp.asarray(dist[3]))
                try:
                    return bench(dfused_cd, args_df, "dedup+fused+cd")
                finally:
                    tail = saved_tail

            t_cd, out_cd = bench_cd()
            print(f"compact-distance vs dedup+fused: {t_df/t_cd:.2f}x, "
                  f"bit-identical: {np.array_equal(out_cd, out_df)}",
                  file=sys.stderr)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
