"""Benchmark: sustained 128-sample blocks/sec on one chip (flagship pipeline).

Workload = BASELINE config 5: a batch of concurrent moving source streams
(crossfade active every block) through the full interpolating binaural
pipeline, state carried between steps like a production streaming service.
Inputs are staged on device (double-buffered IO in production); the
measurement is steady-state compute throughput.

Baseline: the reference GPU renders one 128-sample block in ~0.3 ms worst
case (reference: README.md:24) => ~3,333 blocks/s/GPU.  vs_baseline is the
ratio to that number.  North star (BASELINE.md): >=344,531 blocks/s/chip
(1000x real time).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    log("devices:", jax.devices())
    import jax.numpy as jnp

    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import batched_chunk_fn
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)

    # 256 concurrent streams (BASELINE config 5); 64 blocks per step is the
    # measured sweet spot for step granularity (32: 12.4k x RT, 64: 13.5k,
    # 128: 11.1k in one session — larger steps amortize dispatch until the
    # working set outgrows residency)
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
    from jefferson_tpu.engine.renderer import fused_supported, pick_fused_tile

    tb_f = pick_fused_tile(n_sources * nb, nb) if fused_supported() else None
    if tb_f is not None:
        from jefferson_tpu.engine.batch import batched_chunk_fn_fused
        from jefferson_tpu.engine.plan import compact_filter_ids

        idx_old_np = np.stack([p.idx_old for p in plans])
        idx_last_np = np.stack([p.idx_new[-1] for p in plans])
        uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(idx_old_np, idx_last_np)
        from jefferson_tpu.pallas.fused_step import MAX_ONEHOT_U

        onehot = u_pad <= MAX_ONEHOT_U
        log(f"using fused Pallas step kernel (tile {tb_f}, "
            f"{'one-hot compact table U=' + str(u_pad) if onehot else 'gather blend'})")
        if onehot:
            head = (jnp.asarray(uniq_ids), jnp.asarray(ridx))
            last = jnp.asarray(ridx_last)
        else:
            head = (jnp.asarray(idx_old_np),)
            last = jnp.asarray(idx_last_np)
        # compact distance (round 4): constant-radius workloads pass the
        # (8,) unique-triple arrays + per-block selector (bit-identical;
        # renderer.dedup_distance — same planning the production dispatch does)
        from jefferson_tpu.engine.renderer import dedup_distance

        dist = dedup_distance(
            np.concatenate([p.u_hi for p in plans]),
            np.concatenate([p.u_lo for p in plans]),
            np.concatenate([p.inv_frac for p in plans]),
        )
        nd = None if dist is None else dist[4]
        if dist is not None:
            log(f"compact distance: {nd} unique (u_hi, u_lo, inv_frac) triples")
            d_args = (jnp.asarray(dist[0]), jnp.asarray(dist[1]),
                      jnp.asarray(dist[2]),
                      jnp.asarray(dist[3].reshape(n_sources, nb)))
        else:
            d_args = (stack("u_hi"), stack("u_lo"), stack("inv_frac"))
        xs = (
            *head, stack("w_old"),
            last,
            jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
            stack("xfade"), *d_args,
        )
        step = jax.jit(batched_chunk_fn_fused(cfg, num_blocks=nb, tb=tb_f,
                                              onehot=onehot, n_dist=nd))
    else:
        xs = (
            stack("idx_new"), stack("w_new"), stack("idx_old"), stack("w_old"),
            stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"),
        )
        step = jax.jit(batched_chunk_fn(cfg, num_blocks=nb, with_xfade=True))
    # NOTE: jax.block_until_ready does not reliably synchronize on the axon
    # relay backend, so completion is forced by fetching a scalar reduction
    # of the final outputs (4-byte transfer), and throughput is taken from
    # the slope between a short and a long run, cancelling the fixed
    # dispatch/roundtrip cost.
    probe = jax.jit(lambda o, h: jnp.sum(o) + jnp.sum(h))

    t0 = time.time()
    try:
        out, h2 = step(spectra, hists, feds, *xs)
        float(probe(out, h2))
    except Exception as e:
        if tb_f is None:
            raise
        # the remote Mosaic compile service is flaky (HTTP 500s observed);
        # the benchmark must not die with it — fall back to the XLA step
        log(f"fused kernel compile failed ({type(e).__name__}); using XLA step")
        xs = (
            stack("idx_new"), stack("w_new"), stack("idx_old"), stack("w_old"),
            stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"),
        )
        step = jax.jit(batched_chunk_fn(cfg, num_blocks=nb, with_xfade=True))
        out, h2 = step(spectra, hists, feds, *xs)
        float(probe(out, h2))
    log(f"compile+first step: {time.time()-t0:.1f}s")

    def run(k):
        h2 = hists
        t0 = time.time()
        for _ in range(k):
            out, h2 = step(spectra, h2, feds, *xs)
        float(probe(out, h2))  # forces the whole dependency chain
        return time.time() - t0

    run(4)  # warm
    # median of repeated slope estimates: single-estimate numbers moved
    # ~1.5% between driver sessions (round-4 verdict weak #3 — the repo
    # headline must be the reproducible capture, not the best session).
    # 9 repeats (~0.3 s each): one relay hiccup per session was observed to
    # skew a 3-sample median by ~30% (['1.54','1.59','1.14'] ms in one run),
    # and a later session put FOUR hiccups in five samples
    # (['1.29','0.64','0.79','2.23','1.88'] ms — bimodal, median 1.6x the
    # fast mode); the median of 9 tolerates up to 4 skewed estimates
    k_short, k_long = 4, 84
    estimates = []
    for _ in range(9):
        t_short, t_long = run(k_short), run(k_long)
        estimates.append((t_long - t_short) / (k_long - k_short))
    per_step = float(np.median(estimates))
    bps = n_sources * nb / per_step
    rt = bps * cfg.frames_per_buffer / cfg.sample_rate
    log(
        f"steady state: {per_step*1e3:.2f} ms per {n_sources}x{nb}-block step "
        f"(median of {len(estimates)}: {[f'{e*1e3:.2f}' for e in estimates]} ms) "
        f"-> {bps:,.0f} blocks/s/chip = {rt:,.0f}x real time"
    )

    # parity spot check against the oracle, through the very function being
    # measured: one fresh step of batched_chunk_fn, source 0's blocks vs the
    # NumPy oracle on the same signal/trajectory
    try:
        from jefferson_tpu.oracle.reference import render_oracle

        out1, _ = step(spectra, hists, feds, *xs)
        got = np.asarray(out1[0]).reshape(nb * cfg.frames_per_buffer, 2)
        pos0 = CircularOrbit(period_s=0.4, ele=5, r=1.0).sample(nb, cfg)
        want = render_oracle(np.asarray(feds[0]), db, [tuple(p) for p in pos0], cfg)
        rms = float(np.sqrt(np.mean((got - want) ** 2)))
        log(f"parity (batched_chunk_fn vs oracle): rms = {rms:.2e} (budget 1e-4)")
        assert rms < 1e-4, f"bench parity outside budget: rms={rms:.2e}"
    except AssertionError:
        raise
    except Exception as e:  # parity reporting must not kill the bench
        log("parity check skipped:", e)
        rms = None

    result = {
        "metric": "blocks_per_sec_per_chip",
        "value": round(bps, 1),
        "unit": "128-sample 44.1kHz blocks/s/chip",
        "vs_baseline": round(bps / 3333.3, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # transient TPU-relay faults (FailedPrecondition
        # mid-fetch) wedge the in-process backend; retry once fresh
        import os
        import traceback

        if os.environ.get("JEFFERSON_BENCH_RETRY") != "1":
            traceback.print_exc()
            log("transient backend failure; retrying in a fresh process")
            env = {**os.environ, "JEFFERSON_BENCH_RETRY": "1"}
            os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
        raise
