"""Blend-stage shootout on the real chip: XLA gathers vs Pallas DMA gather.

The HRTF blend is the biggest stage of the moving-source step (PERF.md).
All variants compute, per extended row b:

    acc[b] = w0*T[i0] + w1*T[i1] + w2*T[i2] + w3*T[i3]   (same fp order)

over the combined-plane table T (710, 4*bins) = [rl | il | rr | ir], and are
bit-identical.  Variants:

  xla16   — the production formulation: 4 separate (710, bins) planes,
            4 row-gathers each (16 gathers of width bins)
  xla4    — combined-plane table, 4 row-gathers of width 4*bins
  xla2pair— paired-row table (1420, 8*bins): row i = [T[i] | T[succ(i)]],
            row 710+i = [T[i] | T[i]]; the grid guarantees i1 in
            {i0, succ(i0)} (and i3 likewise), so 2 gathers fetch all 4
            brackets
  pallas  — double-buffered per-row async DMA from HBM into VMEM scratch,
            accumulate bracket k while bracket k+1 is in flight
            (the ROADMAP "DMA-gather" idea).  NOTE: a 2-D tiled HBM table
            cannot be row-sliced (Mosaic: "Slice shape along dimension 0
            must be aligned to tiling (8)"), so the table is stored flat
            (1-D) with rows padded to a lane multiple and DMA'd by offset.

Usage: python scripts/bench_blend_variants.py [R] [TB]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pallas_dma_blend(table_flat, idx, w, c_pad: int, tb: int = 256, interpret: bool = False):
    """table_flat (H*c_pad,) f32 HBM; idx (R,4) i32; w (R,4) f32 -> (R, c_pad).

    Per tile of TB rows: start all TB row DMAs for bracket k+1, wait bracket
    k's, then one vectorized weighted accumulate.  1-D layouts keep every
    DMA slice lane-aligned (c_pad is a multiple of 128).
    """
    r, _ = idx.shape
    assert r % tb == 0 and c_pad % 128 == 0

    def kernel(idx_ref, w_ref, table_ref, out_ref, scratch, sem):
        t = pl.program_id(0)
        base = t * tb

        def copy(j, k, slot):
            row = idx_ref[base + j, k]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row * c_pad, c_pad)],
                scratch.at[slot, pl.ds(j * c_pad, c_pad)],
                sem.at[slot],
            )

        def start(k, slot):
            jax.lax.fori_loop(0, tb, lambda j, _: (copy(j, k, slot).start(), 0)[1], 0)

        def wait(k, slot):
            jax.lax.fori_loop(0, tb, lambda j, _: (copy(j, k, slot).wait(), 0)[1], 0)

        start(0, 0)
        for k in range(4):
            if k + 1 < 4:
                start(k + 1, (k + 1) % 2)
            wait(k, k % 2)
            rows = scratch[k % 2].reshape(tb, c_pad)
            contrib = w_ref[:, k][:, None] * rows
            if k == 0:
                out_ref[:] = contrib
            else:
                out_ref[:] = out_ref[:] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // tb,),
        in_specs=[
            pl.BlockSpec((tb, 4), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # flat table stays in HBM
        ],
        out_specs=pl.BlockSpec((tb, c_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tb * c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, c_pad), jnp.float32),
        interpret=interpret,
    )(idx, w, table_flat)


def xla16(planes, idx, w):
    outs = []
    for t in planes:  # 4 planes, 4 gathers each
        acc = w[:, 0:1] * jnp.take(t, idx[:, 0], axis=0)
        for k in range(1, 4):
            acc = acc + w[:, k : k + 1] * jnp.take(t, idx[:, k], axis=0)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def xla4(table, idx, w):
    acc = w[:, 0:1] * jnp.take(table, idx[:, 0], axis=0)
    for k in range(1, 4):
        acc = acc + w[:, k : k + 1] * jnp.take(table, idx[:, k], axis=0)
    return acc


def xla2pair(pair_table, pid0, pid2, w, c):
    r0 = jnp.take(pair_table, pid0, axis=0)  # (R, 2C)
    r2 = jnp.take(pair_table, pid2, axis=0)
    acc = w[:, 0:1] * r0[:, :c]
    acc = acc + w[:, 1:2] * r0[:, c:]
    acc = acc + w[:, 2:3] * r2[:, :c]
    acc = acc + w[:, 3:4] * r2[:, c:]
    return acc


def main() -> int:
    sys.path.insert(0, ".")
    from jefferson_tpu import DEFAULT_CONFIG
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.hrtf.kemar import AZIMUTH_COUNTS, AZIMUTH_OFFSET, NUM_ELEV, NUM_HRTF
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    r_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8448  # 256 srcs x 33
    tb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = DEFAULT_CONFIG
    bins = cfg.num_bins
    c = 4 * bins
    c_pad = _round_up(c, 128)
    print(f"devices: {jax.devices()}  R={r_rows} C={c} (pad {c_pad}) TB={tb}", file=sys.stderr)

    # realistic bench-like rows: orbiting sources, crossfade every block
    nb = 32
    n_src = -(-r_rows // (nb + 1))
    rows_i, rows_w = [], []
    for i in range(n_src):
        p = make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        rows_i.append(np.concatenate([p.idx_old[:1], p.idx_new]))
        rows_w.append(np.concatenate([p.w_old[:1], p.w_new]))
    idx = np.concatenate(rows_i)[:r_rows].astype(np.int32)
    w = np.concatenate(rows_w)[:r_rows].astype(np.float32)

    rng = np.random.default_rng(0)
    table_np = rng.standard_normal((NUM_HRTF, c)).astype(np.float32)
    table_pad = np.zeros((NUM_HRTF, c_pad), np.float32)
    table_pad[:, :c] = table_np
    planes = tuple(jnp.asarray(table_np[:, j * bins : (j + 1) * bins]) for j in range(4))
    table = jnp.asarray(table_np)
    table_flat = jnp.asarray(table_pad.reshape(-1))

    # successor + pair table/ids
    succ = np.empty(NUM_HRTF, np.int32)
    for e in range(NUM_ELEV):
        o, n = AZIMUTH_OFFSET[e], AZIMUTH_COUNTS[e]
        succ[o : o + n] = o + (np.arange(n) + 1) % n
    pair = np.concatenate(
        [
            np.concatenate([table_np, table_np[succ]], axis=1),
            np.concatenate([table_np, table_np], axis=1),
        ]
    )
    same01 = idx[:, 1] == idx[:, 0]
    same23 = idx[:, 3] == idx[:, 2]
    assert np.all(same01 | (idx[:, 1] == succ[idx[:, 0]]))
    assert np.all(same23 | (idx[:, 3] == succ[idx[:, 2]]))
    pid0 = (idx[:, 0] + NUM_HRTF * same01).astype(np.int32)
    pid2 = (idx[:, 2] + NUM_HRTF * same23).astype(np.int32)

    idx_d, w_d = jnp.asarray(idx), jnp.asarray(w)
    pid0_d, pid2_d = jnp.asarray(pid0), jnp.asarray(pid2)
    pair_d = jnp.asarray(pair)

    fns = {
        "xla16": (jax.jit(lambda i, ww: xla16(planes, i, ww)), (idx_d, w_d)),
        "xla4": (jax.jit(lambda i, ww: xla4(table, i, ww)), (idx_d, w_d)),
        "xla2pair": (
            jax.jit(lambda p0, p2, ww: xla2pair(pair_d, p0, p2, ww, c)),
            (pid0_d, pid2_d, w_d),
        ),
        "pallas": (
            jax.jit(lambda i, ww: pallas_dma_blend(table_flat, i, ww, c_pad, tb=tb)),
            (idx_d, w_d),
        ),
    }
    probe = jax.jit(lambda o: jnp.sum(o))

    results, outs = {}, {}
    for name, (fn, args) in fns.items():
        try:
            t0 = time.time()
            out = fn(*args)
            float(probe(out))
            print(f"{name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

            def run(k):
                t0 = time.time()
                o = None
                for _ in range(k):
                    o = fn(*args)
                float(probe(o))
                return time.time() - t0

            run(5)
            t_s, t_l = run(5), run(55)
            per = (t_l - t_s) / 50
            gbps = (r_rows * 4 * c * 4 + r_rows * c * 4) / per / 1e9
            results[name] = per
            outs[name] = np.asarray(out)[:, :c]
            print(f"{name}: {per*1e3:.3f} ms  (~{gbps:.0f} GB/s effective)", file=sys.stderr)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)

    ref = outs.get("xla16")
    for name, o in outs.items():
        if ref is not None and name != "xla16":
            print(f"{name} bit-identical to xla16: {np.array_equal(o, ref)}", file=sys.stderr)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} at {results[best]*1e3:.3f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
