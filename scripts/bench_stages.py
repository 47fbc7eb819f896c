"""Per-stage budget of the flagship step on the real chip (PERF.md table).

Times the three pipeline stages in isolation (each its own jit, slope
timing): sliding forward DFT, combined-plane extended blend, filter apply +
tail IDFT + crossfade.  Workload mirrors bench.py (8448 extended rows).
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
    from jefferson_tpu.engine.plan import fed_stream, make_plan
    from jefferson_tpu.engine.renderer import (
        apply_filters_core,
        blend_cat,
        cat_table,
        split_planes,
    )
    from jefferson_tpu.ops import fft as fft_ops
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    n_src, nb = 256, 32
    b = n_src * nb
    print(f"devices: {jax.devices()}  {n_src} srcs x {nb} blocks", file=sys.stderr)

    rng = np.random.default_rng(0)
    streams = jnp.asarray(
        rng.standard_normal((n_src, cfg.history_len + nb * cfg.frames_per_buffer)).astype(np.float32)
    )
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(n_src)
    ]
    idx_ext = jnp.asarray(np.concatenate(
        [np.concatenate([p.idx_old[:1], p.idx_new]) for p in plans]))
    w_ext = jnp.asarray(np.concatenate(
        [np.concatenate([p.w_old[:1], p.w_new]) for p in plans]))
    stackf = lambda a: jnp.asarray(np.concatenate([getattr(p, a) for p in plans]))
    xfade, u_hi, u_lo, inv_frac = (stackf(k) for k in ("xfade", "u_hi", "u_lo", "inv_frac"))
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )

    fwd = jax.jit(lambda s: fft_ops.rfft_sliding_split_batched(
        s, nb, cfg.frames_per_buffer, cfg.pad_len))
    blend = jax.jit(lambda i, w: blend_cat(cat_table(spectra), i, w))

    def apply_fn(xr, xi, g_ext_cat, xfade, u_hi, u_lo, inv_frac):
        flat = lambda a: a.reshape((b,) + a.shape[2:])
        g = tuple(a.reshape(n_src, nb + 1, -1) for a in split_planes(g_ext_cat.reshape(n_src, nb + 1, -1), cfg.num_bins))
        g_old = tuple(flat(a[:, :nb]) for a in g)
        g_new = tuple(flat(a[:, 1:]) for a in g)
        return apply_filters_core(
            flat(xr.reshape(n_src, nb, -1)), flat(xi.reshape(n_src, nb, -1)),
            g_old, g_new, xfade, u_hi, u_lo, inv_frac,
            config=cfg, with_xfade=True,
        )

    apply_j = jax.jit(apply_fn)
    probe = jax.jit(lambda o: jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))

    xr, xi = fwd(streams)
    g_ext = blend(idx_ext, w_ext)
    out = apply_j(xr, xi, g_ext, xfade, u_hi, u_lo, inv_frac)
    float(probe(out))

    def bench(label, fn, *args):
        def run(k):
            o = None
            t0 = time.time()
            for _ in range(k):
                o = fn(*args)
            float(probe(o))
            return time.time() - t0

        run(5)
        t_s, t_l = run(5), run(55)
        per = (t_l - t_s) / 50
        print(f"{label}: {per*1e3:.3f} ms", file=sys.stderr)
        return per

    t1 = bench("forward (sliding DFT)", fwd, streams)
    t2 = bench("blend (cat extended) ", blend, idx_ext, w_ext)
    t3 = bench("apply+IDFT+crossfade ", apply_j, xr, xi, g_ext, xfade, u_hi, u_lo, inv_frac)
    print(f"sum: {(t1+t2+t3)*1e3:.3f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
