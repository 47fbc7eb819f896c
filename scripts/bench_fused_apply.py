"""Fused apply kernel vs the XLA apply chain: correctness + perf on chip.

Compares, on the bench workload (256 srcs x 32 blocks, crossfade every
block):
  XLA:   blend_cat(2052) -> apply_filters_core        (the shipped path)
  fused: blend_cat(stride-padded) -> distance+cmul -> pallas fused kernel

Also prints the blend cost at both strides so the whole-pipeline tradeoff
(padded blend is +25% traffic; fused apply removes the q materialization)
is explicit.
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
    if "--interpret" in sys.argv:
        jax.config.update("jax_platforms", "cpu")  # preloaded axon otherwise
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.plan import make_plan
    from jefferson_tpu.engine.renderer import apply_filters_core, blend_cat, split_planes
    from jefferson_tpu.ops import fft as fft_ops
    from jefferson_tpu.ops.filters import cmul, distance_factors_split
    from jefferson_tpu.pallas.fused_apply import fused_apply_xfade, plane_stride
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    interpret = "--interpret" in sys.argv
    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    n_src, nb = (8, 4) if interpret else (256, 32)
    b = n_src * nb
    tb = 4 if interpret else 256
    bins, fpb = cfg.num_bins, cfg.frames_per_buffer
    stride = plane_stride(bins)
    print(f"devices: {jax.devices()}  B={b} bins={bins} stride={stride} TB={tb}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    streams = jnp.asarray(rng.standard_normal(
        (n_src, cfg.history_len + nb * fpb)).astype(np.float32))
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0).sample(nb, cfg), cfg)
        for i in range(n_src)
    ]
    idx_ext = jnp.asarray(np.concatenate(
        [np.concatenate([p.idx_old[:1], p.idx_new]) for p in plans]))
    w_ext = jnp.asarray(np.concatenate(
        [np.concatenate([p.w_old[:1], p.w_new]) for p in plans]))
    # old-aligned rows + per-segment last-new rows (the fused layout)
    idx_oldf = jnp.asarray(np.concatenate([p.idx_old for p in plans]))
    w_oldf = jnp.asarray(np.concatenate([p.w_old for p in plans]))
    idx_last = jnp.asarray(np.stack([p.idx_new[-1] for p in plans]))
    w_last = jnp.asarray(np.stack([p.w_new[-1] for p in plans]))
    catf = lambda a: jnp.asarray(np.concatenate([getattr(p, a) for p in plans]))
    xfade, u_hi, u_lo, inv_frac = (catf(k) for k in ("xfade", "u_hi", "u_lo", "inv_frac"))

    hr = np.real(db.spectra).astype(np.float32)
    hi = np.imag(db.spectra).astype(np.float32)
    # unpadded and stride-padded cat tables
    cat = np.concatenate([hr[:, 0], hi[:, 0], hr[:, 1], hi[:, 1]], axis=1)
    catp = np.zeros((cat.shape[0], 4 * stride), np.float32)
    for j in range(4):
        catp[:, j * stride : j * stride + bins] = cat[:, j * bins : (j + 1) * bins]
    cat, catp = jnp.asarray(cat), jnp.asarray(catp)

    fwd = jax.jit(lambda s: fft_ops.rfft_sliding_split_batched(s, nb, fpb, cfg.pad_len))
    xr3, xi3 = fwd(streams)
    xr = xr3.reshape(b, bins)
    xi = xi3.reshape(b, bins)

    blend_u = jax.jit(lambda i, w: blend_cat(cat, i, w))
    blend_p = jax.jit(lambda i, w: blend_cat(catp, i, w))

    # --- XLA reference path ---
    @jax.jit
    def xla_apply(xr, xi, g_ext, xfade, u_hi, u_lo, inv_frac):
        g = tuple(a.reshape(n_src, nb + 1, -1)
                  for a in split_planes(g_ext.reshape(n_src, nb + 1, -1), bins))
        flat = lambda a: a.reshape((b,) + a.shape[2:])
        g_old = tuple(flat(a[:, :nb]) for a in g)
        g_new = tuple(flat(a[:, 1:]) for a in g)
        return apply_filters_core(xr, xi, g_old, g_new, xfade, u_hi, u_lo, inv_frac,
                                  config=cfg, with_xfade=True)

    # --- fused path (distance+cmul in XLA, rest in the kernel) ---
    icr, ici = fft_ops._idft_tail_matrices(cfg.pad_len, fpb)
    icr, ici = jnp.asarray(icr), jnp.asarray(ici)

    @jax.jit
    def fused(xr, xi, g_old_p, g_last_p, xfade, u_hi, u_lo, inv_frac):
        dr, di = distance_factors_split(u_hi, u_lo, inv_frac, bins)
        xdr, xdi = cmul(xr, xi, dr, di)
        xf = xfade.astype(jnp.float32)[:, None]
        y = fused_apply_xfade(xdr, xdi, g_old_p, g_last_p, xf, icr, ici,
                              seg=nb, bins=bins, fpb=fpb, tb=tb, interpret=interpret)
        return jnp.transpose(y.reshape(b, 2, fpb), (0, 2, 1))

    @jax.jit
    def blend_fused(idx_oldf, w_oldf, idx_last, w_last):
        return blend_cat(catp, idx_oldf, w_oldf), blend_cat(catp, idx_last, w_last)

    g_u = blend_u(idx_ext, w_ext)
    g_oldp, g_lastp = blend_fused(idx_oldf, w_oldf, idx_last, w_last)
    want = np.asarray(xla_apply(xr, xi, g_u, xfade, u_hi, u_lo, inv_frac))
    got = np.asarray(fused(xr, xi, g_oldp, g_lastp, xfade, u_hi, u_lo, inv_frac))
    diff = np.abs(got - want)
    scale = np.abs(want).max()
    print(f"fused vs XLA: max|diff|={diff.max():.3e} (signal peak {scale:.3f}), "
          f"bit-identical={np.array_equal(got, want)}", file=sys.stderr)
    if interpret:
        return 0 if diff.max() < 1e-5 else 1

    probe = jax.jit(lambda o: jnp.sum(o))

    def bench(label, fn, *args):
        o = fn(*args)
        float(probe(o))

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

    probe2 = jax.jit(lambda o: jnp.sum(o[0]) + jnp.sum(o[1]))

    def bench2(label, fn, *args):
        o = fn(*args)
        float(probe2(o))

        def run(k):
            o = None
            t0 = time.time()
            for _ in range(k):
                o = fn(*args)
            float(probe2(o))
            return time.time() - t0

        run(5)
        t_s, t_l = run(5), run(55)
        per = (t_l - t_s) / 50
        print(f"{label}: {per*1e3:.3f} ms", file=sys.stderr)
        return per

    tb_u = bench("blend ext 2052 (XLA path)   ", blend_u, idx_ext, w_ext)
    tb_p = bench2("blend old+last 2560 (fused) ", blend_fused, idx_oldf, w_oldf, idx_last, w_last)
    ta_x = bench("apply XLA                   ", xla_apply, xr, xi, g_u, xfade, u_hi, u_lo, inv_frac)
    ta_f = bench("apply fused kernel          ", fused, xr, xi, g_oldp, g_lastp, xfade, u_hi, u_lo, inv_frac)
    print(f"pipeline old: {(tb_u+ta_x)*1e3:.3f} ms   new: {(tb_p+ta_f)*1e3:.3f} ms",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
