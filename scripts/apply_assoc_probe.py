"""Where exactly does the fused-apply stage's 0.6e-7 association delta live?

The round-5 error budget (PERF.md) pinned the sweep gate's entire worst-case
delta (0.894 vs the XLA chain's 0.745 margin) to the fused APPLY stage: the
in-VMEM complex-multiply + tail-IDFT contraction vs the XLA chain's
identical-looking `cmul` + `irfft_tail_split`.  The SOURCE formulas are the
same (`ar*br - ai*bi` then `q @ icr + q @ ici` at fp32-HIGHEST), so the
divergence must be compiler-level.  This probe isolates it on chip, stage by
stage, bitwise:

  A. product stage — the VPU elementwise cmul, XLA vs a trivial Mosaic
     kernel on identical operands (does one of them contract `a*b - c*d`
     into an FMA the other doesn't?)
  B. matmul stage — the (B, bins) @ (bins, fpb) fp32-HIGHEST contraction,
     XLA dot vs Mosaic dot_general, fed the SAME already-rounded q planes
     (does the MXU K-accumulation order differ between the two compilers?)
  C. whole stage — and which of the two is closer to float64 ground truth.

Disposition logic: if B is where the bits diverge, the association is the
compilers' internal accumulation scheduling and is NOT source-controllable —
the error budget's "match the XLA apply association in-kernel" recovery path
is closed.  If A diverges, the fix is a one-line formulation change.

Run under the ambient axon env (the chip): `python scripts/apply_assoc_probe.py`.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jefferson_tpu.ops import fft as fft_ops

B, BINS, FPB, N = 256, 513, 128, 1024
HP = jax.lax.Precision.HIGHEST


def fetch(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def bitdiff(a: np.ndarray, b: np.ndarray) -> tuple[int, float]:
    """(#elements whose f32 bit patterns differ, max abs float diff)."""
    n = int((a.view(np.int32) != b.view(np.int32)).sum())
    return n, float(np.abs(a.astype(np.float64) - b.astype(np.float64)).max())


# --- stage A: elementwise product ------------------------------------------

def _prod_kernel(xr_ref, xi_ref, gr_ref, gi_ref, qr_ref, qi_ref):
    xr, xi, gr, gi = xr_ref[:], xi_ref[:], gr_ref[:], gi_ref[:]
    qr_ref[:] = xr * gr - xi * gi
    qi_ref[:] = xr * gi + xi * gr


@jax.jit
def prod_pallas(xr, xi, gr, gi):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _prod_kernel,
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, BINS), jnp.float32)] * 2,
    )(xr, xi, gr, gi)


@jax.jit
def prod_xla(xr, xi, gr, gi):
    return xr * gr - xi * gi, xr * gi + xi * gr


# --- stage B: tail-IDFT matmul ---------------------------------------------

def _mm_kernel(qr_ref, qi_ref, icr_ref, ici_ref, y_ref):
    y_ref[:] = jax.lax.dot_general(
        qr_ref[:], icr_ref[:], (((1,), (0,)), ((), ())),
        precision=HP, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        qi_ref[:], ici_ref[:], (((1,), (0,)), ((), ())),
        precision=HP, preferred_element_type=jnp.float32,
    )


@jax.jit
def mm_pallas(qr, qi, icr, ici):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mm_kernel,
        in_specs=[spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, FPB), jnp.float32),
    )(qr, qi, icr, ici)


@jax.jit
def mm_xla(qr, qi, icr, ici):
    return (jnp.matmul(qr, icr, precision=HP)
            + jnp.matmul(qi, ici, precision=HP))


# --- stage D: can an explicit K-split tree recover XLA's accuracy? ---------
# The production lane512 tails contract K=512; Mosaic's sequential MXU
# accumulation may lose accuracy vs whatever schedule XLA emits.  Try
# explicit K-chunked dot_generals with a pairwise tree sum.

def _mm_tree_kernel(qr_ref, qi_ref, icr_ref, ici_ref, y_ref, *, chunks: int):
    k = qr_ref.shape[1]
    ck = k // chunks

    def tree(parts):
        while len(parts) > 1:
            parts = [
                parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0]

    def chunked(q, basis_ref):
        parts = [
            jax.lax.dot_general(
                q[:, c * ck : (c + 1) * ck], basis_ref[c * ck : (c + 1) * ck, :],
                (((1,), (0,)), ((), ())),
                precision=HP, preferred_element_type=jnp.float32,
            )
            for c in range(chunks)
        ]
        return tree(parts)

    y_ref[:] = chunked(qr_ref[:], icr_ref) + chunked(qi_ref[:], ici_ref)


@functools.partial(jax.jit, static_argnames=("chunks",))
def mm_pallas_tree(qr, qi, icr, ici, chunks: int):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mm_tree_kernel, chunks=chunks),
        in_specs=[spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, FPB), jnp.float32),
    )(qr, qi, icr, ici)


def main() -> int:
    print(f"platform: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # realistic magnitudes: forward planes O(1..30) (signal DFT x distance),
    # filter planes O(1) with the KEMAR-like decay
    xr = (rng.standard_normal((B, BINS)) * 8).astype(np.float32)
    xi = (rng.standard_normal((B, BINS)) * 8).astype(np.float32)
    dec = np.exp(-np.arange(BINS) / 200.0).astype(np.float32)
    gr = (rng.standard_normal((B, BINS)) * dec).astype(np.float32)
    gi = (rng.standard_normal((B, BINS)) * dec).astype(np.float32)
    icr, ici = fft_ops._idft_tail_matrices(N, FPB)

    dev = jax.devices()[0]
    put = functools.partial(jax.device_put, device=dev)
    xr_d, xi_d, gr_d, gi_d = map(put, (xr, xi, gr, gi))
    icr_d, ici_d = put(icr), put(ici)

    # stage A
    qx = [fetch(a) for a in prod_xla(xr_d, xi_d, gr_d, gi_d)]
    qp = [fetch(a) for a in prod_pallas(xr_d, xi_d, gr_d, gi_d)]
    q64r = xr.astype(np.float64) * gr - xi.astype(np.float64) * gi
    q64i = xr.astype(np.float64) * gi + xi.astype(np.float64) * gr
    for name, ql in (("xla", qx), ("pallas", qp)):
        e = max(np.abs(ql[0] - q64r).max(), np.abs(ql[1] - q64i).max())
        print(f"A  product {name:6s}: max err vs f64 = {e:.3e}")
    nbits, md = bitdiff(qx[0], qp[0])
    nbits_i, md_i = bitdiff(qx[1], qp[1])
    print(f"A  product xla-vs-pallas: {nbits}+{nbits_i} of {2*B*BINS} elements "
          f"differ bitwise (max |diff| {max(md, md_i):.3e})")

    # stage B: feed BOTH the same rounded product (the XLA one)
    qr_d, qi_d = put(qx[0]), put(qx[1])
    yx = fetch(mm_xla(qr_d, qi_d, icr_d, ici_d))
    yp = fetch(mm_pallas(qr_d, qi_d, icr_d, ici_d))
    y64 = (qx[0].astype(np.float64) @ icr.astype(np.float64)
           + qx[1].astype(np.float64) @ ici.astype(np.float64))
    print(f"B  matmul  xla   : max err vs f64 = {np.abs(yx - y64).max():.3e}")
    print(f"B  matmul  pallas: max err vs f64 = {np.abs(yp - y64).max():.3e}")
    nbits, md = bitdiff(yx, yp)
    print(f"B  matmul  xla-vs-pallas: {nbits} of {B*FPB} elements differ "
          f"bitwise (max |diff| {md:.3e})")

    # stage C: full chain each way, vs the f64 chain
    yfx = fetch(mm_xla(*prod_xla(xr_d, xi_d, gr_d, gi_d), icr_d, ici_d))
    yfp = fetch(mm_pallas(*prod_pallas(xr_d, xi_d, gr_d, gi_d), icr_d, ici_d))
    yf64 = (q64r @ icr.astype(np.float64) + q64i @ ici.astype(np.float64))
    print(f"C  chain   xla   : max err vs f64 = {np.abs(yfx - yf64).max():.3e}")
    print(f"C  chain   pallas: max err vs f64 = {np.abs(yfp - yf64).max():.3e}")
    nbits, md = bitdiff(yfx, yfp)
    print(f"C  chain   xla-vs-pallas: {nbits} of {B*FPB} elements differ "
          f"bitwise (max |diff| {md:.3e})")

    # stage D: the production lane512 contraction is K=512 — can an explicit
    # K-chunk pairwise tree in the kernel recover XLA's accuracy?
    k5 = BINS - 1
    qr5, qi5 = qx[0][:, :k5].copy(), qx[1][:, :k5].copy()
    icr5, ici5 = icr[:k5].copy(), ici[:k5].copy()
    y64_5 = (qr5.astype(np.float64) @ icr5.astype(np.float64)
             + qi5.astype(np.float64) @ ici5.astype(np.float64))
    qr5_d, qi5_d, icr5_d, ici5_d = map(put, (qr5, qi5, icr5, ici5))
    yx5 = fetch(mm_xla(qr5_d, qi5_d, icr5_d, ici5_d))
    print(f"D  K=512 xla          : max err vs f64 = {np.abs(yx5 - y64_5).max():.3e}")
    yp5 = fetch(mm_pallas(qr5_d, qi5_d, icr5_d, ici5_d))
    print(f"D  K=512 pallas plain : max err vs f64 = {np.abs(yp5 - y64_5).max():.3e}")
    for chunks in (2, 4, 8):
        yt = fetch(mm_pallas_tree(qr5_d, qi5_d, icr5_d, ici5_d, chunks))
        nb_, md_ = bitdiff(yx5, yt)
        print(f"D  K=512 pallas tree{chunks}: max err vs f64 = "
              f"{np.abs(yt - y64_5).max():.3e} (vs xla: {nb_} bits differ, "
              f"max {md_:.3e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
