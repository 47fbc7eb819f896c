"""A/B flag variants of the fused one-hot step kernel (interpret mode).

The bench scripts A/B these flags on chip (PERF.md records the measured
outcomes); these tests pin the EQUIVALENCE claims each A/B rests on, so a
kernel change that silently breaks an off-default branch is caught on CPU:

  * ``single_blend=False`` (the pre-round-4 two-blend form) must be
    BIT-identical to the default roll+patch single blend — row permutation
    commutes with per-row dots (PERF.md round-4 "single-blend" attack).
  * ``mstack_tail=True`` (the measured dead end, kept measurable) must be
    BIT-identical to the unstacked tails — per-row contractions are
    unchanged by M-stacking, and the stacked branch follows the same
    ``tail_tree`` contraction policy (the round-5 review fix: a plain dot
    there made mstack A/Bs compare different numerics).
  * the mstack VMEM gate (u_pad > 128 or lane512) must warn loudly and run
    the unstacked kernel, so a gated A/B arm can't fake a 1.00x.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
from jefferson_tpu.engine.renderer import cat_table, pick_fused_tile
from jefferson_tpu.pallas.fused_step import fused_step_onehot_xfade, to_lane512
from jefferson_tpu.trajectory.trajectory import CircularOrbit


def _onehot_args(db, config, lane512: bool, seed: int = 5):
    """The fused one-hot step's operand set for a small batched orbit
    (same harness as test_lane512.test_fwd512_matches_lane512)."""
    rng = np.random.default_rng(seed)
    cfg = config
    fpb = cfg.frames_per_buffer
    s, nb = 4, 8
    plans = [
        make_plan(
            CircularOrbit(period_s=0.3 + 0.1 * i, ele=5, r=1.0).sample(nb, cfg), cfg
        )
        for i in range(s)
    ]
    hist = (cfg.pad_len // fpb - 1) * fpb
    streams = jnp.asarray(
        (rng.standard_normal((s, nb * fpb + hist)) * 0.2).astype(np.float32)
    )
    tb = pick_fused_tile(s * nb, nb)
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(
        np.stack([p.idx_old for p in plans]),
        np.stack([p.idx_new[-1] for p in plans]),
    )
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    table = jnp.take(cat_table(spectra), jnp.asarray(uniq_ids), axis=0)
    if lane512:
        table = to_lane512(table, cfg.num_bins)
    b = s * nb
    col = lambda a: jnp.asarray(np.concatenate(a).astype(np.float32)[:, None])
    args = (
        streams,
        col([p.u_hi for p in plans]),
        col([p.u_lo for p in plans]),
        col([p.inv_frac for p in plans]),
        table,
        jnp.asarray(ridx.reshape(b, 4)),
        jnp.asarray(np.concatenate([p.w_old for p in plans])),
        jnp.asarray(ridx_last),
        jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        col([p.xfade for p in plans]),
    )
    kw = dict(nb=nb, pad_len=cfg.pad_len, bins=cfg.num_bins, fpb=fpb, tb=tb,
              lane512=lane512, interpret=True)
    assert u_pad <= 128, "harness geometry must stay inside the mstack gate"
    return args, kw


@pytest.mark.parametrize("lane512", [False, True])
def test_single_blend_off_bitidentical(db, config, lane512):
    """g_new = roll(g_old) + patch == blending rolled one-hot weights,
    bitwise: each output row's MXU dot consumes the same operands in the
    same order either way."""
    args, kw = _onehot_args(db, config, lane512)
    y_on = fused_step_onehot_xfade(*args, **kw)  # single_blend default True
    y_off = fused_step_onehot_xfade(*args, single_blend=False, **kw)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))


@pytest.mark.parametrize("tail_tree", [False, True])
def test_mstack_tail_matches(db, config, tail_tree):
    """M-stacking the four tail-IDFT products changes no per-row
    contraction — under BOTH tail contraction policies (the round-5 review
    fix routed the stacked branch through the same tail_tree schedule).

    With the TREE the K-accumulation schedule is source-controlled
    (chunked 128-lane dots summed pairwise), so M-stacking is bitwise
    invariant on every platform.  With the plain contraction the schedule
    belongs to the backend: the MXU's is M-invariant (measured max diff
    0.0 on chip, PERF.md dead ends) but CPU XLA's gemm blocks K
    differently at 4x the M, so interpret mode shows ~2e-8 reassociation
    there — tolerance-gated accordingly."""
    args, kw = _onehot_args(db, config, lane512=False)
    y_plain = fused_step_onehot_xfade(*args, tail_tree=tail_tree, **kw)
    y_stack = fused_step_onehot_xfade(
        *args, mstack_tail=True, tail_tree=tail_tree, **kw
    )
    if tail_tree:
        np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_stack))
    else:
        assert np.abs(np.asarray(y_plain) - np.asarray(y_stack)).max() < 1e-7


def test_mstack_gate_warns_and_runs_unstacked(db, config):
    """mstack_tail=True outside its VMEM gate (here: lane512) warns and
    dispatches the unstacked kernel — bit-equal to the default."""
    args, kw = _onehot_args(db, config, lane512=True)
    y_default = fused_step_onehot_xfade(*args, **kw)
    with pytest.warns(UserWarning, match="mstack_tail=True ignored"):
        y_gated = fused_step_onehot_xfade(*args, mstack_tail=True, **kw)
    np.testing.assert_array_equal(np.asarray(y_default), np.asarray(y_gated))
