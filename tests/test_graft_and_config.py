"""Graft entry points on the virtual mesh + non-default engine geometry."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out, hists = jax.jit(fn)(*args)
    assert out.shape == (4, 16, 128, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_dryrun_smaller_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_nondefault_geometry_parity(castanets):
    """A 64-sample block / 256-tap / 512-FFT engine stays oracle-exact."""
    from jefferson_tpu import EngineConfig, ProcessType, synthetic_database
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = EngineConfig(frames_per_buffer=64, hrtf_len=256)
    assert cfg.pad_len == 512 and cfg.num_bins == 257 and cfg.history_len == 448
    db = synthetic_database(cfg, n_taps=256, seed=7)
    pos = CircularOrbit(period_s=0.2, ele=5, r=1.0).sample(40, cfg)
    got = Renderer(db, cfg, chunk_blocks=16).render(castanets, pos)
    want = render_oracle(castanets, db, [tuple(p) for p in pos], cfg)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)


def test_unaligned_geometry_falls_back(castanets):
    """history_len not a multiple of fpb: windowed forward path still exact."""
    from jefferson_tpu import EngineConfig, synthetic_database
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check
    from jefferson_tpu.trajectory.trajectory import StaticPosition

    cfg = EngineConfig(frames_per_buffer=96, hrtf_len=256)  # pad 512, hist 416
    assert cfg.history_len % cfg.frames_per_buffer != 0
    db = synthetic_database(cfg, n_taps=256, seed=8)
    pos = StaticPosition(azi=30, ele=0, r=1.0).sample(20, cfg)
    got = Renderer(db, cfg, chunk_blocks=10).render(castanets, pos)
    want = render_oracle(castanets, db, [tuple(p) for p in pos], cfg)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)


def test_mesh_factorizations():
    """2-D meshes factor any device count sensibly."""
    from jefferson_tpu.parallel.mesh import make_mesh

    m = make_mesh(8, ("src", "blk"))
    assert m.shape["src"] * m.shape["blk"] == 8
    m1 = make_mesh(1)
    assert m1.shape == {"src": 1}
    with pytest.raises(ValueError):
        make_mesh(1024)


def test_config_and_testing_helper_guards():
    """EngineConfig rejects sub-2 block sizes (crossfade ramps divide by
    fpb-1); ProcessType property table; precision_check shape gate and
    rms_error round out the functions.cpp helper surface."""
    from jefferson_tpu import EngineConfig, ProcessType
    from jefferson_tpu.testing import precision_check, rms_error

    with pytest.raises(ValueError, match="frames_per_buffer"):
        EngineConfig(frames_per_buffer=1)
    with pytest.raises(ValueError, match="hrtf_len"):
        EngineConfig(hrtf_len=0)

    assert ProcessType.TPU_FD_COMPLEX.is_interpolating
    assert ProcessType.CPU_FD_COMPLEX.is_interpolating
    assert not ProcessType.TPU_FD_BASIC.is_interpolating
    assert not ProcessType.CPU_TD.is_interpolating

    with pytest.raises(ValueError, match="shape mismatch"):
        precision_check(np.zeros(3), np.zeros(4))
    a = np.array([0.0, 3.0, 4.0])
    assert rms_error(a, np.zeros(3)) == pytest.approx(np.sqrt(25.0 / 3.0))
    # empty buffers: a degenerate comparison is OK, not a crash
    rep = precision_check(np.zeros(0), np.zeros(0))
    assert rep.ok and rep.max_abs_diff == 0.0 and rep.first_bad_index == -1


@pytest.mark.parametrize("fpb,taps", [(32, 64), (48, 100), (160, 200)])
def test_geometry_fuzz_oracle_exact(castanets, fpb, taps):
    """Random non-default geometries (aligned and unaligned, pow2 and odd
    tap counts) stay oracle-exact through the moving-source chain — the
    engine's shapes are config-derived everywhere, never hardcoded 128/1024."""
    from jefferson_tpu import EngineConfig, synthetic_database
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.oracle.reference import render_oracle
    from jefferson_tpu.testing import precision_check
    from jefferson_tpu.trajectory.trajectory import CircularOrbit

    cfg = EngineConfig(frames_per_buffer=fpb, hrtf_len=taps)
    db = synthetic_database(cfg, n_taps=taps, seed=fpb)
    pos = CircularOrbit(period_s=0.15, ele=-10, r=0.8).sample(12, cfg)
    got = Renderer(db, cfg, chunk_blocks=6).render(castanets, pos)
    want = render_oracle(castanets, db, [tuple(p) for p in pos], cfg)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, f"fpb={fpb} taps={taps} (pad {cfg.pad_len}): {rep}"
