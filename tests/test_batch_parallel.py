"""Multi-source batching + mesh sharding tests (8 virtual CPU devices)."""

import numpy as np

import jax

from jefferson_tpu.engine.batch import BatchRenderer
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.parallel.mesh import make_mesh, source_sharding
from jefferson_tpu.testing import precision_check
from jefferson_tpu.trajectory.trajectory import CircularOrbit, StaticPosition


def _mk_batch(config, castanets, s=4, blocks=24):
    rng = np.random.default_rng(8)
    signals = np.stack([np.roll(castanets, 1000 * i)[:8000] for i in range(s)])
    trajs = [
        StaticPosition(azi=30 * i, ele=5 * i - 10, r=0.8 + 0.2 * i).sample(blocks, config)
        if i % 2
        else CircularOrbit(period_s=0.5 + 0.2 * i, ele=5, r=1.0).sample(blocks, config)
        for i in range(s)
    ]
    return signals, np.stack(trajs)


def test_batch_matches_single_source(db, config, castanets):
    signals, positions = _mk_batch(config, castanets)
    br = BatchRenderer(db, chunk_blocks=16)
    got = br.render(signals, positions)
    single = Renderer(db, chunk_blocks=16)
    for i in range(signals.shape[0]):
        want = single.render(signals[i], positions[i])
        rep = precision_check(got[i], want, eps=1e-6)
        assert rep.ok, f"source {i}: {rep}"


def test_mixdown(db, config, castanets):
    signals, positions = _mk_batch(config, castanets, s=3)
    sep = BatchRenderer(db, chunk_blocks=16).render(signals, positions)
    mixed = BatchRenderer(db, chunk_blocks=16, mix=True).render(signals, positions)
    rep = precision_check(mixed, sep.sum(axis=0), eps=1e-6)
    assert rep.ok, str(rep)


def test_sharded_batch_matches_unsharded(db, config, castanets):
    """8 sources sharded over the 8-device virtual CPU mesh == single device."""
    assert len(jax.devices()) == 8
    signals, positions = _mk_batch(config, castanets, s=8, blocks=16)
    mesh = make_mesh(8)
    got = BatchRenderer(db, chunk_blocks=16, mesh=mesh).render(signals, positions)
    want = BatchRenderer(db, chunk_blocks=16).render(signals, positions)
    rep = precision_check(got, want, eps=1e-7)
    assert rep.ok, str(rep)


def test_sharded_mixdown_collective(db, config, castanets):
    """Mixdown over a sharded source axis exercises the GSPMD reduction."""
    signals, positions = _mk_batch(config, castanets, s=8, blocks=16)
    mesh = make_mesh(8)
    got = BatchRenderer(db, chunk_blocks=16, mesh=mesh, mix=True).render(signals, positions)
    want = BatchRenderer(db, chunk_blocks=16, mix=True).render(signals, positions)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)


def test_batch_renderer_rejects_2d_mesh(db):
    """BatchRenderer's shard planning reads mesh.size as the SOURCE shard
    count, which only holds on the documented 1-D mesh — a 2-D mesh must be
    rejected up front, not silently mis-plan sparse cf buckets."""
    import pytest

    mesh2 = make_mesh(8, ("src", "blk"))
    with pytest.raises(ValueError, match="1-D source mesh"):
        BatchRenderer(db, mesh=mesh2)


def test_batch_default_chunk_keeps_fused_step(db):
    """The BatchRenderer/CLI-scene default (chunk_blocks=None -> auto) must
    keep full chunks on the fully-fused step kernel (tb % nb == 0) — chunk
    sizes above 256 silently fall back to fused_apply, measured ~2x slower
    on the hold scene — and lower hold-scene chunks toward ~8192-row steps
    (measured 1.14-1.20x at s=64/128/256; scripts/bench_chunksize.py,
    bit-identical outputs across chunkings)."""
    from types import SimpleNamespace

    from jefferson_tpu.engine.batch import _auto_chunk
    from jefferson_tpu.engine.renderer import pick_fused_tile

    assert BatchRenderer(db).chunk_blocks is None  # auto

    hold = lambda b: SimpleNamespace(xfade=np.zeros(b, bool))
    mover = lambda b: SimpleNamespace(xfade=np.ones(b, bool))

    # hold scenes: ~8192-row steps (never above the fused-step 256 ceiling)
    for s, want in ((8, 256), (32, 256), (64, 128), (128, 64), (256, 32),
                    (2048, 8)):
        nb = _auto_chunk(s, 2048, [hold(2048)] * s)
        assert nb == want, (s, nb, want)
        tb = pick_fused_tile(s * nb, nb)
        assert tb is not None and tb % nb == 0, (s, nb, tb)
    # movers keep the 256 ceiling (the hold measurements don't transfer)
    assert _auto_chunk(128, 2048, [mover(2048)] * 128) == 256
    # a block-0-only crossfade (initial reposition) still counts as a hold
    first = SimpleNamespace(xfade=np.r_[True, np.zeros(2047, bool)])
    assert _auto_chunk(128, 2048, [first] * 128) == 64
    # sparse cadence (<= 1/16 of rows crossfade) lowers too (measured
    # 1.074x at the reference's 172-block cadence); denser does not
    xf = np.zeros(2048, bool); xf[::172] = True
    assert _auto_chunk(128, 2048, [SimpleNamespace(xfade=xf)] * 128) == 64
    xf8 = np.zeros(2048, bool); xf8[::8] = True
    assert _auto_chunk(128, 2048, [SimpleNamespace(xfade=xf8)] * 128) == 256
    # XLA-only renders (fused off/unsupported) keep the pre-retune 512
    # default: both auto numbers are fused-step measurements, and smaller
    # chunks only multiply host dispatches on that path
    assert _auto_chunk(128, 2048, [hold(2048)] * 128, fused=False) == 512
    assert _auto_chunk(128, 2048, [mover(2048)] * 128, fused=False) == 512
    # an explicit chunk size pins the render
    assert BatchRenderer(db, chunk_blocks=128).chunk_blocks == 128


def test_mesh_utilities():
    mesh = make_mesh(8)
    assert mesh.shape == {"src": 8}
    mesh2 = make_mesh(8, ("src", "blk"))
    assert mesh2.shape["src"] * mesh2.shape["blk"] == 8
    sh = source_sharding(mesh, 3)
    assert sh.spec == jax.sharding.PartitionSpec("src", None, None)


def test_2d_mesh_src_and_blk_sharding(db, config, castanets):
    """Both mesh axes at once: sources AND time blocks sharded over a 2-D
    ('src','blk') mesh match the unsharded render exactly."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jefferson_tpu.engine.batch import batched_chunk_fn
    from jefferson_tpu.engine.plan import fed_stream, make_plan

    s, nb = 4, 16
    signals, positions = _mk_batch(config, castanets, s=s, blocks=nb)
    plans = [make_plan(positions[i], config) for i in range(s)]
    feds = np.stack([fed_stream(signals[i], nb, config) for i in range(s)])
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    hists = np.zeros((s, config.history_len), np.float32)
    stack = lambda attr: np.stack([getattr(p, attr) for p in plans])
    args = [feds, stack("idx_new"), stack("w_new"), stack("idx_old"),
            stack("w_old"), stack("xfade"), stack("u_hi"), stack("u_lo"),
            stack("inv_frac")]

    fn = jax.jit(batched_chunk_fn(config, num_blocks=nb, with_xfade=True))
    want, _ = fn(spectra, jnp.asarray(hists), *[jnp.asarray(a) for a in args])

    mesh = make_mesh(8, ("src", "blk"))
    def shard(x):
        axes = ["src"] + [None] * (x.ndim - 1)
        if x.ndim >= 2:
            axes[1] = "blk"
        return jax.device_put(x, NamedSharding(mesh, P(*axes)))

    got, _ = fn(
        spectra,
        jax.device_put(hists, NamedSharding(mesh, P("src", None))),
        *[shard(np.asarray(a)) for a in args],
    )
    rep = precision_check(np.asarray(got), np.asarray(want), eps=1e-7)
    assert rep.ok, str(rep)


def test_ensure_virtual_devices_noop():
    """With enough devices present, ensure_virtual_devices returns in-process."""
    from jefferson_tpu.parallel.mesh import ensure_virtual_devices

    ensure_virtual_devices(8)  # conftest provisions 8 virtual CPU devices
    assert len(jax.devices()) == 8


def test_xla_flags_device_count_replacement():
    """The shared scrub-and-set helper REPLACES any inherited count flag and
    preserves unrelated flags (an inherited different count must not win)."""
    from jefferson_tpu.parallel.mesh import xla_flags_with_device_count

    out = xla_flags_with_device_count(
        "--xla_foo=1 --xla_force_host_platform_device_count=2 --xla_bar", 8
    )
    parts = out.split()
    assert "--xla_force_host_platform_device_count=8" in parts
    assert "--xla_force_host_platform_device_count=2" not in parts
    assert "--xla_foo=1" in parts and "--xla_bar" in parts
    # count-flag occurrences collapse to exactly one
    assert sum("xla_force_host_platform_device_count" in p for p in parts) == 1
    # empty input yields just the flag
    assert xla_flags_with_device_count("", 4).split() == [
        "--xla_force_host_platform_device_count=4"
    ]


def test_make_mesh_validation_and_factorization():
    """make_mesh rejects bad device counts / axis ranks and factors 2-D
    meshes near-square (6 devices -> 2x3, never 1x6)."""
    import pytest
    from jefferson_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="must be >= 1"):
        make_mesh(0)
    with pytest.raises(ValueError, match="must be >= 1"):
        make_mesh(-2)
    with pytest.raises(ValueError, match="have"):
        make_mesh(len(jax.devices()) + 1)
    with pytest.raises(ValueError, match="1-D or 2-D"):
        make_mesh(8, ("a", "b", "c"))
    mesh = make_mesh(6, ("src", "blk"))
    assert mesh.devices.shape == (2, 3)
    assert make_mesh(8, ("src", "blk")).devices.shape == (2, 4)
    # prime counts degrade to 1 x n rather than failing
    assert make_mesh(7, ("src", "blk")).devices.shape == (1, 7)


def test_replicated_sharding_spec():
    """replicated() replicates every axis; source_sharding shards only the
    leading axis."""
    from jax.sharding import PartitionSpec as P

    from jefferson_tpu.parallel.mesh import make_mesh, replicated, source_sharding

    mesh = make_mesh(8)
    assert replicated(mesh).spec == P()
    assert source_sharding(mesh, 3).spec == P("src", None, None)


def test_block_axis_sharding(db, config, castanets):
    """One render's blocks sharded over the mesh ('sp'-style): GSPMD handles
    the sliding-window halo between block shards; output matches unsharded."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import functools

    from jefferson_tpu.engine.renderer import _fd_complex_chunk
    from jefferson_tpu.engine.plan import fed_stream, make_plan

    nb = 64
    pos = CircularOrbit(period_s=0.7, ele=5, r=1.0).sample(nb, config)
    plan = make_plan(pos, config)
    fed = fed_stream(castanets, nb, config)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    hist = jnp.zeros(config.history_len, jnp.float32)
    fn = jax.jit(
        functools.partial(
            _fd_complex_chunk, config=config, num_blocks=nb, backend="matmul", with_xfade=True
        )
    )
    args = [
        jnp.asarray(fed), jnp.asarray(plan.idx_new), jnp.asarray(plan.w_new),
        jnp.asarray(plan.idx_old), jnp.asarray(plan.w_old), jnp.asarray(plan.xfade),
        jnp.asarray(plan.u_hi), jnp.asarray(plan.u_lo), jnp.asarray(plan.inv_frac),
    ]
    want, _ = fn(spectra, hist, *args)

    mesh = make_mesh(8, ("blk",))
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("blk", *([None] * (x.ndim - 1))))
    )
    sharded = [shard(a) for a in args]
    got, _ = fn(spectra, hist, *sharded)
    rep = precision_check(np.asarray(got), np.asarray(want), eps=1e-7)
    assert rep.ok, str(rep)


def test_renderer_block_mesh_production_path(db, config, castanets):
    """Round-4 productization: Renderer(mesh=...) shards one render's
    time-block axis over the mesh (the CLI's `--devices N` single-source
    path) and matches the unsharded render; dedup and mover dispatches both
    covered.  Fused kernels are single-device-only (a Pallas custom call is
    not GSPMD-partitionable), so the mesh path runs the XLA chunk."""
    from jefferson_tpu.engine.renderer import Renderer
    from jefferson_tpu.trajectory.trajectory import AzimuthSweep

    mesh = make_mesh(8, ("blk",))
    for traj in (
        CircularOrbit(period_s=0.4, ele=5, r=1.0),          # mover: direct path
        AzimuthSweep(start_azi=0, ele=0, r=0.5, step_deg=5,
                     blocks_per_step=16, num_steps=2),       # holds: dedup path
    ):
        pos = traj.sample(48, config)
        want = Renderer(db, config, chunk_blocks=16, fused=False).render(
            castanets, pos
        )
        got = Renderer(db, config, chunk_blocks=16, mesh=mesh).render(
            castanets, pos
        )
        rep = precision_check(got, want, eps=1e-7)
        assert rep.ok, str(rep)
    # invalid geometries are rejected up front
    import pytest

    with pytest.raises(ValueError, match="divide evenly"):
        Renderer(db, config, chunk_blocks=12, mesh=mesh)
    with pytest.raises(ValueError, match="1-D"):
        Renderer(db, config, mesh=make_mesh(8, ("src", "blk")))


def test_cli_devices_flag(db, config, castanets, tmp_path, monkeypatch):
    """`--devices N` reaches the mesh from the CLI for both the scene
    (source axis) and single-source (block axis) forms (round-4 verdict:
    'today a user cannot reach the mesh')."""
    import json

    import jefferson_tpu.cli.main as cli_main
    from jefferson_tpu.io.wavio import read_wav, write_wav

    monkeypatch.setattr(cli_main, "load_hrtf", lambda *a, **k: db)
    wav = tmp_path / "in.wav"
    write_wav(wav, castanets[:4096, None].repeat(2, 1), config.sample_rate)

    scene = {"sources": [
        {"input": str(wav), "trajectory": f"orbit:period=0.5,start={i*45}"}
        for i in range(8)
    ]}
    scene_path = tmp_path / "scene.json"
    scene_path.write_text(json.dumps(scene))
    out = tmp_path / "scene.wav"
    rc = cli_main.main(["--scene", str(scene_path), "-o", str(out),
                        "--blocks", "16", "--chunk-blocks", "16",
                        "--devices", "8", "--quiet", "--float", "--bits", "32"])
    assert rc == 0
    got, _ = read_wav(out)
    # sharded scene mix == unsharded scene mix
    out2 = tmp_path / "scene1.wav"
    rc = cli_main.main(["--scene", str(scene_path), "-o", str(out2),
                        "--blocks", "16", "--chunk-blocks", "16",
                        "--quiet", "--float", "--bits", "32"])
    assert rc == 0
    want, _ = read_wav(out2)
    rep = precision_check(got, want, eps=1e-6)
    assert rep.ok, str(rep)

    out3 = tmp_path / "single.wav"
    rc = cli_main.main(["-i", str(wav), "-o", str(out3), "--blocks", "16",
                        "--chunk-blocks", "16", "--devices", "8",
                        "--trajectory", "orbit:period=0.5", "--quiet", "--float", "--bits", "32"])
    assert rc == 0
    got3, _ = read_wav(out3)
    assert np.isfinite(got3).all() and got3.shape[0] == 16 * 128

    # a non-divisible scene source count auto-shrinks instead of failing
    assert cli_main.scene_mesh(6, 8, quiet=True).size == 6
    assert cli_main.scene_mesh(9, 8, quiet=True).size == 3
    assert cli_main.scene_mesh(8, 1) is None


def _static_batch(config, castanets, s=4, blocks=16):
    """A scene whose sources hold positions (the dedup-friendly common case:
    reference Audio.cu:98-158 drives persistent per-source positions)."""
    signals = np.stack([np.roll(castanets, 500 * i)[:4000] for i in range(s)])
    trajs = [
        StaticPosition(azi=25 * i, ele=10 * (i % 3) - 10, r=0.6 + 0.1 * i).sample(blocks, config)
        for i in range(s)
    ]
    return signals, np.stack(trajs)


def test_batch_dedup_fused_matches_xla(db, config, castanets):
    """The dedup+fused batch composition (fused forced on; interpret-mode
    Pallas on CPU) matches the XLA dedup path within kernel ulps."""
    signals, positions = _static_batch(config, castanets)
    fused = BatchRenderer(db, chunk_blocks=16, fused=True)
    plain = BatchRenderer(db, chunk_blocks=16, fused=False)
    got = fused.render(signals, positions)
    want = plain.render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)
    # the composition must actually have been used (dedup active + fused on)
    assert any(k[1] is not None and k[2] is not None for k in fused._jitted), (
        "dedup+fused batch fn was never compiled; dispatch regressed"
    )


def test_batch_dedup_fused_sharded(db, config, castanets):
    """dedup+fused composed with shard_map over the 8-device mesh."""
    from jefferson_tpu.parallel.mesh import make_mesh

    signals, positions = _static_batch(config, castanets, s=8)
    mesh = make_mesh(8)
    got = BatchRenderer(db, chunk_blocks=16, mesh=mesh, fused=True).render(
        signals, positions
    )
    want = BatchRenderer(db, chunk_blocks=16, fused=False).render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_batch_fused_fallback_and_propagation(db, config, castanets, monkeypatch, capsys):
    """Runtime-stack failures in the fused batch path degrade gracefully to
    the XLA path (with the real message surfaced); genuine bugs propagate."""
    import pytest

    import jefferson_tpu.engine.batch as batch_mod

    signals, positions = _static_batch(config, castanets)
    want = BatchRenderer(db, chunk_blocks=16, fused=False).render(signals, positions)

    def boom_runtime(*a, **k):
        def fn(*args, **kw):
            raise RuntimeError("remote Mosaic compile HTTP 500")
        return fn

    br = BatchRenderer(db, chunk_blocks=16, fused=True)
    monkeypatch.setattr(batch_mod, "batched_chunk_fn_dedup_fused", boom_runtime)
    got = br.render(signals, positions)
    err = capsys.readouterr().err
    assert "remote Mosaic compile HTTP 500" in err  # real message surfaced
    rep = precision_check(got, want, eps=1e-7)
    assert rep.ok, str(rep)

    def boom_bug(*a, **k):
        def fn(*args, **kw):
            raise ValueError("genuine shape bug")
        return fn

    br2 = BatchRenderer(db, chunk_blocks=16, fused=True)
    monkeypatch.setattr(batch_mod, "batched_chunk_fn_dedup_fused", boom_bug)
    with pytest.raises(ValueError, match="genuine shape bug"):
        br2.render(signals, positions)


def _wide_scene(config, castanets, s=8, blocks=16, seed=11):
    """Many sources spread over the full sphere, all moving: the
    cross-source unique-filter set exceeds one compact table's VMEM gate."""
    rng = np.random.default_rng(seed)
    signals = np.stack([np.roll(castanets, 300 * i)[:4000] for i in range(s)])
    trajs = []
    for i in range(s):
        azi0 = rng.uniform(0, 360)
        ele = rng.uniform(-40, 85)
        trajs.append(
            CircularOrbit(period_s=1.0 + 0.1 * i, ele=ele, r=1.0, start_azi=azi0
                          ).sample(blocks, config)
        )
    return signals, np.stack(trajs)


def test_batch_grouped_onehot_wide_scene(db, config, castanets, monkeypatch):
    """A scene whose cross-source unique set exceeds MAX_ONEHOT_U uses
    per-source-group tables (one dispatch) and stays correct."""
    import jefferson_tpu.pallas.fused_step as fs
    from jefferson_tpu.engine.batch import _plan_source_groups
    from jefferson_tpu.engine.plan import make_plan

    import jefferson_tpu.engine.batch as batch_mod

    # shrink the gates so the small CI scene counts as "wide" AND the
    # shrunken CI tiles still elect grouped (the production GROUPED_MIN_TB
    # policy is covered by test_grouped_tile_policy_prefers_gather_...)
    monkeypatch.setattr(fs, "MAX_ONEHOT_U", 32)
    monkeypatch.setattr(batch_mod, "GROUPED_MIN_TB", 8)
    signals, positions = _wide_scene(config, castanets)
    s, nb = positions.shape[0], positions.shape[1]
    plans = [make_plan(positions[i], config) for i in range(s)]
    idx_old = np.stack([p.idx_old for p in plans])
    idx_last = np.stack([p.idx_new[-1] for p in plans])
    all_u = len(np.unique(np.concatenate([idx_old.reshape(-1), idx_last.reshape(-1)])))
    assert all_u > 32, "fixture must exceed the shrunken gate"
    g, up = _plan_source_groups(idx_old, idx_last, s, tb_sources=1)
    assert g is not None and g < s and up <= 32

    fused = BatchRenderer(db, chunk_blocks=16, fused=True, dedup=False)
    got = fused.render(signals, positions)
    assert any(
        k[3] and k[4] is not None for k in fused._jitted
    ), "grouped one-hot batch fn was never compiled"
    want = BatchRenderer(db, chunk_blocks=16, fused=False).render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_batch_grouped_onehot_sharded(db, config, castanets, monkeypatch):
    """Grouped tables shard by source group across the mesh."""
    import jefferson_tpu.pallas.fused_step as fs
    from jefferson_tpu.parallel.mesh import make_mesh

    import jefferson_tpu.engine.batch as batch_mod

    monkeypatch.setattr(fs, "MAX_ONEHOT_U", 32)
    monkeypatch.setattr(batch_mod, "GROUPED_MIN_TB", 8)
    signals, positions = _wide_scene(config, castanets, s=16)
    mesh = make_mesh(8)
    fused = BatchRenderer(db, chunk_blocks=16, mesh=mesh, fused=True, dedup=False)
    got = fused.render(signals, positions)
    want = BatchRenderer(db, chunk_blocks=16, fused=False).render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_batch_grouped_single_source_groups_nonpow2_chunk(db, config, castanets, monkeypatch):
    """Review-confirmed crash (round 3): groups of 1 source with a chunk
    size whose tile candidates include sub-source tiles (nb=24 -> tb=8)
    must not violate the batched kernel's tb % nb == 0 contract — the
    dispatch re-picks a whole-source tile or falls back, never crashes."""
    import jefferson_tpu.pallas.fused_step as fs

    import jefferson_tpu.engine.batch as batch_mod

    monkeypatch.setattr(fs, "MAX_ONEHOT_U", 16)  # force groups of 1 source
    monkeypatch.setattr(batch_mod, "GROUPED_MIN_TB", 8)
    signals, positions = _wide_scene(config, castanets, s=4, blocks=24)
    fused = BatchRenderer(db, chunk_blocks=24, fused=True, dedup=False)
    got = fused.render(signals, positions)  # used to raise AssertionError
    want = BatchRenderer(db, chunk_blocks=24, fused=False).render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_batch_strike_cap_is_per_geometry(db, config, castanets, monkeypatch):
    """A deterministically-failing program geometry accumulates strikes
    independently: the one-hot program's failures must not be reset by the
    (different) gather program's successes in the same renders.

    (Partial-final-chunk geometries no longer exist to test — the batch
    renderer pads the last chunk to the fixed size, see
    test_partial_final_chunk_compiles_one_program.)"""
    import jefferson_tpu.engine.batch as batch_mod
    from jefferson_tpu.engine.renderer import _MAX_FUSED_STRIKES

    signals, positions = _wide_scene(config, castanets, s=4, blocks=32)
    real_factory = batch_mod.batched_chunk_fn_fused
    calls = {"bad": 0}

    def factory(config_, nb, tb, onehot=False, group_tiles=None, **kw):
        fn = real_factory(config_, nb, tb, onehot=onehot, group_tiles=group_tiles, **kw)
        if onehot:  # the one-hot program fails deterministically
            def bad(*a, **k):
                calls["bad"] += 1
                raise RuntimeError("deterministic Mosaic failure (onehot)")
            return bad
        return fn

    monkeypatch.setattr(batch_mod, "batched_chunk_fn_fused", factory)
    br = BatchRenderer(db, chunk_blocks=16, fused=True, dedup=False)
    for _ in range(6):
        out = br.render(signals, positions)
        assert np.isfinite(out).all()
    # the one-hot geometry gets _MAX_FUSED_STRIKES attempts, then the
    # dispatcher downgrades to the gather program (which succeeds) and the
    # struck key is never retried — gather successes must NOT reset it
    assert calls["bad"] == _MAX_FUSED_STRIKES, calls


def test_partial_final_chunk_compiles_one_program(db, config, castanets):
    """A render whose length does not divide the chunk size PADS the final
    chunk (output trimmed): distinct partial sizes used to mint a fresh
    program each (the daemon compile/RSS leak class), and the padded
    render must be bit-identical to the unpadded reference."""
    signals, positions = _wide_scene(config, castanets, s=4, blocks=24)
    br = BatchRenderer(db, chunk_blocks=16, fused=True, dedup=False)
    out = br.render(signals, positions)  # 24 = 16 + 8 -> padded to 32
    assert out.shape == (4, 24 * config.frames_per_buffer, 2)
    # only full-size (nb=16) programs were compiled
    assert all(k[0] == 16 for k in br._jitted), list(br._jitted)
    # bit-identical to manually padding the render to 32 blocks the same
    # way (repeat the final position; the feed continues wrapping) and
    # trimming — i.e. the pad+trim mechanics add nothing of their own
    pos_pad = np.concatenate(
        [positions, np.repeat(positions[:, -1:], 8, axis=1)], axis=1
    )
    ref = BatchRenderer(db, chunk_blocks=16, fused=True, dedup=False).render(
        signals, pos_pad
    )[:, : 24 * config.frames_per_buffer]
    np.testing.assert_array_equal(out, ref)


def test_grouped_tile_policy_prefers_gather_at_shrunken_tiles(db, config):
    """Round-4 dispatch policy (GROUPED_MIN_TB): a scene whose source
    groups force group-aligned tiles below 256 rows routes to the gather
    blend (measured parity-at-best for shrunken-tile grouped one-hot,
    PERF.md), while the grouped plan itself remains viable."""
    from jefferson_tpu.bench.sweep import _batch_dispatches
    from jefferson_tpu.engine.batch import _plan_batch_onehot
    from jefferson_tpu.engine.plan import make_plan

    s, b = 8, 32
    rng = np.random.default_rng(0)
    i = np.arange(b)
    pos = np.empty((s, b, 3))
    for src in range(s):
        pos[src, :, 0] = (src * 45 + 25.0 * i) % 360.0  # wide fast movers
        pos[src, :, 1] = -35.0 + src * 15.0
        pos[src, :, 2] = 1.0
    plans = [make_plan(pos[k], config) for k in range(s)]
    plan = _plan_batch_onehot(plans, b, 16, s)
    assert plan is not None and plan[0] == "grouped"  # grouping IS viable
    assert plan[1] * 16 < 256  # ...but group tiles would shrink below 256

    sigs = (rng.standard_normal((s, b * 128)) * 0.2).astype(np.float32)
    br = BatchRenderer(db, config, chunk_blocks=16, fused=True, dedup=False)
    got = br.render(sigs, pos)
    assert _batch_dispatches(br) == {"gather_fused"}, _batch_dispatches(br)
    assert not br._fused_strikes
    want = BatchRenderer(db, config, chunk_blocks=16, fused=False).render(sigs, pos)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_explicit_large_chunk_routes_to_gather(db, config, castanets):
    """chunk_blocks > 256 gives a tile SMALLER than the chunk (tb | nb
    fails the one-hot step kernel's whole-source-tiles contract): the
    shared one-hot election must route to the gather blend instead of
    crashing the render with the kernel's trace-time assert (review
    finding; the grouped branch already guarded this)."""
    s, b = 2, 512
    rng = np.random.default_rng(4)
    pos = np.empty((s, b, 3))
    for k in range(s):
        # few unique filters -> the plan ELECTS shared one-hot
        pos[k, :, 0] = np.where((np.arange(b) // 64) % 2 == 0, 30.0 + 5 * k, 35.0 + 5 * k)
        pos[k, :, 1] = 0.0
        pos[k, :, 2] = 1.0
    sigs = np.stack([castanets[: b * 128], np.roll(castanets, 500)[: b * 128]])
    br = BatchRenderer(db, config, chunk_blocks=512, fused=True, dedup=False)
    out = br.render(sigs, pos)
    assert out.shape == (s, b * 128, 2) and np.isfinite(out).all()


def test_sharded_wide_movers_gather_form(db, config, castanets):
    """Wide full-sphere movers whose per-shard tiles shrink below
    GROUPED_MIN_TB must route to the GATHER-fused batched form under the
    mesh (the non-onehot shard_map operand layout) and match unsharded."""
    rng = np.random.default_rng(11)
    s, nb = 8, 16
    signals = np.stack(
        [castanets[: nb * config.frames_per_buffer] for _ in range(s)]
    )
    positions = np.stack([
        np.stack([rng.uniform(0, 360, nb), rng.uniform(-40, 90, nb),
                  np.full(nb, 1.0)], axis=1)
        for _ in range(s)
    ]).astype(np.float32)
    mesh = make_mesh(8)
    br = BatchRenderer(db, chunk_blocks=nb, mesh=mesh, fused=True)
    got = br.render(signals, positions)
    gather_keys = [k for k in br._jitted
                   if k[1] is None and k[2] is not None and not k[3]]
    assert gather_keys, f"expected the gather-fused form, programs: {list(br._jitted)}"
    want = BatchRenderer(db, chunk_blocks=nb).render(signals, positions)
    rep = precision_check(got, want, eps=5e-7)
    assert rep.ok, str(rep)


def test_ensure_virtual_devices_child_marker(monkeypatch):
    """The re-exec'd child branch: with the marker set and the count already
    satisfiable it forces the CPU platform in place; an unsatisfiable count
    fails loudly instead of silently under-sharding."""
    import os

    import pytest

    from jefferson_tpu.parallel import mesh as m

    monkeypatch.setenv("XLA_FLAGS", os.environ.get("XLA_FLAGS", ""))
    monkeypatch.setenv("JT_VIRTUAL_MESH", "1")
    m.ensure_virtual_devices(8)  # conftest's backend already has 8 devices
    assert (
        "--xla_force_host_platform_device_count=8"
        in os.environ["XLA_FLAGS"].split()
    )
    # the backend initialized with 8 devices, so a late 16 must raise
    with pytest.raises(RuntimeError, match="initialized before"):
        m.ensure_virtual_devices(16)


def test_ensure_virtual_devices_reexec_command_and_env(monkeypatch):
    """Too few devices, no marker: the helper re-execs sys.argv in a child
    configured for the virtual mesh — count flag REPLACED, platform forced,
    marker set, `python -m` package context preserved — and exits with the
    child's return code."""
    import sys
    import types

    import __main__
    import pytest

    from jefferson_tpu.parallel import mesh as m

    calls = {}

    def fake_call(cmd, env=None):
        calls["cmd"], calls["env"] = list(cmd), dict(env)
        return 7

    monkeypatch.setattr(m.subprocess, "call", fake_call)
    monkeypatch.delenv("JT_VIRTUAL_MESH", raising=False)
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_foo=1 --xla_force_host_platform_device_count=8"
    )

    monkeypatch.setattr(
        __main__, "__spec__", types.SimpleNamespace(name="some.module"),
        raising=False,
    )
    with pytest.raises(SystemExit) as ei:
        m.ensure_virtual_devices(16)
    assert ei.value.code == 7
    assert calls["cmd"][:3] == [sys.executable, "-m", "some.module"]
    env = calls["env"]
    assert env["JT_VIRTUAL_MESH"] == "1"
    assert env["JAX_PLATFORMS"] == "cpu"
    flags = env["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=16" in flags
    assert "--xla_force_host_platform_device_count=8" not in flags
    assert "--xla_foo=1" in flags  # unrelated flags survive

    # plain-script invocation (no __spec__): re-exec sys.argv directly
    monkeypatch.setattr(__main__, "__spec__", None, raising=False)
    with pytest.raises(SystemExit):
        m.ensure_virtual_devices(16)
    assert calls["cmd"] == [sys.executable] + sys.argv


def test_batch_unaligned_geometry_vmap_fallback(castanets):
    """history_len % fpb != 0: the batched chunk fn takes the vmapped
    per-source fallback (no shared sliding DFT) and stays exact against the
    single-source renderer on the same geometry."""
    from jefferson_tpu import EngineConfig, synthetic_database

    cfg = EngineConfig(frames_per_buffer=96, hrtf_len=256)  # hist 416 % 96 != 0
    assert cfg.history_len % cfg.frames_per_buffer != 0
    db96 = synthetic_database(cfg, n_taps=256, seed=9)
    s, blocks = 2, 12
    signals = np.stack([np.roll(castanets, 500 * i)[:4000] for i in range(s)])
    positions = np.stack([
        CircularOrbit(period_s=0.4 + 0.1 * i, ele=5, r=1.0).sample(blocks, cfg)
        for i in range(s)
    ])
    got = BatchRenderer(db96, cfg, chunk_blocks=6).render(signals, positions)
    single = Renderer(db96, cfg, chunk_blocks=6)
    for i in range(s):
        want = single.render(signals[i], positions[i])
        rep = precision_check(got[i], want, eps=1e-7)
        assert rep.ok, f"source {i}: {rep}"


def test_batch_render_mesh_not_dividing_sources(db, config, castanets):
    """A 1-D source mesh that does NOT divide the source count degrades to
    the planned XLA path with replicated operands instead of crashing in
    device_put (round-5 review: the uneven shard was a ValueError)."""
    s, blocks = 6, 8
    signals = np.stack([np.roll(castanets, 900 * i)[:4000] for i in range(s)])
    positions = np.stack([
        StaticPosition(azi=15 * i, ele=0, r=1.0).sample(blocks, config)
        for i in range(s)
    ])
    br = BatchRenderer(db, config, chunk_blocks=8, mesh=make_mesh(4, ("src",)))
    got = br.render(signals, positions)
    single = Renderer(db, config, chunk_blocks=8)
    for i in range(s):
        rep = precision_check(got[i], single.render(signals[i], positions[i]),
                              eps=1e-6)
        assert rep.ok, f"source {i}: {rep}"


def test_renderer_short_render_keeps_block_mesh_chunk_even(db, config, castanets):
    """A render shorter than chunk_blocks on a block mesh pads the chunk up
    to a mesh multiple (round-5 review: cb=min(chunk, b_total) silently
    replicated every per-block operand when b_total % mesh != 0) and stays
    within the parity gates."""
    mesh = make_mesh(4, ("blk",))
    pos = CircularOrbit(period_s=0.5, ele=5, r=1.0).sample(13, config)  # 13 % 4 != 0
    got = Renderer(db, config, chunk_blocks=16, mesh=mesh).render(castanets, pos)
    want = Renderer(db, config, chunk_blocks=16).render(castanets, pos)
    rep = precision_check(got, want, eps=1e-7)
    assert rep.ok, str(rep)


def test_batched_onehot_compact_distance_matches_xla(db, config):
    """The bench.py headline composition at CI scale: the batched one-hot
    fused form with the COMPACT distance operands ((8,)-triple arrays + a
    per-block selector, n_dist) matches the XLA batch chain."""
    import jax.numpy as jnp

    from jefferson_tpu.engine.batch import batched_chunk_fn, batched_chunk_fn_fused
    from jefferson_tpu.engine.plan import compact_filter_ids, make_plan
    from jefferson_tpu.engine.renderer import dedup_distance, pick_fused_tile

    s, nb = 4, 16
    rng = np.random.default_rng(7)
    plans = [
        make_plan(CircularOrbit(period_s=0.4 + 0.01 * i, ele=5, r=1.0)
                  .sample(nb, config), config)
        for i in range(s)
    ]
    feds = jnp.asarray(
        (rng.standard_normal((s, nb * config.frames_per_buffer)) * 0.2)
        .astype(np.float32)
    )
    hists = jnp.zeros((s, config.history_len), jnp.float32)
    spectra = (
        jnp.asarray(np.real(db.spectra).astype(np.float32)),
        jnp.asarray(np.imag(db.spectra).astype(np.float32)),
    )
    stack = lambda attr: jnp.asarray(np.stack([getattr(p, attr) for p in plans]))
    idx_old = np.stack([p.idx_old for p in plans])
    idx_last = np.stack([p.idx_new[-1] for p in plans])
    uniq_ids, ridx, ridx_last, u_pad = compact_filter_ids(idx_old, idx_last)
    dist = dedup_distance(
        np.concatenate([p.u_hi for p in plans]),
        np.concatenate([p.u_lo for p in plans]),
        np.concatenate([p.inv_frac for p in plans]),
    )
    assert dist is not None, "constant-radius orbits must dedup to few triples"
    nd = dist[4]
    tb = pick_fused_tile(s * nb, nb)
    fused = jax.jit(batched_chunk_fn_fused(
        config, num_blocks=nb, tb=tb, onehot=True, n_dist=nd,
    ))
    got, h_f = fused(
        spectra, hists, feds,
        jnp.asarray(uniq_ids), jnp.asarray(ridx), stack("w_old"),
        jnp.asarray(ridx_last), jnp.asarray(np.stack([p.w_new[-1] for p in plans])),
        stack("xfade"),
        jnp.asarray(dist[0]), jnp.asarray(dist[1]), jnp.asarray(dist[2]),
        jnp.asarray(dist[3].reshape(s, nb)),
    )
    xla = jax.jit(batched_chunk_fn(config, num_blocks=nb, with_xfade=True))
    want, h_x = xla(
        spectra, hists, feds,
        stack("idx_new"), stack("w_new"), stack("idx_old"), stack("w_old"),
        stack("xfade"), stack("u_hi"), stack("u_lo"), stack("inv_frac"),
    )
    rep = precision_check(np.asarray(got), np.asarray(want), eps=5e-7)
    assert rep.ok, str(rep)
    np.testing.assert_array_equal(np.asarray(h_f), np.asarray(h_x))
