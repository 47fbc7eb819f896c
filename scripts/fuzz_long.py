"""Deep dispatch fuzz: N random (geometry x trajectory) combos, fused vs XLA.

A release-strength version of tests/test_fuzz_parity.py::
test_fuzz_fused_dispatch_boundaries — run before cutting a release or after
any dispatch/planner change:
    python scripts/fuzz_long.py [N] [N_BATCH] [SEED]   (defaults 30, 20, 2026)
SEED: vary it across release runs — each seed draws a fresh combo set, so
two green seeds cover roughly twice the dispatch/geometry space of one.
Phase 1 exercises every single-source fused path (dedup+fused / one-hot /
grouped / gather) plus the partial-chunk, group-divisibility, and
bucket-sizing boundaries.  Phase 2 fuzzes the BATCH/scene dispatch
(BatchRenderer: dedup+fused composition, batched one-hot, sparse-crossfade
side-pass, no-crossfade chunks, mix, and 1-D source meshes) against the
unfused XLA batch path.
"""
import os
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.testing import precision_check

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 2026
cfg = DEFAULT_CONFIG
db = synthetic_database(cfg)
print(f"fuzz seed {seed}")
rng = np.random.default_rng(seed)
sig_master = (rng.standard_normal(cfg.sample_rate) * 0.2).astype(np.float32)

worst = 0.0
for trial in range(n):
    b = int(rng.integers(16, 400))
    cb = int(rng.choice([8, 16, 24, 32, 48, 64, 96, 128, 256]))
    kind = rng.choice(["mover", "holder", "wide", "mixed"])
    i = np.arange(b)
    if kind == "mover":
        speed = float(rng.choice([0.3, 1.3, 5.0]))
        azi = (i * speed + rng.uniform(0, 360)) % 360
        ele = np.clip(20 + 60 * np.sin(i / max(5, b / 6)), -40, 90)
    elif kind == "holder":
        hold = int(rng.integers(4, 40))
        azi = ((i // hold) * 15.0) % 360
        ele = np.full(b, float(rng.integers(-40, 90)))
    elif kind == "wide":
        azi = rng.uniform(0, 360, b)
        ele = rng.uniform(-40, 90, b)
    else:
        azi = np.where(i < b // 2, 30.0, (i * 2.1) % 360)
        ele = np.where(i < b // 2, 0.0, rng.uniform(-40, 90, b))
    r = np.full(b, float(rng.uniform(0.1, 3.0)))
    pos = np.stack([azi, ele, r], axis=1)
    sig = sig_master[: max(b * cfg.frames_per_buffer, 2000)]
    # pipelined output fetch is bit-identical to the sync loop (round-5
    # closing; tests/test_pipeline_fetch.py), so drawing it here keeps the
    # fused-vs-XLA compare valid while fuzzing the deferred-commit loop
    pf = bool(rng.integers(0, 2))
    got = Renderer(db, cfg, chunk_blocks=cb, fused=True,
                   pipeline_fetch=pf).render(sig, pos)
    want = Renderer(db, cfg, chunk_blocks=cb, fused=False).render(sig, pos)
    rep = precision_check(got, want, eps=5e-7)
    worst = max(worst, rep.max_abs_diff)
    status = "ok" if rep.ok else "FAIL"
    print(f"[{trial+1:3d}/{n}] b={b:3d} cb={cb:3d} {kind:6s} pf={int(pf)}: "
          f"max|diff|={rep.max_abs_diff:.2e} {status}")
    if not rep.ok:
        print(f"FUZZ FAILED: {rep}")
        sys.exit(1)
print(f"FUZZ PASSED: {n} combos, worst max|diff| {worst:.2e} (eps 5e-7)")

# ---- phase 2: batch/scene dispatch (BatchRenderer) --------------------------
from jefferson_tpu.engine.batch import BatchRenderer
from jefferson_tpu.parallel.mesh import make_mesh

n_dev = len(jax.devices())
worst_b = 0.0
for trial in range(n_batch):
    s = int(rng.choice([2, 3, 4, 6, 8]))
    b = int(rng.integers(16, 220))
    cb = rng.choice([16, 32, 64, 128, 256, 0])
    cb = None if cb == 0 else int(cb)  # None = auto chunk sizing
    mix = bool(rng.integers(0, 2))
    sparse = bool(rng.integers(0, 2))
    # a divisor-of-s mesh on about a third of trials (shard_map dispatch)
    divs = [d for d in (2, 4, 8) if s % d == 0 and d <= n_dev]
    mesh = make_mesh(int(rng.choice(divs)), ("src",)) \
        if divs and rng.integers(0, 3) == 0 else None
    i = np.arange(b)
    pos, kinds = [], []
    for si in range(s):
        kind = rng.choice(["mover", "holder", "wide"])
        kinds.append(kind[0])
        if kind == "mover":
            azi = (i * float(rng.choice([0.3, 1.3, 5.0])) + rng.uniform(0, 360)) % 360
            ele = np.clip(20 + 60 * np.sin(i / max(5, b / 6)), -40, 90)
        elif kind == "holder":
            hold = int(rng.integers(4, 60))
            azi = ((i // hold) * 15.0 + 30.0 * si) % 360
            ele = np.full(b, float(rng.integers(-40, 90)))
        else:
            azi = rng.uniform(0, 360, b)
            ele = rng.uniform(-40, 90, b)
        r = np.full(b, float(rng.uniform(0.1, 3.0)))
        pos.append(np.stack([azi, ele, r], axis=1))
    positions = np.stack(pos)
    sigs = np.stack([
        np.roll(sig_master, 997 * si)[: b * cfg.frames_per_buffer]
        for si in range(s)
    ])
    pf = bool(rng.integers(0, 2))  # pipelined fetch: bit-identical loop
    got = BatchRenderer(db, cfg, chunk_blocks=cb, fused=True, mix=mix,
                        mesh=mesh, sparse_xfade=sparse,
                        pipeline_fetch=pf).render(sigs, positions)
    want = BatchRenderer(db, cfg, chunk_blocks=cb, fused=False,
                         mix=mix).render(sigs, positions)
    rep = precision_check(got, want, eps=5e-7)
    worst_b = max(worst_b, rep.max_abs_diff)
    status = "ok" if rep.ok else "FAIL"
    print(f"[B{trial+1:3d}/{n_batch}] s={s} b={b:3d} cb={str(cb):>4s} "
          f"kinds={''.join(kinds):8s} mix={int(mix)} sp={int(sparse)} "
          f"pf={int(pf)} mesh={mesh.size if mesh else 0}: "
          f"max|diff|={rep.max_abs_diff:.2e} {status}")
    if not rep.ok:
        print(f"BATCH FUZZ FAILED: {rep}")
        sys.exit(1)
print(f"BATCH FUZZ PASSED: {n_batch} combos, worst max|diff| {worst_b:.2e} (eps 5e-7)")
