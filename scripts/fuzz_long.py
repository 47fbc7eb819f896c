"""Deep dispatch fuzz: N random (geometry x trajectory) combos, fused vs XLA.

A release-strength version of tests/test_fuzz_parity.py::
test_fuzz_fused_dispatch_boundaries — run before cutting a release or after
any dispatch/planner change:  python scripts/fuzz_long.py [N]  (default 30).
Exercises every fused path (dedup+fused / one-hot / grouped / gather) plus
the partial-chunk, group-divisibility, and bucket-sizing boundaries.
"""
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
from jefferson_tpu.engine.renderer import Renderer
from jefferson_tpu.testing import precision_check

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
cfg = DEFAULT_CONFIG
db = synthetic_database(cfg)
rng = np.random.default_rng(2026)
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
    got = Renderer(db, cfg, chunk_blocks=cb, fused=True).render(sig, pos)
    want = Renderer(db, cfg, chunk_blocks=cb, fused=False).render(sig, pos)
    rep = precision_check(got, want, eps=5e-7)
    worst = max(worst, rep.max_abs_diff)
    status = "ok" if rep.ok else "FAIL"
    print(f"[{trial+1:3d}/{n}] b={b:3d} cb={cb:3d} {kind:6s}: "
          f"max|diff|={rep.max_abs_diff:.2e} {status}")
    if not rep.ok:
        print(f"FUZZ FAILED: {rep}")
        sys.exit(1)
print(f"FUZZ PASSED: {n} combos, worst max|diff| {worst:.2e} (eps 5e-7)")
