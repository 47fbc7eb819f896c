"""On-chip A/B: lane512 table layout on the GATHER (dedup+fused) form,
re-measured under the round-5 tail_tree contraction.

The original lane512 A/B (PERF.md round-5 lane512 section) measured the
gather forms at 0.89x and kept `LANE512_GATHER_DEFAULT = False` — but that
was with the PLAIN tail contraction.  tail_tree (now default) restructures
the tail into chunked 128-lane dot_generals and made the gather form
1.08-1.56x FASTER, so the interaction deserves a fresh measurement: with
the K dimension already split into 128-lane chunks, the lane-aligned
512-bin table may no longer pay the "wider gathered rows" penalty.

Methodology: the relay session drifts over minutes, so plain A-then-B
ordering biases the second arm (measured, PERF.md tail_tree section).
This script uses ABBA ordering — slope(A), slope(B), slope(B), slope(A) —
which cancels linear drift, and reports the pooled ratio plus both
per-position ratios so residual curvature is visible.

Run under the ambient axon env:

    python scripts/bench_lane512_gather_tree.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(run, k_short=2, k_long=10):
    t_s, t_l = run(k_short), run(k_long)
    return (t_l - t_s) / (k_long - k_short)


def main() -> int:
    from jefferson_tpu import DEFAULT_CONFIG, synthetic_database
    from jefferson_tpu.engine.batch import BatchRenderer
    from jefferson_tpu.trajectory.trajectory import StaticPosition

    cfg = DEFAULT_CONFIG
    db = synthetic_database(cfg)
    s, nb = 128, 64
    rng = np.random.default_rng(2)
    signals = (rng.standard_normal((s, nb * cfg.frames_per_buffer)) * 0.2
               ).astype(np.float32)
    positions = np.stack([
        StaticPosition(azi=(360 / s) * i, ele=5, r=0.9).sample(nb, cfg)
        for i in range(s)
    ])

    arms, outs, runners = {}, {}, {}
    for lane in (False, True):
        br = BatchRenderer(db, chunk_blocks=nb, dedup=True, fused=True,
                           lane512=lane)
        t0 = time.time()
        outs[lane] = br.render(signals, positions)
        dedup_fused = any(k[1] is not None and k[2] is not None
                          for k in br._jitted)
        log(f"[gather/tree] lane512={lane}: compile+first "
            f"{time.time()-t0:.1f}s (dedup+fused: {dedup_fused})")

        def run(k, br=br):
            t0 = time.time()
            for _ in range(k):
                br.render(signals, positions)
            return time.time() - t0

        run(3)  # warm
        runners[lane] = run
        arms[lane] = []

    # ABBA: cancels linear session drift.
    for lane in (False, True, True, False):
        per = slope(runners[lane])
        arms[lane].append(per)
        log(f"[gather/tree] lane512={lane}: {per*1e3:.2f} ms/render "
            f"({s*nb/per:,.0f} blocks/s)")

    d = float(np.abs(outs[True] - outs[False]).max())
    ms_off = sum(arms[False]) / 2 * 1e3
    ms_on = sum(arms[True]) / 2 * 1e3
    ratios = [arms[False][0] / arms[True][0], arms[False][1] / arms[True][1]]
    out = {"ms_off": ms_off, "ms_on": ms_on, "speedup": ms_off / ms_on,
           "ratio_outer_inner": ratios, "max_diff": d}
    log(f"[gather/tree] lane512 speedup {out['speedup']:.3f}x "
        f"(positional {ratios[0]:.3f}/{ratios[1]:.3f}), max|diff| {d:.3e}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
