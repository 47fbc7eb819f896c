"""Multi-process ('host','chip') mesh dryrun (round 5).

Spawns 2 coordinated processes x 2 virtual CPU devices via
``jax.distributed`` and checks that the source-sharded batched step with a
cross-process psum mixdown matches an unsharded render (the worker asserts
it; run_multiprocess_dryrun raises on any process failure).  Small device
counts keep the Gloo setup fast inside the suite; __graft_entry__'s stage
(f) runs the 2x4 shape.
"""

import pytest

from jefferson_tpu.parallel.multihost import run_multiprocess_dryrun


def test_multiprocess_dryrun_2x2():
    # run_multiprocess_dryrun enforces its own per-process timeout
    run_multiprocess_dryrun(num_processes=2, local_devices=2, timeout=240.0)
