"""Device-mesh utilities for multi-chip scaling.

The reference is single-GPU; its parallelism is 8 CUDA streams per source
(reference: Jefferson/src/GPUSoundSource.cu:20,36-38).  The TPU scaling
story is a 1-D (or 2-D) ``jax.sharding.Mesh``: independent source streams
shard across chips over ICI with zero hot-path collectives; the only
reduction is the optional mixdown (GSPMD inserts a psum over the source
axis).  There is no DCN component — multi-host would extend the same mesh
(documented N/A in SURVEY.md section 5).

Axis conventions:
  * ``src``  — data-parallel over concurrent source streams
  * ``blk``  — parallel over time blocks of one render (offline only;
               blocks are independent given the input)
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: tuple[str, ...] = ("src",)) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if len(axis_names) == 1:
        arr = np.array(devs[:n])
    elif len(axis_names) == 2:
        # favor a near-square factorization for 2-D meshes
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        arr = np.array(devs[:n]).reshape(a, n // a)
    else:
        raise ValueError("only 1-D or 2-D meshes supported")
    return Mesh(arr, axis_names)


def force_virtual_cpu(n: int) -> None:
    """Switch THIS process to an n-device virtual CPU platform.

    The child-process side of the re-exec dance (shared by
    ensure_virtual_devices and __graft_entry__'s dryrun): set the
    device-count flag before any backend is created, then force the
    platform via jax.config — this container's sitecustomize preloads jax
    under JAX_PLATFORMS=axon, so env vars alone are too late."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")


def ensure_virtual_devices(n: int) -> None:
    """Make sure >= n jax devices exist, re-execing the current script onto
    an n-device virtual CPU mesh if necessary.

    Call this at the top of a script (before any other backend use).  Three
    cases:
      * child marker set: we ARE the re-exec'd child — force the CPU
        platform via ``jax.config`` (this container's sitecustomize preloads
        jax under JAX_PLATFORMS=axon, so env vars alone are too late) and
        return.
      * enough devices already: return (no-op).
      * too few devices: re-exec ``sys.argv`` in a subprocess configured for
        an n-device virtual CPU mesh, then exit with its return code.
    """
    if os.environ.get("JT_VIRTUAL_MESH") == "1":
        force_virtual_cpu(n)
        return
    if len(jax.devices()) >= n:
        return
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["JT_VIRTUAL_MESH"] = "1"
    print(
        f"[jefferson_tpu] {len(jax.devices())} device(s) < {n}; "
        f"re-exec on an {n}-device virtual CPU mesh",
        file=sys.stderr,
    )
    # preserve `python -m pkg.mod` invocations: under -m, sys.argv[0] is the
    # module FILE, and re-running it as a plain script loses the package
    # context (relative imports break)
    import __main__

    spec = getattr(__main__, "__spec__", None)
    if spec is not None and spec.name:
        cmd = [sys.executable, "-m", spec.name] + sys.argv[1:]
    else:
        cmd = [sys.executable] + sys.argv
    rc = subprocess.call(cmd, env=env)
    sys.exit(rc)


def source_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (source) axis, replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
