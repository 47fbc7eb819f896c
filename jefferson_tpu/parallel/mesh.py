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


def source_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (source) axis, replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
