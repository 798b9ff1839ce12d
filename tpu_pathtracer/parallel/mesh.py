"""Device-mesh construction for the sharded render/train steps.

The reference is a single-queue, single-device browser app with no
communication backend of any kind (SURVEY.md §2 'Parallelism &
communication'); this module is the net-new TPU-native scaling layer: a 2-D
`jax.sharding.Mesh` whose axes are

  * ``tiles``   — the image's row-tile axis (data parallelism over pixels);
    each shard renders a contiguous horizontal band and the final image is
    assembled by the output sharding (an all-gather riding ICI),
  * ``samples`` — the Monte-Carlo sample axis; each shard renders the full
    band with a decorrelated RNG stream and partial radiance is combined with
    a ``psum``.

Multi-host runs use the same mesh over ``jax.devices()`` after
``jax.distributed.initialize`` — shard_map + XLA place the collectives on ICI
within a slice and DCN across hosts automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_TILES = "tiles"
AXIS_SAMPLES = "samples"


def make_mesh(
    tiles: Optional[int] = None,
    samples: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('tiles', 'samples') mesh.

    With `tiles=None`, all remaining devices go to the tile axis.  A
    single-device mesh (1, 1) is valid and makes every sharded function
    degenerate to the unsharded one — handy for tests.
    """
    devices = list(devices if devices is not None else jax.devices())
    if tiles is None:
        if len(devices) % samples != 0:
            raise ValueError(
                f"{len(devices)} devices do not divide into samples={samples}"
            )
        tiles = len(devices) // samples
    n = tiles * samples
    if n > len(devices):
        raise ValueError(f"mesh ({tiles}x{samples}) needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(tiles, samples)
    return Mesh(grid, (AXIS_TILES, AXIS_SAMPLES))


def single_device_mesh() -> Mesh:
    return make_mesh(tiles=1, samples=1)


def shard_map_compat_kwargs(shard_map_fn) -> dict:
    """shard_map kwargs; the value-varying-axes checker (check_vma) now runs
    at its DEFAULT (enabled).  Round 1 disabled it globally because loop
    carries initialized from literals inside the shard only become
    axis-varying through the body; those inits are now tainted with
    ray/seed-derived zeros at every site (ops/trace.py, ops/intersect.py,
    ops/mt_matmul.py, ops/envsample.py), so the checker passes — verified by
    tests/test_parallel.py which runs every sharded path with it on."""
    return {}
