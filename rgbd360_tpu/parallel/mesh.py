"""Multi-chip scale-out over a jax.sharding.Mesh.

The workload's parallel structure (SURVEY.md §2.3): independent frame-pair
registrations scale data-parallel over ICI-connected chips; the 8-sensor
dimension is a batch axis inside each registration; map-level ops
(relocalize-against-all-keyframes, loop-closure candidate sweeps) batch the
same way. There is no model state to shard — weights-equivalents (calibration
tables) are tiny and replicated.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgbd360_tpu.ops import photoicp
from rgbd360_tpu.parallel.batch import align_batch

PAIR_AXIS = "pairs"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(PAIR_AXIS,))


def shard_pairs(mesh: Mesh, *arrays):
    """Place batched arrays with the leading pair axis split over the mesh."""
    sharding = NamedSharding(mesh, P(PAIR_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def align_batch_sharded(
    mesh: Mesh,
    gray_src,
    depth_src,
    gray_trg,
    depth_trg,
    pose_guess,
    method: int = photoicp.PHOTO_DEPTH,
    n_levels: int = 5,
) -> photoicp.AlignResult:
    """Data-parallel batched registration: batch axis split over PAIR_AXIS.

    XLA partitions the whole fused program; no collectives are needed in the
    steady state because pairs are independent (gradients/Hessians are
    per-pair 6x6 — they never cross chips).
    """
    data_spec = NamedSharding(mesh, P(PAIR_AXIS))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        functools.partial(align_batch, method=method, n_levels=n_levels),
        in_shardings=(data_spec,) * 5,
        out_shardings=repl,
    )
    return fn(gray_src, depth_src, gray_trg, depth_trg, pose_guess)
