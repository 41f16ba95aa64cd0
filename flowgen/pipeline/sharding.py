"""Multi-chip sharded generation.

The reference's only scaling axis was OS threads on one host (SURVEY.md §2
parallelism table); multi-GPU Caffe would replicate the layer per process.
Here generation scales over a ``jax.sharding.Mesh``: the batch shards over the
``data`` axis with shard_map, every device rendering its sub-batch
independently — no collectives on the hot path, because sample content is a
pure function of the *global* sample index (counter-based keys), making output
identical for any device count.

The texture atlas is replicated (it is read-only and shared; DCN/ICI traffic
happens once at placement, never per step).
"""

from __future__ import annotations

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataGenConfig


def make_sharded_generate_fn(cfg: DataGenConfig, mesh: Mesh, axis: str = "data"):
    """Returns jitted ``fn(root, step, atlas) -> batch`` with outputs sharded
    over ``axis``. ``cfg.batch_size`` must divide evenly by the axis size."""
    from .generator import generate_batch  # local import to avoid a cycle

    n = mesh.shape[axis]
    if cfg.batch_size % n != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by mesh axis "
            f"'{axis}' of size {n}"
        )
    import dataclasses

    local_cfg = dataclasses.replace(cfg, batch_size=cfg.batch_size // n)

    def local_step(root, step, atlas):
        # Device ``di`` renders global sample indices
        # step*B + di*B_local + [0, B_local): the union over devices equals the
        # single-device index set for the same step, so content is invariant to
        # device count (per-sample keys depend only on the global index).
        di = lax.axis_index(axis)
        base = step * cfg.batch_size + di * local_cfg.batch_size
        return generate_batch(root, step, atlas, local_cfg, base_index=base)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(*[None] * 4)),
        out_specs=P(axis),
        # The renderer's lax.cond object-skipping mixes device-varying values
        # with replicated zero-init accumulators; that's semantically fine for
        # this embarrassingly-parallel program, so skip the vma type check.
        check_vma=False,
    )
    return jax.jit(sharded)


def replicate(mesh: Mesh, x):
    """Place an array fully replicated on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))
