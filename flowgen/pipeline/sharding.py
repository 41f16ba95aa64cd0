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

    def local_step(root, step, atlas, slabs, warp_bank=None, warp_aux=None):
        # Device ``di`` renders global sample indices
        # step*B + di*B_local + [0, B_local): the union over devices equals the
        # single-device index set for the same step, so content is invariant to
        # device count (per-sample keys depend only on the global index).
        di = lax.axis_index(axis)
        base = step * cfg.batch_size + di * local_cfg.batch_size
        return generate_batch(
            root, step, atlas, local_cfg, base_index=base,
            warp_bank=warp_bank, slabs=slabs, warp_aux=warp_aux,
        )

    def shmap(fn, in_specs):
        return jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis),
            # The renderer's lax.cond object-skipping mixes device-varying
            # values with replicated zero-init accumulators; that's
            # semantically fine for this embarrassingly-parallel program, so
            # skip the vma type check.
            check_vma=False,
        )

    from .generator import make_atlas_packer, make_slab_packer, use_fused_path

    packed = make_atlas_packer()
    # Fused-path texture slabs are step-invariant: cache them host-side and
    # pass replicated (deriving them inline would rebuild the packed slabs on
    # every device every step). P() = fully replicated for any leaf rank.
    import dataclasses as _dc

    slab_of = make_slab_packer(_dc.replace(cfg, batch_size=local_cfg.batch_size))

    if cfg.mode_spec.warp_p == 0.0:
        def rigid_step(root, step, atlas, slabs):
            return local_step(root, step, atlas, slabs)

        gen = jax.jit(shmap(rigid_step, (P(), P(), P(), P())))

        def fn(root, step, atlas):
            a = packed(atlas)
            return gen(root, step, a, slab_of(a))

        return fn

    # Mode 9: the warp-crop bank is identical on every device (it is keyed by
    # (root, bank epoch), not by sample index), so deriving it inside
    # local_step would recompute the 1536^2 x 17-iteration field composition
    # replicated on every device EVERY step. Instead it is computed once per
    # ``warp_bank_reuse_steps`` epoch, replicated over the mesh, and passed
    # through as a plain input — the deterministic analog of the reference
    # CropGenerator's crop reuse (WarpFields.cpp:516-538), same host-side
    # caching as make_generate_fn's unsharded branch.
    from ..warpfields import generator as warpgen
    from .generator import BankEpochCache

    gen = jax.jit(shmap(local_step, (P(), P(), P(), P(), P(), P())))
    import functools

    import jax.numpy as jnp

    bank_fn = jax.jit(
        functools.partial(warpgen.make_warp_bank, cfg=cfg),
        out_shardings=NamedSharding(mesh, P()),
    )
    fused = use_fused_path(_dc.replace(cfg, batch_size=local_cfg.batch_size))
    build_fn = (
        jax.jit(
            functools.partial(warpgen.make_bank_and_aux, cfg=cfg),
            out_shardings=NamedSharding(mesh, P()),
        )
        if fused
        else None
    )
    bank_cache = BankEpochCache(bank_fn, None, cfg.warp_bank_reuse_steps,
                                build_fn=build_fn)

    def fn(root, step, atlas):
        bank, aux = bank_cache.get(root, int(step))
        a = packed(atlas)
        out = gen(root, jnp.int32(step), a, slab_of(a), bank, aux)
        bank_cache.prefetch_next(root, int(step))
        return out

    return fn


def replicate(mesh: Mesh, x):
    """Place an array fully replicated on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def texture_paths_for_process(paths, process_index=None, process_count=None):
    """Contiguous per-process slice of a texture DB path list for
    :func:`distribute_atlas`. The list is padded by cycling so every process
    decodes the same count (texture lookup is modulo the table size,
    DataGenerator.cpp:158-161, so the repeats only reweight those sources by
    one extra slot)."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    paths = list(paths)
    per = -(-len(paths) // n)
    padded = paths + [paths[i % len(paths)] for i in range(per * n - len(paths))]
    return padded[p * per : (p + 1) * per]


def distribute_atlas(mesh: Mesh, local_textures, axis: str = "data"):
    """Multi-host atlas placement with ONE startup all-gather.

    The reference loads the ENTIRE texture DB on every node
    (TextureCollection ctor, DataGenerator.cpp:117-149). Here each process
    reads and decodes only its slice of the path list
    (:func:`texture_paths_for_process`) and passes the decoded
    ``(T_local, H, W, 3)`` block; the global atlas is assembled sharded over
    ``axis`` from the per-process blocks and replicated by one jitted
    identity with replicated out-sharding — XLA inserts a single all-gather
    that rides ICI/DCN once at init. Generation itself never communicates
    (the hot path is embarrassingly parallel).

    The global texture order is process-major (process 0's block first), so
    sampled ``tex_id % T`` content is a function of the process count —
    choose the decode split once per deployment. Returns the fully
    replicated ``(T_local * n_processes, H, W, 3)`` atlas."""
    n = jax.process_count()
    global_shape = (local_textures.shape[0] * n,) + local_textures.shape[1:]
    sharded = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), local_textures, global_shape
    )
    return jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P())
    )(sharded)
