"""Pipeline runtime + sharding tests (flowgen/pipeline/*): lifecycle parity
with the reference layer (Start/Stop/Pause/Resume, prefetch), stream
determinism/resume, and device-count invariance on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import flowgen
from flowgen.pipeline.sharding import make_sharded_generate_fn
from flowgen.random.streams import root_key

W, H = 128, 96


def _cfg(**kw):
    kw.setdefault("mode", 1)
    kw.setdefault("batch_size", 8)
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    return flowgen.DataGenConfig(**kw)


def test_generator_lifecycle_and_determinism():
    cfg = _cfg(batch_size=2, prefetch=2, seed=9)
    atlas = flowgen.procedural_atlas(3, height=H, width=W)
    g1 = flowgen.Generator(cfg, atlas=atlas, as_numpy=True).start()
    b0 = g1.retrieve_batch()
    b1 = g1.retrieve_batch()
    assert g1.has_retrievable_batches() or g1.step >= 2
    g1.pause()
    g1.resume()
    b2 = g1.retrieve_batch()
    g1.stop()

    # Fresh generator, same seed: identical stream.
    g2 = flowgen.Generator(cfg, atlas=atlas, as_numpy=True).start()
    np.testing.assert_array_equal(b0["image0"], g2.retrieve_batch()["image0"])
    g2.stop()

    # Resume from a recorded step: continues the exact stream.
    g3 = flowgen.Generator(cfg, atlas=atlas, start_step=2, as_numpy=True).start()
    np.testing.assert_array_equal(b2["flow0"], g3.retrieve_batch()["flow0"])
    g3.stop()

    assert not np.array_equal(b0["image0"], b1["image0"])


def test_iterator_protocol():
    cfg = _cfg(batch_size=1, prefetch=1)
    atlas = flowgen.procedural_atlas(2, height=H, width=W)
    gen = flowgen.Generator(cfg, atlas=atlas)
    it = iter(gen)
    batch = next(it)
    assert batch["image0"].shape == (1, H, W, 3)
    gen.stop()


def test_sharded_matches_single_device():
    # Content is a function of the global sample index, so the 8-way sharded
    # batch must equal the single-device batch exactly (SURVEY.md §2
    # distributed equivalent: per-device independent generation).
    cfg = _cfg(batch_size=8, seed=3)
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    root = root_key(cfg.seed)

    single = flowgen.make_generate_fn(cfg)(root, jnp.int32(0), atlas)

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    fn = make_sharded_generate_fn(cfg, mesh)
    sharded = fn(root, jnp.int32(0), atlas)

    for k in single:
        # XLA fuses the sharded program differently, so float reassociation
        # can shift a value by ~1 ulp; after u8 rounding that is at most one
        # intensity level on isolated pixels.
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]), atol=1.0
        )
        mismatched = (
            np.abs(np.asarray(single[k]) - np.asarray(sharded[k])) > 1e-4
        ).mean()
        assert mismatched < 1e-4


def test_sharded_mode9_matches_single_device():
    # Mode 9 routes through the hoisted warp-bank path (the bank is computed
    # once per epoch, replicated, and passed into the shard_map — see
    # sharding.py); content must still equal the single-device stream and the
    # host-side cache must survive consecutive steps within one bank epoch.
    cfg = _cfg(mode=9, batch_size=8, seed=5)
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    root = root_key(cfg.seed)

    single_fn = flowgen.make_generate_fn(cfg)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    sharded_fn = make_sharded_generate_fn(cfg, mesh)

    # Steps 0/1 share a bank epoch (cache-hit path); warp_bank_reuse_steps
    # crosses the epoch boundary (cache-refresh path).
    for step in (0, 1, cfg.warp_bank_reuse_steps):
        single = single_fn(root, jnp.int32(step), atlas)
        sharded = sharded_fn(root, jnp.int32(step), atlas)
        np.testing.assert_allclose(
            np.asarray(single["flow0"]),
            np.asarray(sharded["flow0"]),
            atol=1e-3,
        )
        for k in ("image0", "image1"):
            # Mode 9's warped binary-mask threshold (render.py
            # _warp_binary_threshold) sits on a knife edge: a 1-ulp fp
            # reassociation difference between the differently-fused sharded
            # and single-device programs can flip isolated pixels between the
            # object texture and the layer below. Allow a vanishing fraction
            # of such flips; everything else must agree to one u8 level.
            d = np.abs(np.asarray(single[k]) - np.asarray(sharded[k]))
            assert (d > 1.0).mean() < 5e-5, k
            assert np.median(d) == 0.0, k


def test_sharded_output_is_sharded():
    cfg = _cfg(batch_size=8)
    atlas = jnp.asarray(
        flowgen.procedural_atlas(2, height=H, width=W), jnp.float32
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = make_sharded_generate_fn(cfg, mesh)(
        root_key(0), jnp.int32(0), atlas
    )
    sharding = out["image0"].sharding
    assert len(sharding.device_set) == 8


def test_distribute_atlas_replicates():
    """Multi-host atlas init (single-process degenerate case): per-process
    blocks assemble into the global atlas, sharded over the mesh, then one
    all-gather replicates — result equals the monolithic atlas on every
    device."""
    from flowgen.pipeline.sharding import (
        distribute_atlas,
        texture_paths_for_process,
    )

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    atlas = np.asarray(
        flowgen.procedural_atlas(8, height=32, width=32), dtype=np.float32
    )
    out = distribute_atlas(mesh, jnp.asarray(atlas))
    assert out.shape == atlas.shape
    np.testing.assert_array_equal(np.asarray(out), atlas)
    assert out.sharding.is_fully_replicated

    # Path slicing: contiguous, cycle-padded, one equal block per process.
    paths = [f"t{i}.png" for i in range(10)]
    blocks = [texture_paths_for_process(paths, p, 4) for p in range(4)]
    assert all(len(b) == 3 for b in blocks)
    flat = [p for b in blocks for p in b]
    assert flat[:10] == paths and flat[10:] == paths[:2]


def test_mixed_mode_stream():
    """make_mixed_generate_fn: deterministic seekable mode choice, correct
    output signature, ingredient content identical to its single-mode
    stream at the same step."""
    from flowgen.pipeline.generator import (
        make_generate_fn,
        make_mixed_generate_fn,
    )
    from flowgen.random.streams import root_key

    cfgs = [
        flowgen.DataGenConfig(mode=m, batch_size=2, width=128, height=96,
                              seed=11, use_pallas="never")
        for m in (1, 3)
    ]
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=96, width=128), jnp.float32
    )
    fn = make_mixed_generate_fn(cfgs, weights=[0.5, 0.5])
    root = root_key(11)
    a = fn(root, jnp.int32(4), atlas)
    b = fn(root, jnp.int32(4), atlas)
    np.testing.assert_array_equal(np.asarray(a["flow0"]),
                                  np.asarray(b["flow0"]))
    # The chosen ingredient's batch equals its single-mode stream's batch.
    single_fns = [make_generate_fn(c) for c in cfgs]
    singles = [s(root, jnp.int32(4), atlas) for s in single_fns]
    match = [
        np.array_equal(np.asarray(a["flow0"]), np.asarray(s["flow0"]))
        for s in singles
    ]
    assert sum(match) == 1
    # Both ingredients appear over a window of steps.
    picked = set()
    for t in range(12):
        out = fn(root, jnp.int32(t), atlas)
        for i, sf in enumerate(single_fns):
            if np.array_equal(
                np.asarray(out["flow0"]),
                np.asarray(sf(root, jnp.int32(t), atlas)["flow0"]),
            ):
                picked.add(i)
        if picked == {0, 1}:
            break
    assert picked == {0, 1}

    # Signature mismatch is rejected.
    import pytest as _pytest

    bad = flowgen.DataGenConfig(mode=1, batch_size=4, width=128, height=96)
    with _pytest.raises(ValueError):
        make_mixed_generate_fn([cfgs[0], bad])
