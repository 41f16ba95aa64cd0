"""Occlusion + motion-boundary masks (cfg.emit_masks, fused path): the
painter's index images must match the oracle's, and the masks must follow
their generative definitions. The reference has no such outputs (the index
image exists internally, RenderCore cpp:740-774, but is never emitted)."""

import jax
import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.compose.fused import masks_from_ids, render_batch_fused
from flowgen.compose.render import prepare_atlas
from flowgen.ops.pallas_scene import prepare_bg_slabs, prepare_slabs
from flowgen.params.sampler import sample_scene_batch
from flowgen.random.streams import root_key
from flowgen.reference_check import oracle

W, H = 128, 96


def test_masks_match_oracle_ids():
    cfg = flowgen.DataGenConfig(
        mode=5, batch_size=2, width=W, height=H, use_pallas="never",
        emit_masks=True,
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    scenes = sample_scene_batch(root_key(4), jnp.arange(2), cfg,
                                n_warp_slots=1)
    i0, i1, fl, occ, mb = render_batch_fused(
        scenes, prepare_slabs(quad[..., :3], H, W),
        prepare_bg_slabs(quad[..., :3]), (2 * H, 2 * W), cfg, interpret=True,
    )
    occ, mb, fl = np.asarray(occ), np.asarray(mb), np.asarray(fl)

    for b in range(2):
        scene_b = jax.tree.map(lambda x: x[b], scenes)
        _, _, ofl, oid0, oid1 = oracle.render_scene_oracle(
            oracle.scene_to_numpy(scene_b), np.asarray(atlas), W, H,
            return_ids=True,
        )
        # Reconstruct the masks from the oracle's index images with the same
        # definitions and compare (boundary pixels may flip on coverage
        # knife edges).
        yy, xx = np.mgrid[0:H, 0:W]
        tx = np.round(xx + ofl[..., 0]).astype(int)
        ty = np.round(yy + ofl[..., 1]).astype(int)
        oob = (tx < 0) | (tx >= W) | (ty < 0) | (ty >= H)
        tgt = oid1[np.clip(ty, 0, H - 1), np.clip(tx, 0, W - 1)]
        o_occ = oob | (tgt != oid0)
        assert (occ[b] != o_occ).mean() < 0.02

        p = np.pad(oid0, 1, mode="edge")
        o_mb = (
            (oid0 != p[:-2, 1:-1]) | (oid0 != p[2:, 1:-1])
            | (oid0 != p[1:-1, :-2]) | (oid0 != p[1:-1, 2:])
        )
        assert (mb[b] != o_mb).mean() < 0.02

    # Sanity: scenes with moving objects produce some occlusion and
    # boundaries, but not everywhere.
    assert 0.0 < occ.mean() < 0.7
    assert 0.0 < mb.mean() < 0.5


def test_windowed_masks_match_fused():
    """emit_masks on the windowed fallback path (use_pallas='never'):
    index-image-derived masks must equal the fused path's exactly (rigid
    modes share exact coverage/flow math across the two paths)."""
    from flowgen.pipeline.generator import generate_batch

    cfg = flowgen.DataGenConfig(
        mode=5, batch_size=2, width=W, height=H, use_pallas="never",
        emit_masks=True,
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    scenes = sample_scene_batch(root_key(4), jnp.arange(2), cfg,
                                n_warp_slots=1)
    _, _, _, occ_f, mb_f = render_batch_fused(
        scenes, prepare_slabs(quad[..., :3], H, W),
        prepare_bg_slabs(quad[..., :3]), (2 * H, 2 * W), cfg, interpret=True,
    )
    out = generate_batch(root_key(4), jnp.int32(0), atlas, cfg)
    np.testing.assert_array_equal(
        np.asarray(out["occlusion"]), np.asarray(occ_f)
    )
    np.testing.assert_array_equal(
        np.asarray(out["motion_boundary"]), np.asarray(mb_f)
    )


def test_masks_generative_properties():
    ids = jnp.array(
        [[[1, 1, 10, 10],
          [1, 1, 10, 10],
          [1, 1, 1, 1]]], jnp.int32
    )
    ids = jnp.stack([ids, jnp.roll(ids, 1, axis=-1)], 1)  # obj moves right 1px
    fx = jnp.where(ids[:, 0] == 10, 1.0, 0.0)
    fy = jnp.zeros_like(fx)
    occ, mb = masks_from_ids(ids, fx, fy)
    occ = np.asarray(occ[0])
    # Background pixels whose target is covered by the moved object: the
    # bg pixel at column 0 row 0 stays bg (target id 1) -> not occluded;
    # bg at (0, 3)? target ids computed per the frame-1 image.
    ids1 = np.asarray(ids[0, 1])
    yy, xx = np.mgrid[0:3, 0:4]
    raw_tx = xx + np.asarray(fx[0]).astype(int)
    oob = raw_tx >= 4
    tx = np.clip(raw_tx, 0, 3)
    expect = oob | (ids1[yy, tx] != np.asarray(ids[0, 0]))
    np.testing.assert_array_equal(occ, expect)
    assert np.asarray(mb[0]).any()
