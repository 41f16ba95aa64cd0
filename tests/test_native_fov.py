"""Heterogeneous texture field-of-view (TextureDB): the fused path's crop
geometry must follow each source's NATIVE resolution — crop for large
sources, whole-image resize for small ones (Texture::getRandomizedCrop,
src/caffe/DataGenerator.cpp:87-109) — matching the oracle's literal CImg
chain per source. The canonical-resize path (plain arrays) remains the
documented fallback behavior."""

import jax
import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.compose.fused import render_batch_fused
from flowgen.ops.pallas_scene import prepare_bg_slabs_db, prepare_obj_slabs
from flowgen.params.sampler import sample_scene_batch
from flowgen.random.streams import root_key
from flowgen.reference_check import oracle
from flowgen.texture_io import build_texture_db

W, H = 128, 96


def _natives(seed=0):
    rng = np.random.default_rng(seed)

    def tex(h, w):
        base = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
        return np.kron(base, np.ones((8, 8, 1), np.uint8))[:h, :w]

    # canonical-sized, small (fallback), large (tighter FOV than canonical)
    return [tex(2 * H, 2 * W), tex(150, 170), tex(400, 520)]


def test_mixed_resolution_matches_oracle():
    natives = _natives()
    db = build_texture_db(natives, height=H, width=W)
    cfg = flowgen.DataGenConfig(
        mode=5, batch_size=4, width=W, height=H, use_pallas="never"
    )
    scenes = sample_scene_batch(root_key(21), jnp.arange(4), cfg,
                                n_warp_slots=1)
    out = render_batch_fused(
        scenes,
        prepare_obj_slabs(jnp.asarray(db.obj_tex)),
        prepare_bg_slabs_db(db.sources, db.sizes),
        (2 * H, 2 * W),
        cfg,
        interpret=True,
        tex_sizes=jnp.asarray(db.sizes),
    )
    i0, i1, fl = [np.asarray(x) for x in out]

    used_small = used_large = False
    for b in range(4):
        scene_b = jax.tree.map(lambda x: x[b], scenes)
        o0, o1, ofl = oracle.render_scene_oracle(
            oracle.scene_to_numpy(scene_b), natives, W, H,
            obj_tex_np=db.obj_tex,
        )
        tid = int(scene_b.background.tex_id) % 3
        used_small |= tid == 1
        used_large |= tid == 2
        # Flow is texture-independent; frames must match the literal
        # native-resolution chain with the standard oracle tolerances.
        dfl = np.abs(np.asarray(fl[b]) - ofl).max(-1)
        assert np.median(dfl) < 1e-3
        assert (dfl > 0.1).mean() < 0.01  # f32 knife-edge boundary flips
        assert np.median(np.abs(i0[b] - o0)) <= 2.0, tid
        assert np.median(np.abs(i1[b] - o1)) <= 3.0, tid
        assert (np.abs(i0[b] - o0).mean(-1) < 8).mean() > 0.8, tid
    assert used_small or used_large  # the seeds exercise non-canonical FOV


def test_fov_differs_from_canonical_resize():
    """The native path must actually change appearance for non-canonical
    sources: a large source's crop shows a smaller field of view than its
    canonical resize would."""
    natives = _natives()
    db = build_texture_db(natives, height=H, width=W)
    cfg = flowgen.DataGenConfig(
        mode=1, batch_size=3, width=W, height=H, use_pallas="never"
    )
    scenes = sample_scene_batch(root_key(21), jnp.arange(3), cfg,
                                n_warp_slots=1)
    native_out = render_batch_fused(
        scenes,
        prepare_obj_slabs(jnp.asarray(db.obj_tex)),
        prepare_bg_slabs_db(db.sources, db.sizes),
        (2 * H, 2 * W), cfg, interpret=True,
        tex_sizes=jnp.asarray(db.sizes),
    )
    from flowgen.compose.render import prepare_atlas
    from flowgen.ops.pallas_scene import prepare_bg_slabs, prepare_slabs

    quad = jax.jit(prepare_atlas)(jnp.asarray(db.canonical, jnp.float32))
    canon_out = render_batch_fused(
        scenes,
        prepare_slabs(quad[..., :3], H, W),
        prepare_bg_slabs(quad[..., :3]),
        (2 * H, 2 * W), cfg, interpret=True,
    )
    tids = np.asarray(scenes.background.tex_id) % 3
    diffs = np.abs(np.asarray(native_out[0]) - np.asarray(canon_out[0]))
    # Samples with a non-canonical background source must look substantially
    # different (the canonical resize changes the crop's field of view).
    # Samples with the canonical-sized background can still differ on object
    # pixels (objects draw their own textures), so only the positive
    # direction is asserted.
    noncanon = [b for b in range(3) if tids[b] != 0]
    assert noncanon, tids
    # At least one non-canonical-background sample must show the FOV change
    # (a sample whose background is fully occluded by objects coincides
    # trivially, so not every sample is required to differ).
    assert max(diffs[b].mean() for b in noncanon) > 5.0, (
        [float(diffs[b].mean()) for b in noncanon]
    )
