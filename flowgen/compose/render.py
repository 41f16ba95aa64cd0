"""Scene rendering: coverage, compositing, and ground-truth flow synthesis.

This module is the TPU-native replacement for the reference's entire render
stack — the MovingObject class hierarchy (src/caffe/DataGenerator.cpp:260-718),
RenderCore (cpp:740-818), and the per-sample worker pipeline
Process_TaskBucket (cpp:1175-1254). The reference renders each object on its
own CPU thread (masks via AGG scanlines, textures via AGG warps) and then
composites sequentially; here the *whole sample* is one fused XLA program:

  for each on-screen object (ascending id = painter's order):
      coverage  = mask algebra over the object's primitives (analytic, per-pixel)
      frame0/1  = alpha blend of the object's texture (blitObject, cpp:762-799)
      flow      = where(fully covered in frame 0, object flow, flow)
                  (computeFlowImage, cpp:801-818: the index image is exactly
                   "last object whose binary mask covers the pixel")

Occlusion therefore needs no index image at all: ascending-id overwrite *is*
the painter's algorithm.

Performance shape (the XLA-level analog of a tiled rasterizer):

* Screen bounding boxes of every primitive are computed DENSELY up front
  (vectorized over all object/component slots — a few-KFLOP side computation),
  so the hot loop contains no per-object geometry control flow.
* The object loop runs with a *runtime* trip count over a compacted index list
  of on-screen objects only (~2/3 of sampled objects land fully off-frame by
  construction of the placement distribution and are never touched).
* Each on-screen object evaluates coverage / texture / blending only on a
  dynamically positioned WINDOW around its bbox (lax.switch over static window
  classes + dynamic_update_slice into the accumulators). Outside the window
  the object provably contributes nothing (bbox + AA margin), so results are
  bit-identical to full-frame evaluation.
* All texture resampling uses quad-packed gather tables (ops/texture.py
  make_quad): one TPU gather per bilinear tap set instead of four.

Background handling (MovingObjectBackground, cpp:654-718): the background's
2Wx2H randomized crop + motion warp + center-crop construction composes into
one affine per frame, so each background frame is a single WxH gather — the
reference's 4x-size intermediate texture never exists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DataGenConfig
from ..ops import affine, raster, texture
from ..ops.pallas_raster import object_window_pallas, polygon_coverage_pallas
from ..params.blueprint import Scene


def _pallas_enabled(cfg: DataGenConfig) -> bool:
    if cfg.use_pallas == "always":
        return True
    if cfg.use_pallas == "never":
        return False
    return jax.default_backend() != "cpu"

# Static window classes for per-object evaluation: (height, width). ``None``
# means full frame. Sizes are TPU-layout friendly (sublane x lane multiples).
WINDOW_CLASSES = ((192, 256), None)
AA_MARGIN = 2.0          # AA feather reaches 0.5 px outside the outline
WARP_MARGIN = 48.0       # max |iflow| of composed warp fields (~40 px)


class WarpBank(NamedTuple):
    """Bank of nonrigid deformation crops for mode 9 (CropGenerator output,
    WarpFields.cpp:516-538). flow/iflow: (N, H, W, 2)."""

    flow: jax.Array
    iflow: jax.Array


class RenderOutput(NamedTuple):
    image0: jax.Array   # (H, W, 3) float32 in [0, 255]
    image1: jax.Array   # (H, W, 3) float32 in [0, 255]
    flow0: jax.Array    # (H, W, 2) forward flow, pixels
    flow1: Optional[jax.Array]  # (H, W, 2) inverse flow or None
    ids: Optional[jax.Array] = None  # (2, H, W) int32 index images or None


def prepare_atlas(atlas):
    """Pack a (T, SH, SW, 3) uint8 texture atlas into quad gather tables
    (T, SH, SW, 12) uint8 — see ops/texture.make_quad."""
    atlas = jnp.asarray(atlas)
    if atlas.dtype != jnp.uint8:
        atlas = jnp.clip(jnp.round(atlas), 0, 255).astype(jnp.uint8)
    return jax.vmap(texture.make_quad)(atlas)


class WarpPlanes(NamedTuple):
    """Channel-split warp bank: four (N, H, W) planes. TPU tiled layouts pad
    the last two dims to (8, 128), so any xy-minor (..., 2) array carries a
    64x physical footprint; carrying the bank's (N, H, W, 2) arrays into the
    per-sample render loop makes XLA materialize whole-bank copies in that
    layout (2 x 7.5 GB for a reference-diversity 80-slot 384x512 bank — an
    HBM OOM). Split once outside the loop, the bank stays at its unpadded
    size and per-object slices touch single planes."""

    fx: jax.Array
    fy: jax.Array
    ix: jax.Array
    iy: jax.Array


def _bank_planes(bank):
    """Normalize a WarpBank to WarpPlanes (idempotent, None-transparent)."""
    if bank is None or isinstance(bank, WarpPlanes):
        return bank
    return WarpPlanes(
        fx=bank.flow[..., 0], fy=bank.flow[..., 1],
        ix=bank.iflow[..., 0], iy=bank.iflow[..., 1],
    )


def _sample_warp_crop(planes: WarpPlanes, slot):
    sl = lambda p: lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)
    f = jnp.stack([sl(planes.fx), sl(planes.fy)], axis=-1)
    i = jnp.stack([sl(planes.ix), sl(planes.iy)], axis=-1)
    return f, i


def _bilinear_flow_at(field, x, y):
    """Sample a (H, W, 2) flow field at float coords with zero outside and NaN
    scrubbed (the reference leaves signaling NaNs in flagged warp-field pixels,
    WarpFields.cpp:389-398; scrubbing keeps training data finite)."""
    v = texture.sample_bilinear(jnp.nan_to_num(field), x, y, wrap="zero")
    return v[..., 0], v[..., 1]


def _warp_binary_threshold(warped):
    """A warped binary mask counts as 'fully covering' only where the bilinear
    interpolation of the 0/1 mask stays at 1 (the reference warps the u8 mask
    and then tests == 255, cpp:370-386 + 765-773)."""
    return warped >= 1.0 - (0.5 / 255.0)


# ---------------------------------------------------------------------------
# Vectorized per-object geometry (outside the hot loop)
# ---------------------------------------------------------------------------


def _all_bboxes(prims, motions):
    """Union screen bboxes of every object's valid primitives for both frames,
    densely over all [K, C] slots. Exact for polygons (min/max of transformed
    outline points) and ellipses (affine ellipse extents).

    Returns ((lo0, hi0), (lo1, hi1)) with [K, 2] leaves (x, y)."""
    intr = prims.intrinsic                                  # [K,C,2,3]
    tr1 = affine.compose(intr, motions[:, None])            # [K,C,2,3]

    def bbox(tr):
        pts = affine.apply(tr, prims.edge_pts)              # [K,C,E,2]
        pmin = jnp.min(pts, axis=2)
        pmax = jnp.max(pts, axis=2)
        center = tr[..., 2]                                 # [K,C,2]
        lin = tr[..., :2]                                   # [K,C,2,2]
        ext = jnp.sqrt(
            (lin[..., 0] * prims.ell_rx[..., None]) ** 2
            + (lin[..., 1] * prims.ell_ry[..., None]) ** 2
        )                                                   # [K,C,2]
        is_poly = prims.is_poly[..., None]
        lo = jnp.where(is_poly, pmin, center - ext)
        hi = jnp.where(is_poly, pmax, center + ext)
        big = 1e9
        valid = prims.valid[..., None]
        lo = jnp.where(valid, lo, big)
        hi = jnp.where(valid, hi, -big)
        return jnp.min(lo, axis=1), jnp.max(hi, axis=1)     # [K,2]

    return bbox(jnp.broadcast_to(intr, tr1.shape)), bbox(tr1)


def _offscreen(lo, hi, margin, H, W):
    """[K]-vectorized: bbox (+margin) misses the frame entirely."""
    return (
        (hi[:, 0] < -margin)
        | (lo[:, 0] > W + margin)
        | (hi[:, 1] < -margin)
        | (lo[:, 1] > H + margin)
    )


def _size_classes(lo, hi, margin, classes):
    """[K]-vectorized smallest window class whose size fits bbox + margin.
    ``classes``: static tuple of (wh, ww) with a trailing ``None`` = full."""
    w = hi[:, 0] - lo[:, 0] + 2 * margin
    h = hi[:, 1] - lo[:, 1] + 2 * margin
    cls = jnp.full(w.shape, len(classes) - 1, jnp.int32)
    for i in reversed(range(len(classes) - 1)):
        wh, ww = classes[i]
        fits = (w <= ww) & (h <= wh)
        cls = jnp.where(fits, i, cls)
    return cls


def _window_origin(bmin, bmax, wh, ww, H, W):
    cx = (bmin[0] + bmax[0]) * 0.5
    cy = (bmin[1] + bmax[1]) * 0.5
    x0 = jnp.clip(jnp.round(cx - ww / 2.0).astype(jnp.int32), 0, W - ww)
    y0 = jnp.clip(jnp.round(cy - wh / 2.0).astype(jnp.int32), 0, H - wh)
    return y0, x0


def _window_grids(y0, x0, wh, ww):
    ys = y0.astype(jnp.float32) + jnp.arange(wh, dtype=jnp.float32)
    xs = x0.astype(jnp.float32) + jnp.arange(ww, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return px, py


def _object_kernel_inputs(prims, k, motion_k, flow_motion, frame, n_prims_k, x0, y0):
    """Pack one object's primitives into the fused kernel's SMEM operands
    (see ops/pallas_raster.object_window_pallas)."""
    intr = prims.intrinsic[k]                          # [C,2,3]
    tr = intr if frame == 0 else affine.compose(intr, motion_k)
    pts = affine.apply(tr, prims.edge_pts[k])          # [C,E,2]
    b = jnp.roll(pts, -1, axis=1)
    C, E = pts.shape[0], pts.shape[1]
    edges = jnp.stack(
        [pts[..., 0], pts[..., 1], b[..., 0], b[..., 1]], axis=0
    ).reshape(4, C * E)
    meta = jnp.concatenate(
        [
            jnp.stack([n_prims_k, x0, y0]).astype(jnp.int32),
            prims.additive[k].astype(jnp.int32),
            prims.is_poly[k].astype(jnp.int32),
            prims.n_edges[k].astype(jnp.int32),
        ]
    )
    inv = affine.invert(tr)                            # [C,2,3]
    ell = jnp.concatenate(
        [
            inv.reshape(C, 6),
            prims.ell_rx[k][:, None],
            prims.ell_ry[k][:, None],
        ],
        axis=1,
    ).reshape(C * 8)
    fmeta = jnp.concatenate([flow_motion.reshape(6), ell])
    return edges, meta, fmeta


def _frame_coverage(prims, k, motion_k, frame, px, py, n_prims_k, use_pallas):
    """Coverage of one object for one frame on an arbitrary pixel grid: mask
    algebra over primitive slots 0..n_prims-1 (MovingObjectComposite::
    renderMasks order, cpp:591-646; simple objects are one additive
    primitive). Primitive slots are packed, so the loop trip count is the
    actual component count — no per-slot validity branches."""
    shape = px.shape
    acc = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool))

    def component(c, acc):
        aa_acc, in_acc = acc
        intr = prims.intrinsic[k, c]
        tr = intr if frame == 0 else affine.compose(intr, motion_k)

        def poly(_):
            pts = affine.apply(tr, prims.edge_pts[k, c])
            if use_pallas:
                return polygon_coverage_pallas(
                    pts, prims.n_edges[k, c], px, py
                )
            return raster.polygon_coverage(pts, px, py)

        def ellipse(_):
            return raster.ellipse_coverage(
                tr, prims.ell_rx[k, c], prims.ell_ry[k, c], px, py
            )

        aa, inside = lax.cond(prims.is_poly[k, c], poly, ellipse, None)
        additive = prims.additive[k, c]
        a_aa, a_in = raster.combine_additive(aa_acc, in_acc, aa, inside)
        s_aa, s_in = raster.combine_subtractive(aa_acc, in_acc, aa, inside)
        return (
            jnp.where(additive, a_aa, s_aa),
            jnp.where(additive, a_in, s_in),
        )

    return lax.fori_loop(0, n_prims_k, component, acc)


def background_pass(scene: Scene, atlas: jax.Array, cfg: DataGenConfig,
                    warp_bank: Optional[WarpBank] = None):
    """Background frames + initial flow planes for one scene
    (MovingObjectBackground, cpp:654-718). ``atlas`` is quad-packed.
    Returns (frame0, frame1, flow_x, flow_y, iflow_x, iflow_y)."""
    H, W = cfg.height, cfg.width
    SH, SW = atlas.shape[1], atlas.shape[2]
    has_warp = warp_bank is not None and cfg.mode_spec.warp_p > 0.0
    warp_bank = _bank_planes(warp_bank)
    ix, iy = raster.pixel_grid(W, H, 0.0)      # integer coords (flow/texture)
    cx, cy = W / 2.0, H / 2.0
    bg = scene.background

    # Slice + barrier the sample's texture, then gather from the small table:
    # gathers from the full stacked atlas run ~3x slower per row (HBM
    # random-access latency grows with table size), so this function must be
    # lax.map'ed over a batch, never vmapped (vmap would also turn the slice
    # into a full per-sample texture materialization).
    src_quad = lax.optimization_barrier(
        lax.dynamic_index_in_dim(atlas, bg.tex_id % atlas.shape[0], 0, False)
    )

    def bg_sample(x, y):
        return texture.sample_bilinear_quad(src_quad, x, y, wrap="reflect")

    crop_t = texture.randomized_crop_transform(
        SH, SW, 2 * H, 2 * W,
        bg.tex_rot_deg, bg.tex_zoom, bg.tex_shift[0], bg.tex_shift[1],
    )
    # Pixel motion about the image center: the reference's intrinsic-conjugated
    # big-texture construction (+ getPointFlow cpp:692-718) reduces to
    # conjugate_about(M_bg, center).
    bg_pixel_motion = affine.conjugate_about(bg.motion, cx, cy)
    bg_big_motion = affine.conjugate_about(bg.motion, float(W), float(H))
    bg_big_inv = affine.invert(bg_big_motion)

    qx, qy = ix + cx, iy + cy                  # big-texture coords of our pixels
    s0x, s0y = affine.apply_xy(crop_t, qx, qy)
    frame0 = bg_sample(s0x, s0y)

    if has_warp:
        bgf, bgi = _sample_warp_crop(warp_bank, bg.warp_slot)

        # The background field is the WxH crop resized x2 with magnitudes x2
        # (cpp:1194-1202). Sample it implicitly: value at big coord q is
        # 2 * field((q + 0.5)/2 - 0.5).
        def big_field_at(field, x, y):
            fx, fy = _bilinear_flow_at(field, (x + 0.5) / 2.0 - 0.5,
                                       (y + 0.5) / 2.0 - 0.5)
            return 2.0 * fx, 2.0 * fy

        # cond, not where: only ~bg_warp_p of samples deform, and the field
        # gathers (3M+ rows over the 2Wx2H grid) are the warp path's single
        # biggest XLA cost. Under lax.map the untaken branch is skipped.
        def displaced(_):
            idx, idy = big_field_at(bgi, qx, qy)
            return qx + idx, qy + idy

        wq_x, wq_y = lax.cond(bg.warp, displaced, lambda _: (qx, qy), None)
    else:
        wq_x, wq_y = qx, qy
    bx, by = affine.apply_xy(bg_big_inv, wq_x, wq_y)
    s1x, s1y = affine.apply_xy(crop_t, bx, by)
    frame1 = bg_sample(s1x, s1y)

    # Pinned products: the megakernel evaluates this same expression
    # in-kernel (flow init); apply_xy_det keeps the two bit-identical.
    fqx, fqy = affine.apply_xy_det(bg_pixel_motion, ix, iy)
    flow_x = fqx - ix
    flow_y = fqy - iy
    if has_warp:
        # Forward warp-field contribution at the moved position, in big coords,
        # gated on landing inside the 2Wx2H field (cpp:714-717).
        def flow_displaced(_):
            mx, my = fqx + cx, fqy + cy
            wfx, wfy = big_field_at(bgf, mx, my)
            inb = (mx >= 0) & (mx < 2 * W) & (my >= 0) & (my < 2 * H)
            return jnp.where(inb, wfx, 0.0), jnp.where(inb, wfy, 0.0)

        afx, afy = lax.cond(
            bg.warp, flow_displaced,
            lambda _: (jnp.zeros_like(flow_x), jnp.zeros_like(flow_y)), None,
        )
        flow_x = flow_x + afx
        flow_y = flow_y + afy

    frame0 = jnp.round(frame0)
    frame1 = jnp.round(frame1)

    if cfg.compute_inverse_flow:
        bg_inv_pixel = affine.invert(bg_pixel_motion)
        iqx, iqy = affine.apply_xy_det(bg_inv_pixel, ix, iy)
        iflow_x, iflow_y = iqx - ix, iqy - iy
    else:
        iflow_x = jnp.zeros_like(flow_x)
        iflow_y = jnp.zeros_like(flow_y)
    return frame0, frame1, flow_x, flow_y, iflow_x, iflow_y


def background_flow(scene: Scene, cfg: DataGenConfig):
    """The flow planes of :func:`background_pass` without the frames — no
    texture gathers, so freely vmappable. The scene megakernel evaluates the
    SAME expressions in-kernel from the bgm pixel-motion scalars
    (ops/pallas_scene.py flow init); this function remains the XLA statement
    of that contract (tested by test_render.py) and a dev-tool probe."""
    H, W = cfg.height, cfg.width
    ix, iy = raster.pixel_grid(W, H, 0.0)
    bg_pixel_motion = affine.conjugate_about(
        scene.background.motion, W / 2.0, H / 2.0
    )
    fqx, fqy = affine.apply_xy_det(bg_pixel_motion, ix, iy)
    flow_x = fqx - ix
    flow_y = fqy - iy
    if cfg.compute_inverse_flow:
        inv = affine.invert(bg_pixel_motion)
        iqx, iqy = affine.apply_xy_det(inv, ix, iy)
        return flow_x, flow_y, iqx - ix, iqy - iy
    z = jnp.zeros_like(flow_x)
    return flow_x, flow_y, z, z


def render_sample(
    scene: Scene,
    atlas: jax.Array,
    cfg: DataGenConfig,
    warp_bank: Optional[WarpBank] = None,
) -> RenderOutput:
    """Render one scene blueprint into (image0, image1, flow) — the fused
    equivalent of Process_TaskBucket (cpp:1175-1254). ``atlas`` is the
    quad-packed uint8 atlas from :func:`prepare_atlas`."""
    H, W = cfg.height, cfg.width
    SH, SW = atlas.shape[1], atlas.shape[2]
    use_pallas = _pallas_enabled(cfg)
    has_warp = warp_bank is not None and cfg.mode_spec.warp_p > 0.0
    warp_bank = _bank_planes(warp_bank)
    emit_ids = cfg.emit_masks
    # The per-object fused kernel (object_window_pallas) does not carry an id
    # plane; with emit_masks the composed (XLA) branches run for every object
    # so the painter's index images (RenderCore cpp:740-774) can be written.
    # This path is the capability fallback, not the hot path — the scene
    # megakernel emits ids natively (ops/pallas_scene.py write_ids).
    use_pallas_obj = use_pallas and not emit_ids

    frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = background_pass(
        scene, atlas, cfg, warp_bank
    )
    if emit_ids:
        from ..config import BACKGROUND_OBJ_ID, FOREGROUND_ID_BASE

        # Background id everywhere (bg masks are all-255, cpp:654-718).
        ids0 = jnp.full((H, W), BACKGROUND_OBJ_ID, jnp.int32)
        ids1 = jnp.full((H, W), BACKGROUND_OBJ_ID, jnp.int32)
    else:
        ids0 = ids1 = None

    # Drop window classes that don't fit the configured frame (small frames
    # fall straight through to full-frame evaluation).
    window_classes = tuple(
        c for c in (WINDOW_CLASSES if cfg.windowed else (None,))
        if c is None or (c[0] <= H and c[1] <= W)
    )

    # ---- Vectorized per-object precomputation ----
    prims = scene.prims
    objs = scene.objects
    (lo0, hi0), (lo1, hi1) = _all_bboxes(prims, objs.motion)
    n_prims = jnp.sum(prims.valid, axis=1).astype(jnp.int32)        # [K]
    if has_warp:
        warp_k = objs.warp & objs.valid
        margin1 = AA_MARGIN + jnp.where(warp_k, WARP_MARGIN, 0.0)   # [K]
    else:
        margin1 = jnp.full(objs.valid.shape, AA_MARGIN)
    on0 = objs.valid & ~_offscreen(lo0, hi0, AA_MARGIN, H, W)
    on1 = objs.valid & ~_offscreen(lo1, hi1, margin1, H, W)
    cls0 = _size_classes(lo0, hi0, AA_MARGIN, window_classes)
    cls1 = _size_classes(lo1, hi1, margin1, window_classes)
    process = on0 | on1
    # Compacted painter's order: on-screen objects first, ascending id
    # (stable sort preserves the reference's ascending-ID blit order,
    # cpp:1216-1223).
    order = jnp.argsort(~process, stable=True)
    count = jnp.sum(process).astype(jnp.int32)

    # Foreground texture: deterministic center crop of the canonical source
    # (Texture::getRandomizedCrop called with defaults at
    # RealizeObjectBlueprint, cpp:1149-1150).
    crop_y0 = (SH - H) // 2
    crop_x0 = (SW - W) // 2

    def blit(i, state):
        if emit_ids:
            (frame0, frame1, flow_x, flow_y, iflow_x, iflow_y,
             ids0, ids1) = state
        else:
            frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = state
            ids0 = ids1 = None
        k = order[i]
        motion_k = objs.motion[k]
        motion_inv_k = objs.motion_inv[k]
        tex_id = objs.tex_id[k] % atlas.shape[0]
        n_prims_k = n_prims[k]
        # Slice the object's texture crop OUTSIDE the window branches: cond /
        # switch branches capture their free variables as operands, and
        # capturing the whole atlas makes per-object costs scale with the
        # texture count (observed 3x at 32 textures). The crop is 2.3 MB.
        tex_crop = lax.optimization_barrier(
            lax.dynamic_slice(
                atlas, (tex_id, crop_y0, crop_x0, 0), (1, H, W, 12)
            )[0]
        )

        if has_warp:
            warping = objs.warp[k]
            wf, wi = _sample_warp_crop(warp_bank, objs.warp_slot[k])
        else:
            warping = None
            wf = wi = None

        # ---------------- frame 0: blend + flow ----------------
        def f0_branch(wh, ww):
            full = wh == H and ww == W

            def branch(ops):
                if emit_ids:
                    frame0, flow_x, flow_y, ids0 = ops
                else:
                    frame0, flow_x, flow_y = ops
                if full:
                    y0 = jnp.int32(0)
                    x0 = jnp.int32(0)
                else:
                    y0, x0 = _window_origin(lo0[k], hi0[k], wh, ww, H, W)

                tex_w = lax.dynamic_slice(
                    tex_crop, (y0, x0, 0), (wh, ww, 3)
                ).astype(jnp.float32)
                f0_w = lax.dynamic_slice(frame0, (y0, x0, 0), (wh, ww, 3))
                fx_w = lax.dynamic_slice(flow_x, (y0, x0), (wh, ww))
                fy_w = lax.dynamic_slice(flow_y, (y0, x0), (wh, ww))
                id_w = (
                    lax.dynamic_slice(ids0, (y0, x0), (wh, ww))
                    if emit_ids else None
                )

                def fused(args):
                    # Entire window pass (multi-primitive coverage, mask
                    # algebra, blend, flow overwrite) in one fused kernel.
                    f0_w, fx_w, fy_w = args
                    edges, meta, fmeta = _object_kernel_inputs(
                        prims, k, motion_k, motion_k, 0, n_prims_k, x0, y0
                    )
                    f0_w, fl_w = object_window_pallas(
                        edges, meta, fmeta, tex_w, f0_w,
                        jnp.stack([fx_w, fy_w], -1),
                        use_aa=cfg.use_antialiasing, emit_flow=True,
                    )
                    return f0_w, fl_w[..., 0], fl_w[..., 1]

                def composed(args):
                    if emit_ids:
                        f0_w, fx_w, fy_w, id_w = args
                    else:
                        f0_w, fx_w, fy_w = args
                        id_w = None
                    wpx, wpy = _window_grids(y0, x0, wh, ww)
                    aa0, in0 = _frame_coverage(
                        prims, k, motion_k, 0, wpx + 0.5, wpy + 0.5, n_prims_k,
                        use_pallas,
                    )
                    m0 = aa0 if cfg.use_antialiasing else in0.astype(jnp.float32)
                    f0_w = jnp.round(
                        f0_w * (1.0 - m0[..., None]) + tex_w * m0[..., None]
                    )

                    # Flow at integer coords (computeFlowImage, cpp:807-817).
                    mvx, mvy = affine.apply_xy(motion_k, wpx, wpy)
                    ofx, ofy = mvx - wpx, mvy - wpy
                    if has_warp:
                        wfx, wfy = _bilinear_flow_at(wf, mvx, mvy)
                        inb = (
                            (mvx >= 0) & (mvx < W) & (mvy >= 0) & (mvy < H)
                            & warping
                        )
                        ofx = ofx + jnp.where(inb, wfx, 0.0)
                        ofy = ofy + jnp.where(inb, wfy, 0.0)
                    fx_w = jnp.where(in0, ofx, fx_w)
                    fy_w = jnp.where(in0, ofy, fy_w)
                    if emit_ids:
                        from ..config import FOREGROUND_ID_BASE

                        # Index paint where the binary mask fully covers
                        # (blitObject, cpp:765-774).
                        id_w = jnp.where(in0, FOREGROUND_ID_BASE + k, id_w)
                        return f0_w, fx_w, fy_w, id_w
                    return f0_w, fx_w, fy_w

                args = (f0_w, fx_w, fy_w) + ((id_w,) if emit_ids else ())
                if use_pallas_obj and not has_warp:
                    f0_w, fx_w, fy_w = fused(args)
                elif use_pallas_obj and has_warp:
                    # Only actually-deforming objects take the warp path
                    # (~warp_p of them); the rest use the fused kernel.
                    f0_w, fx_w, fy_w = lax.cond(warping, composed, fused, args)
                else:
                    out = composed(args)
                    if emit_ids:
                        f0_w, fx_w, fy_w, id_w = out
                    else:
                        f0_w, fx_w, fy_w = out

                frame0 = lax.dynamic_update_slice(frame0, f0_w, (y0, x0, 0))
                flow_x = lax.dynamic_update_slice(flow_x, fx_w, (y0, x0))
                flow_y = lax.dynamic_update_slice(flow_y, fy_w, (y0, x0))
                if emit_ids:
                    ids0 = lax.dynamic_update_slice(ids0, id_w, (y0, x0))
                    return frame0, flow_x, flow_y, ids0
                return frame0, flow_x, flow_y

            return branch

        # ---------------- frame 1: blend (+ inverse flow) ----------------
        def f1_branch(wh, ww):
            full = wh == H and ww == W

            def branch(ops):
                if emit_ids:
                    frame1, iflow_x, iflow_y, ids1 = ops
                else:
                    frame1, iflow_x, iflow_y = ops
                if full:
                    y0 = jnp.int32(0)
                    x0 = jnp.int32(0)
                else:
                    y0, x0 = _window_origin(lo1[k], hi1[k], wh, ww, H, W)

                f1_w = lax.dynamic_slice(frame1, (y0, x0, 0), (wh, ww, 3))
                ifx_w = lax.dynamic_slice(iflow_x, (y0, x0), (wh, ww))
                ify_w = lax.dynamic_slice(iflow_y, (y0, x0), (wh, ww))
                id_w = (
                    lax.dynamic_slice(ids1, (y0, x0), (wh, ww))
                    if emit_ids else None
                )

                def fused(args):
                    # Texture gather stays in XLA (gathers are not expressible
                    # in the kernel); coverage + algebra + blend (+ inverse
                    # flow) fuse into one kernel call.
                    f1_w, ifx_w, ify_w = args
                    wpx, wpy = _window_grids(y0, x0, wh, ww)
                    sx, sy = affine.apply_xy(motion_inv_k, wpx, wpy)
                    tex1_w = texture.sample_bilinear_quad(
                        tex_crop, sx, sy, wrap="reflect"
                    )
                    edges, meta, fmeta = _object_kernel_inputs(
                        prims, k, motion_k, motion_inv_k, 1, n_prims_k, x0, y0
                    )
                    f1_w, ifl_w = object_window_pallas(
                        edges, meta, fmeta, tex1_w, f1_w,
                        jnp.stack([ifx_w, ify_w], -1),
                        use_aa=cfg.use_antialiasing,
                        emit_flow=cfg.compute_inverse_flow,
                    )
                    if cfg.compute_inverse_flow:
                        return f1_w, ifl_w[..., 0], ifl_w[..., 1]
                    return f1_w, ifx_w, ify_w

                def composed(args):
                    if emit_ids:
                        f1_w, ifx_w, ify_w, id_w = args
                    else:
                        f1_w, ifx_w, ify_w = args
                        id_w = None
                    wpx, wpy = _window_grids(y0, x0, wh, ww)
                    aa1, in1 = _frame_coverage(
                        prims, k, motion_k, 1, wpx + 0.5, wpy + 0.5, n_prims_k,
                        use_pallas,
                    )

                    sx, sy = affine.apply_xy(motion_inv_k, wpx, wpy)
                    if has_warp:
                        # Frame-1 masks and texture warped by the inverse
                        # field (renderTransformedTexture cpp:341-346,
                        # renderMasks cpp:370-386). Mask warp is sampled
                        # within the window.
                        idx, idy = _bilinear_flow_at(wi, wpx, wpy)
                        wsx, wsy = affine.apply_xy(
                            motion_inv_k, wpx + idx, wpy + idy
                        )
                        sx = jnp.where(warping, wsx, sx)
                        sy = jnp.where(warping, wsy, sy)
                        cov = jnp.stack([aa1, in1.astype(jnp.float32)], -1)
                        cov_w = texture.sample_bilinear(
                            cov,
                            wpx + idx - x0.astype(jnp.float32),
                            wpy + idy - y0.astype(jnp.float32),
                            wrap="zero",
                        )
                        aa1 = jnp.where(warping, cov_w[..., 0], aa1)
                        in1 = jnp.where(
                            warping, _warp_binary_threshold(cov_w[..., 1]), in1
                        )

                    # Sample the object texture (the WxH center crop) at the
                    # motion-inverse positions, reflect-wrapped in crop space
                    # (getTransformedTexture, cpp:168-231).
                    tex1_w = texture.sample_bilinear_quad(
                        tex_crop, sx, sy, wrap="reflect"
                    )

                    m1 = aa1 if cfg.use_antialiasing else in1.astype(jnp.float32)
                    f1_w = jnp.round(
                        f1_w * (1.0 - m1[..., None]) + tex1_w * m1[..., None]
                    )
                    if cfg.compute_inverse_flow:
                        imx, imy = affine.apply_xy(motion_inv_k, wpx, wpy)
                        ifx_w = jnp.where(in1, imx - wpx, ifx_w)
                        ify_w = jnp.where(in1, imy - wpy, ify_w)
                    if emit_ids:
                        from ..config import FOREGROUND_ID_BASE

                        id_w = jnp.where(in1, FOREGROUND_ID_BASE + k, id_w)
                        return f1_w, ifx_w, ify_w, id_w
                    return f1_w, ifx_w, ify_w

                args = (f1_w, ifx_w, ify_w) + ((id_w,) if emit_ids else ())
                if use_pallas_obj and not has_warp:
                    f1_w, ifx_w, ify_w = fused(args)
                elif use_pallas_obj and has_warp:
                    f1_w, ifx_w, ify_w = lax.cond(warping, composed, fused, args)
                else:
                    out = composed(args)
                    if emit_ids:
                        f1_w, ifx_w, ify_w, id_w = out
                    else:
                        f1_w, ifx_w, ify_w = out

                frame1 = lax.dynamic_update_slice(frame1, f1_w, (y0, x0, 0))
                if cfg.compute_inverse_flow:
                    iflow_x = lax.dynamic_update_slice(iflow_x, ifx_w, (y0, x0))
                    iflow_y = lax.dynamic_update_slice(iflow_y, ify_w, (y0, x0))
                if emit_ids:
                    ids1 = lax.dynamic_update_slice(ids1, id_w, (y0, x0))
                    return frame1, iflow_x, iflow_y, ids1
                return frame1, iflow_x, iflow_y

            return branch

        def dispatch(make_branch, on, cls, ops):
            branches = [
                make_branch(*(c if c is not None else (H, W)))
                for c in window_classes
            ]
            if len(branches) == 1:
                sel = branches[0]
            else:
                sel = lambda o: lax.switch(cls[k], branches, o)
            return lax.cond(on[k], sel, lambda o: o, ops)

        if emit_ids:
            frame0, flow_x, flow_y, ids0 = dispatch(
                f0_branch, on0, cls0, (frame0, flow_x, flow_y, ids0)
            )
            frame1, iflow_x, iflow_y, ids1 = dispatch(
                f1_branch, on1, cls1, (frame1, iflow_x, iflow_y, ids1)
            )
            return (frame0, frame1, flow_x, flow_y, iflow_x, iflow_y,
                    ids0, ids1)
        frame0, flow_x, flow_y = dispatch(
            f0_branch, on0, cls0, (frame0, flow_x, flow_y)
        )
        frame1, iflow_x, iflow_y = dispatch(
            f1_branch, on1, cls1, (frame1, iflow_x, iflow_y)
        )
        return frame0, frame1, flow_x, flow_y, iflow_x, iflow_y

    state = (frame0, frame1, flow_x, flow_y, iflow_x, iflow_y)
    if emit_ids:
        state = state + (ids0, ids1)
    state = lax.fori_loop(0, count, blit, state)
    frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = state[:6]
    ids = jnp.stack([state[6], state[7]], axis=0) if emit_ids else None

    flow0 = jnp.stack([flow_x, flow_y], axis=-1)
    flow1 = (
        jnp.stack([iflow_x, iflow_y], axis=-1) if cfg.compute_inverse_flow else None
    )
    return RenderOutput(image0=frame0, image1=frame1, flow0=flow0, flow1=flow1,
                        ids=ids)


def render_batch(scenes: Scene, atlas, cfg: DataGenConfig, warp_bank=None):
    """Render a batch of scenes sequentially (lax.map): each sample is already
    a device-filling program (~200k pixels x objects x edges), and sequential
    mapping keeps lax.cond object-skipping effective — under vmap, cond
    degrades to select and every branch would run for every sample."""
    # Split OUTSIDE the sample loop: carrying the xy-minor bank arrays into
    # the loop makes XLA copy the whole bank into the 64x-padded layout.
    warp_bank = _bank_planes(warp_bank)

    def one(scene):
        out = render_sample(scene, atlas, cfg, warp_bank)
        res = [out.image0, out.image1, out.flow0]
        if out.flow1 is not None:
            res.append(out.flow1)
        if out.ids is not None:
            res.append(out.ids)
        return tuple(res)

    return lax.map(one, scenes)
