"""Scene rendering: coverage, compositing, and ground-truth flow synthesis.

This module is the TPU-native replacement for the reference's entire render
stack — the MovingObject class hierarchy (src/caffe/DataGenerator.cpp:260-718),
RenderCore (cpp:740-818), and the per-sample worker pipeline
Process_TaskBucket (cpp:1175-1254). The reference renders each object on its
own CPU thread (masks via AGG scanlines, textures via AGG warps) and then
composites sequentially; here the *whole sample* is one fused XLA program:

  for each object slot (lax.fori_loop, painter's order = ascending id):
      coverage  = mask algebra over the object's primitives (analytic, per-pixel)
      frame0/1  = alpha blend of the object's texture (blitObject, cpp:762-799)
      flow      = where(fully covered in frame 0, object flow, flow)
                  (computeFlowImage, cpp:801-818: the index image is exactly
                   "last object whose binary mask covers the pixel")

Occlusion therefore needs no index image at all: ascending-id overwrite *is*
the painter's algorithm.

Background handling (MovingObjectBackground, cpp:654-718): the background's
2Wx2H texture + center-crop construction reduces analytically to an affine
about the image center; both frames and its flow are computed with single
gathers — the 4x-size intermediate texture of the reference never exists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import MAX_COMPONENTS, DataGenConfig
from ..ops import affine, raster, texture
from ..params.blueprint import Scene


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


def _fg_texture(atlas, tex_id, height, width):
    """Foreground texture: deterministic center crop of the canonical source
    (Texture::getRandomizedCrop called with defaults at RealizeObjectBlueprint,
    cpp:1149-1150 — the fg shift/rot/zoom streams exist but are never used)."""
    src = lax.dynamic_index_in_dim(atlas, tex_id, axis=0, keepdims=False)
    sh, sw = src.shape[0], src.shape[1]
    y0 = (sh - height) // 2
    x0 = (sw - width) // 2
    return lax.dynamic_slice(src, (y0, x0, 0), (height, width, src.shape[2]))


def _sample_warp_crop(bank: WarpBank, slot):
    f = lax.dynamic_index_in_dim(bank.flow, slot, axis=0, keepdims=False)
    i = lax.dynamic_index_in_dim(bank.iflow, slot, axis=0, keepdims=False)
    return f, i


def _bilinear_flow_at(field, x, y):
    """Sample a (H, W, 2) flow field at float coords with zero outside and NaN
    scrubbed (the reference leaves signaling NaNs in flagged warp-field pixels,
    WarpFields.cpp:389-398; scrubbing keeps training data finite)."""
    v = texture.sample_bilinear(jnp.nan_to_num(field), x, y, wrap="zero")
    return v[..., 0], v[..., 1]


def _object_coverage(prims, k, motion_k, px, py):
    """Mask algebra over one object's primitive slots, both frames.

    Equivalent to rendering each component's masks (MovingObjectEllipse/
    Polygon::renderMasks, cpp:465-534) and combining them in order with the
    composite screen algebra (cpp:591-646). Deviation: for warping objects the
    reference warps each component mask then combines; we combine then warp —
    the operations commute up to bilinear-interpolation cross terms at edges.
    """
    shape = px.shape
    acc = (
        jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool),
        jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool),
    )

    def component(c, acc):
        aa0, in0, aa1, in1 = acc
        valid = prims.valid[k, c]

        def run(acc):
            aa0, in0, aa1, in1 = acc
            intr = prims.intrinsic[k, c]
            tr1 = affine.compose(intr, motion_k)

            def poly(_):
                pts = prims.edge_pts[k, c]
                c0 = raster.polygon_coverage(affine.apply(intr, pts), px, py)
                c1 = raster.polygon_coverage(affine.apply(tr1, pts), px, py)
                return c0 + c1

            def ellipse(_):
                rx = prims.ell_rx[k, c]
                ry = prims.ell_ry[k, c]
                c0 = raster.ellipse_coverage(intr, rx, ry, px, py)
                c1 = raster.ellipse_coverage(tr1, rx, ry, px, py)
                return c0 + c1

            n_aa0, n_in0, n_aa1, n_in1 = lax.cond(
                prims.is_poly[k, c], poly, ellipse, None
            )
            additive = prims.additive[k, c]
            add = raster.combine_additive
            sub = raster.combine_subtractive
            aa0n, in0n = jax.tree.map(
                lambda x, y: jnp.where(additive, x, y),
                add(aa0, in0, n_aa0, n_in0), sub(aa0, in0, n_aa0, n_in0),
            )
            aa1n, in1n = jax.tree.map(
                lambda x, y: jnp.where(additive, x, y),
                add(aa1, in1, n_aa1, n_in1), sub(aa1, in1, n_aa1, n_in1),
            )
            return aa0n, in0n, aa1n, in1n

        return lax.cond(valid, run, lambda a: a, acc)

    return lax.fori_loop(0, MAX_COMPONENTS, component, acc)


def _warp_binary_threshold(warped):
    """A warped binary mask counts as 'fully covering' only where the bilinear
    interpolation of the 0/1 mask stays at 1 (the reference warps the u8 mask
    and then tests == 255, cpp:370-386 + 765-773)."""
    return warped >= 1.0 - (0.5 / 255.0)


def render_sample(
    scene: Scene,
    atlas: jax.Array,
    cfg: DataGenConfig,
    warp_bank: Optional[WarpBank] = None,
) -> RenderOutput:
    """Render one scene blueprint into (image0, image1, flow) — the fused
    equivalent of Process_TaskBucket (cpp:1175-1254)."""
    H, W = cfg.height, cfg.width
    has_warp = warp_bank is not None and cfg.mode_spec.warp_p > 0.0
    px, py = raster.pixel_grid(W, H)           # coverage at pixel centers
    ix, iy = raster.pixel_grid(W, H, 0.0)      # flow at integer coords

    cx, cy = W / 2.0, H / 2.0
    bg = scene.background

    # ---- Background (MovingObjectBackground, cpp:654-718) ----
    src = lax.dynamic_index_in_dim(atlas, bg.tex_id % atlas.shape[0], 0, False)
    big = texture.randomized_crop(
        src, 2 * H, 2 * W, bg.tex_rot_deg, bg.tex_zoom,
        bg.tex_shift[0], bg.tex_shift[1],
    )
    # Pixel motion about the image center: the reference's intrinsic-conjugated
    # big-texture construction (renderTransformedTexture cpp:665-682 +
    # getPointFlow cpp:692-718) reduces to conjugate_about(M_bg, center).
    bg_pixel_motion = affine.conjugate_about(bg.motion, cx, cy)
    # In big-texture coordinates (q = p + c) the same map is conjugated about
    # the big center (W, H).
    bg_big_motion = affine.conjugate_about(bg.motion, float(W), float(H))
    bg_big_inv = affine.invert(bg_big_motion)

    frame0 = big[H // 2 : H // 2 + H, W // 2 : W // 2 + W]

    qx, qy = px + cx, py + cy                  # big-texture coords of our pixels
    if has_warp:
        bgf, bgi = _sample_warp_crop(warp_bank, bg.warp_slot)
        # The background field is the WxH crop resized x2 with magnitudes x2
        # (cpp:1194-1202). Sample it implicitly: value at big coord q is
        # 2 * field((q + 0.5)/2 - 0.5).
        def big_field_at(field, x, y):
            fx, fy = _bilinear_flow_at(field, (x + 0.5) / 2.0 - 0.5,
                                       (y + 0.5) / 2.0 - 0.5)
            return 2.0 * fx, 2.0 * fy

        idx, idy = big_field_at(bgi, qx, qy)
        wq_x, wq_y = jnp.where(bg.warp, qx + idx, qx), jnp.where(bg.warp, qy + idy, qy)
    else:
        wq_x, wq_y = qx, qy
    sx, sy = affine.apply_xy(bg_big_inv, wq_x, wq_y)
    frame1 = texture.sample_bilinear(big, sx, sy, wrap="reflect")

    fqx, fqy = affine.apply_xy(bg_pixel_motion, ix, iy)
    flow_x = fqx - ix
    flow_y = fqy - iy
    if has_warp:
        # Forward warp-field contribution at the moved position, in big coords,
        # gated on landing inside the 2Wx2H field (cpp:714-717).
        mx, my = fqx + cx, fqy + cy
        wfx, wfy = big_field_at(bgf, mx, my)
        inb = (mx >= 0) & (mx < 2 * W) & (my >= 0) & (my < 2 * H) & bg.warp
        flow_x = flow_x + jnp.where(inb, wfx, 0.0)
        flow_y = flow_y + jnp.where(inb, wfy, 0.0)

    frame0 = jnp.round(frame0)
    frame1 = jnp.round(frame1)

    if cfg.compute_inverse_flow:
        bg_inv_pixel = affine.invert(bg_pixel_motion)
        iqx, iqy = affine.apply_xy(bg_inv_pixel, ix, iy)
        iflow_x, iflow_y = iqx - ix, iqy - iy
    else:
        iflow_x = iflow_y = None

    # ---- Foreground objects, ascending id = painter's order ----
    def blit(k, state):
        frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = state

        def run(state):
            frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = state
            motion_k = scene.objects.motion[k]
            motion_inv_k = scene.objects.motion_inv[k]
            aa0, in0, aa1, in1 = _object_coverage(scene.prims, k, motion_k, px, py)

            tex0 = _fg_texture(atlas, scene.objects.tex_id[k] % atlas.shape[0], H, W)
            sx, sy = affine.apply_xy(motion_inv_k, px - 0.5, py - 0.5)

            if has_warp:
                warping = scene.objects.warp[k] & scene.objects.valid[k]
                wf, wi = _sample_warp_crop(warp_bank, scene.objects.warp_slot[k])
                idx, idy = _bilinear_flow_at(wi, px - 0.5, py - 0.5)
                # Frame-1 texture: tex0(Minv(x + iflow(x))) (cpp:341-346).
                wsx, wsy = affine.apply_xy(
                    motion_inv_k, px - 0.5 + idx, py - 0.5 + idy
                )
                sx = jnp.where(warping, wsx, sx)
                sy = jnp.where(warping, wsy, sy)
            tex1 = texture.sample_bilinear(tex0, sx, sy, wrap="reflect")

            if has_warp:
                # Frame-1 masks warped by the inverse field (cpp:370-386).
                aa1_w = texture.sample_bilinear(
                    aa1[..., None], px - 0.5 + idx, py - 0.5 + idy, wrap="zero"
                )[..., 0]
                in1_w = _warp_binary_threshold(
                    texture.sample_bilinear(
                        in1.astype(jnp.float32)[..., None],
                        px - 0.5 + idx, py - 0.5 + idy, wrap="zero",
                    )[..., 0]
                )
                aa1 = jnp.where(warping, aa1_w, aa1)
                in1 = jnp.where(warping, in1_w, in1)

            m0 = aa0 if cfg.use_antialiasing else in0.astype(jnp.float32)
            m1 = aa1 if cfg.use_antialiasing else in1.astype(jnp.float32)
            frame0 = jnp.round(frame0 * (1.0 - m0[..., None]) + tex0 * m0[..., None])
            frame1 = jnp.round(frame1 * (1.0 - m1[..., None]) + tex1 * m1[..., None])

            # Flow: affine displacement (+ forward field at the moved point,
            # gated on frame bounds, cpp:388-407), where frame-0 mask fully
            # covers (cpp:762-818).
            mvx, mvy = affine.apply_xy(motion_k, ix, iy)
            ofx, ofy = mvx - ix, mvy - iy
            if has_warp:
                wfx, wfy = _bilinear_flow_at(wf, mvx, mvy)
                inb = (mvx >= 0) & (mvx < W) & (mvy >= 0) & (mvy < H) & warping
                ofx = ofx + jnp.where(inb, wfx, 0.0)
                ofy = ofy + jnp.where(inb, wfy, 0.0)
            flow_x = jnp.where(in0, ofx, flow_x)
            flow_y = jnp.where(in0, ofy, flow_y)

            if cfg.compute_inverse_flow:
                imx, imy = affine.apply_xy(motion_inv_k, ix, iy)
                iflow_x = jnp.where(in1, imx - ix, iflow_x)
                iflow_y = jnp.where(in1, imy - iy, iflow_y)

            return frame0, frame1, flow_x, flow_y, iflow_x, iflow_y

        return lax.cond(scene.objects.valid[k], run, lambda s: s, state)

    if iflow_x is None:
        iflow_x = jnp.zeros_like(flow_x)
        iflow_y = jnp.zeros_like(flow_y)
    state = (frame0, frame1, flow_x, flow_y, iflow_x, iflow_y)
    state = lax.fori_loop(0, scene.objects.valid.shape[0], blit, state)
    frame0, frame1, flow_x, flow_y, iflow_x, iflow_y = state

    flow0 = jnp.stack([flow_x, flow_y], axis=-1)
    flow1 = (
        jnp.stack([iflow_x, iflow_y], axis=-1) if cfg.compute_inverse_flow else None
    )
    return RenderOutput(image0=frame0, image1=frame1, flow0=flow0, flow1=flow1)


def render_batch(scenes: Scene, atlas, cfg: DataGenConfig, warp_bank=None):
    """Render a batch of scenes sequentially (lax.map): each sample is already
    a device-filling program (~200k pixels x objects x edges), and sequential
    mapping keeps lax.cond object-skipping effective — under vmap, cond
    degrades to select and every branch would run for every sample."""

    def one(scene):
        out = render_sample(scene, atlas, cfg, warp_bank)
        if out.flow1 is None:
            return out.image0, out.image1, out.flow0
        return out.image0, out.image1, out.flow0, out.flow1

    return lax.map(one, scenes)
