"""The scene megakernel: one Mosaic program per sample renders ALL foreground
objects — coverage, composite algebra, texture, blending, and flow — with the
frame accumulators resident in VMEM for the whole sample.

This is the batch-wide fused object pass that replaces the renderer's
per-object XLA dispatch loop (compose/render.py ``blit``): where the XLA loop
paid, per object, an HBM round-trip of every window slice plus kernel-launch
and gather overheads (~0.9 ms per on-screen object-frame measured at round 1),
this kernel pays one bg-frame DMA-in, one result DMA-out, and per object only
the texture traffic it actually needs. The reference's equivalent is the
second-level thread pool rendering objects of one sample concurrently
(src/caffe/DataGenerator.cpp:1256-1306 + QueueProcessor.h); here the painter's
order is the sequential object loop inside one program, and sample-level
parallelism is the (B,) grid.

Per work unit (object x frame x window tile):

* edge tables DMA from HBM into SMEM (scalars feed the exact-area scan),
* frame-0 texture: direct window DMA from the texture's reflect-padded packed
  slab (the object texture is the frame-aligned center crop,
  DataGenerator.cpp:1149-1150 with default crop args),
* frame-1 texture: banded two-pass affine resample from the same slab
  (ops/pallas_resample.py) — the motion warp of renderTransformedTexture
  (cpp:337-349) without a single hardware gather,
* exact-area coverage + composite screen algebra (ops/pallas_raster.py
  semantics), alpha blend, and flow overwrite, all on dynamic window slices
  of the VMEM accumulators.

Large objects are covered by a grid of window tiles; each tile blends only
pixels inside its OWNERSHIP rectangle (the tile grid partitions the object's
cover rect), so overlapping clamped windows never double-blend.

Alignment rules (Mosaic provability): window origins are snapped to the
(8, 128) sublane/lane grid, edge tables are lane-padded to 128, and all HBM
DMA offsets are ``pl.multiple_of``-asserted.

Texture slabs: ``prepare_slabs`` packs each texture's frame-sized center crop
as RGB-in-int32 with ``SLAB_MARGIN`` reflect-padded texels per side. Sampling
windows are folded into the slab by composing the per-tile reflect fold (a
translation or mirror per axis — both affine) into the resample coefficients
on the XLA side (compose/fused.py), so AGG's wrap_mode_reflect semantics
(cpp:188-192) hold for any footprint within ``SLAB_MARGIN`` of the fold.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_raster import _area_accumulate_blocked
from . import affine as affine_mod
from . import pallas_resample as resamp
from . import raster
from ..config import BACKGROUND_OBJ_ID as BG_ID, FOREGROUND_ID_BASE as FG_ID_BASE

# Window tile size: one VMEM-friendly unit of object evaluation.
WIN_H = 192
WIN_W = 256
# Max tile-grid extent per object frame (cover rect <= frame + margins).
MAX_TILES_Y = 3
MAX_TILES_X = 3
MAX_TILES = MAX_TILES_Y * MAX_TILES_X
# Reflect-padded slab margin: must exceed half the source footprint diameter
# of one window tile (window diag * max inverse scale / 2).
SLAB_MARGIN = 256
# Mode-9 displacement bound (max |iflow| of composed warp crops, ~40 px) and
# the expansion margins of warp-object frame-1 evaluation grids.
WARP_D = 48
WARP_EY = 56    # row expansion per side (multiple of 8, >= WARP_D + 2)
WARP_EX = 64    # lane expansion per side (no alignment constraint: scratch)
# Background-field margins: the bg crop is applied x2 in size AND magnitude
# (cpp:1194-1202), so its displacement bound is 2*WARP_D.
BG_EY = 96      # multiple of 8, >= 2*WARP_D
BG_EX = 128     # multiple of 128 (extended-grid lane alignment)

# bgm layout (per sample, f32): raw background affines + periods + motion.
BGM_T0 = 0      # frame-0 output->source affine (2x3 row-major)
BGM_T1 = 6      # frame-1 (inverse big motion composed)
BGM_SRCW = 12   # source reflect periods (native dims on the TextureDB path)
BGM_SRCH = 13
BGM_PIX = 16    # bg pixel motion (conjugated about the frame center)
BGM_FAFF = 24   # forward-field sampling affine: u = (pixmot(p)+c+.5)/2-.5
BGM_IPIX = 32   # inverse bg pixel motion (inverse-flow init)
BGM_SIZE = 40

# objmeta_i layout (per object, per frame)
OMI_ON = 0          # window pass needed for this frame
OMI_NTY = 1         # tile-grid rows
OMI_NTX = 2         # tile-grid cols
OMI_TEX = 3         # texture id (pre-wrapped to atlas size)
OMI_NPRIMS = 4
OMI_ADD_BITS = 5    # additive flags, bit c = prim c
OMI_POLY_BITS = 6   # is_poly flags
OMI_WARP = 7        # nonrigid deformation flag (mode 9)
OMI_NEDGES = 8      # n_edges[0..6] at 8..14
OMI_SLOT = 15       # warp-bank slot
OMI_SIZE = 16

# objmeta_f layout (per object, per frame)
OMF_MOTION = 0      # flow motion 2x3 row-major (motion fwd / inverse)
OMF_ELL = 8         # + c*8: ellipse inverse transform (6), rx, ry
OMF_RAW = 64        # frame 1 only: RAW residual texture-sampling affine (6)
                    # + reflect periods (nx, ny) — folded IN-KERNEL per
                    # sub-window when tsplit > 1 (texture_split)
OMF_EXT = 72        # + c*2: ellipse screen y-extent [ymin, ymax] — the
                    # chord-coverage pass culls 8-row blocks provably zero
                    # (cell >= ELL_CULL_M px beyond the extent lies entirely
                    # outside its own sector chord's half-plane)
OMF_SIZE = 88

ELL_CULL_M = 2.0    # cull margin: cell half-diagonal (<= 0.71) + chord
                    # sagitta ((1 - cos(pi/100)) * r_screen < 1 up to
                    # r ~ 2000 px) + slack

# tilemeta layouts (per object, frame, tile slot)
TMI_Y0 = 0          # window origin (snapped)
TMI_X0 = 1
TMI_OY0 = 2         # ownership rect [OY0, OY1) x [OX0, OX1)
TMI_OY1 = 3
TMI_OX0 = 4
TMI_OX1 = 5
TMI_SIZE = 8
TMF_SIZE = 8        # resample coeffs A,B,C,c,d,f (frame 1 only)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def slab_shape(height: int, width: int):
    return (
        _round_up(height + 2 * SLAB_MARGIN, 8),
        _round_up(width + 2 * SLAB_MARGIN, 128),
    )


def _slab_of(img, hs: int, ws: int):
    s = resamp.reflect_pad(resamp.pack_rgb_i32(img), SLAB_MARGIN, SLAB_MARGIN)
    return jnp.pad(
        s, ((0, hs - s.shape[0]), (0, ws - s.shape[1])), mode="edge"
    )


def _stack_quadrant(tex, height: int, width: int):
    """Packed slabs of ``tex`` (T, height, width, 3) plus their rot90(k=1)
    copies, padded to a common shape and stacked along T: slots [T:2T] hold
    the 90-deg-rotated sources (compose/fused.py offsets frame-1 texture ids
    when the quadrant factor is odd). The 180-deg quadrant needs no copy —
    the reflect extension is point-reflection invariant."""
    h0, w0 = slab_shape(height, width)
    h1, w1 = slab_shape(width, height)
    hs, ws = max(h0, h1), max(w0, w1)
    base = jax.vmap(lambda im: _slab_of(im, hs, ws))(tex)
    rot = jax.vmap(lambda im: _slab_of(jnp.rot90(im, 1, (0, 1)), hs, ws))(tex)
    return jnp.concatenate([base, rot], axis=0)


def prepare_slabs(atlas, height: int, width: int, quadrant: bool = False):
    """(T, SH, SW, 3) texture atlas -> (T, SHs, SWs) int32 packed slabs of the
    frame-sized center crops with SLAB_MARGIN reflected texels per side.
    The crop is the object texture (Texture::getRandomizedCrop with default
    args = centered crop, cpp:87-109 via cpp:1149-1150). ``quadrant`` adds
    rot90 copies at slots [T:2T] (see :func:`_stack_quadrant`)."""
    sh, sw = atlas.shape[1], atlas.shape[2]
    y0 = (sh - height) // 2
    x0 = (sw - width) // 2
    crops = atlas[:, y0 : y0 + height, x0 : x0 + width]
    if quadrant:
        return _stack_quadrant(crops, height, width)
    hs, ws = slab_shape(height, width)
    return jax.vmap(lambda im: _slab_of(im, hs, ws))(crops)


def prepare_obj_slabs(obj_tex, quadrant: bool = False):
    """(T, H, W, 3) pre-materialized object textures (TextureDB.obj_tex, the
    reference-exact getRandomizedCrop-with-defaults output per source) ->
    packed reflect-padded slabs, same layout as :func:`prepare_slabs`."""
    height, width = obj_tex.shape[1], obj_tex.shape[2]
    if quadrant:
        return _stack_quadrant(obj_tex, height, width)
    hs, ws = slab_shape(height, width)
    return jax.vmap(lambda im: _slab_of(im, hs, ws))(obj_tex)


def prepare_bg_slabs_db(sources, sizes):
    """(T, maxH, maxW, 3) zero-padded native sources + (T, 2) native dims ->
    packed background slabs with PER-SOURCE reflect periods: slab[i, j] =
    src[reflect(i - M, h_t), reflect(j - M, w_t)]. The full periodic-reflect
    extension is materialized, so any in-slab position carries exact AGG
    wrap_mode_reflect content for that source's native size."""
    T, maxH, maxW = sources.shape[0], sources.shape[1], sources.shape[2]
    SHb = _round_up(maxH + 2 * SLAB_MARGIN, 8)
    SWb = _round_up(maxW + 2 * SLAB_MARGIN, 128)

    def reflect(i, n):
        r = jnp.remainder(i, 2 * n)
        return jnp.where(r >= n, 2 * n - 1 - r, r)

    def one(src, hw):
        h, w = hw[0], hw[1]
        yi = reflect(jnp.arange(SHb) - SLAB_MARGIN, h)
        xi = reflect(jnp.arange(SWb) - SLAB_MARGIN, w)
        packed = resamp.pack_rgb_i32(src)
        return packed[yi][:, xi]

    return jax.vmap(one)(jnp.asarray(sources), jnp.asarray(sizes))


def prepare_bg_slabs(atlas):
    """(T, SH, SW, 3) texture atlas -> (T, SHb, SWb) int32 packed slabs of the
    FULL canonical sources with SLAB_MARGIN reflected texels per side. The
    background samples its 2Wx2H source through the randomized-crop affine
    (MovingObjectBackground, cpp:654-688), so its slab keeps the full source
    rather than the frame-sized center crop used for objects."""

    def slab(img):
        s = resamp.reflect_pad(
            resamp.pack_rgb_i32(img), SLAB_MARGIN, SLAB_MARGIN
        )
        hs = _round_up(s.shape[0], 8)
        ws = _round_up(s.shape[1], 128)
        return jnp.pad(
            s, ((0, hs - s.shape[0]), (0, ws - s.shape[1])), mode="edge"
        )

    return jax.vmap(slab)(atlas)


def bg_envelope(spec):
    """Static motion envelope of the background texture chain: randomized
    crop (rotation sampled in radians but applied as degrees -> <= 3.15 deg,
    zoom in [0.8, 1.2]) composed, for frame 1, with the background motion."""
    crop_rot = math.pi * math.pi / 180.0
    inv_zoom = 1.0 / 0.8
    rot = crop_rot
    inv_s = inv_zoom
    if spec.bg_rot_p > 0:
        rot += max(abs(spec.bg_rot_range[0]), abs(spec.bg_rot_range[1]))
    if spec.bg_scale_p > 0:
        inv_s /= spec.bg_scale_range[0]
    return rot, inv_s


def mode_envelope(spec, height: int, width: int):
    """Static motion envelope of a mode: (max |total rotation|, max inverse
    scale). Total motion = object motion composed with the conjugated
    background motion; both are rotation+isotropic-scale, so the envelope is
    the sum of rotation bounds and the product of scale bounds (the shapers
    map into closed ranges, DataGenerator.cpp:826-921)."""
    rot = 0.0
    if spec.obj_rot_p > 0:
        rot += max(abs(spec.obj_rot_range[0]), abs(spec.obj_rot_range[1]))
    if spec.bg_rot_p > 0:
        rot += max(abs(spec.bg_rot_range[0]), abs(spec.bg_rot_range[1]))
    s_lo = 1.0
    if spec.obj_scale_p > 0:
        s_lo *= spec.obj_scale_range[0]
    if spec.bg_scale_p > 0:
        s_lo *= spec.bg_scale_range[0]
    return rot, 1.0 / s_lo


def quadrant_needed(spec) -> bool:
    """Static: does the mode's total-rotation envelope exceed the two-pass
    resampler's 45-deg conditioning bound (modes 11/13)? If so the fused path
    factors every frame-1 object affine as quadrant * residual: the 90-deg
    parts route through rot90 slab copies (+ the free reflect-extension point
    reflection for 180), leaving residuals within +-45 deg."""
    rot, _ = mode_envelope(spec, 0, 0)
    return rot >= math.pi / 4 - 1e-3


def fused_eligible(spec, height: int, width: int,
                   inverse_flow: bool = False) -> bool:
    """Static check: can this mode run through the scene kernel?
    Any rotation envelope is eligible (quadrant factoring, see
    :func:`quadrant_needed`) and so is every mode/output combination
    including nonrigid + inverse flow (the displaced-mask chain and the
    inverse-affine overwrite run in-kernel); alignment-unfriendly frame dims
    fall back to the windowed path, as do mode/frame-size combinations whose
    motion envelope fits no texture sub-tiling (:func:`texture_split` — e.g.
    mode 13 below 256-px-wide frames)."""
    del inverse_flow
    return (
        height % 8 == 0
        and width % 128 == 0
        and height >= 8
        and width >= 128
        and texture_split(spec, height, width) is not None
    )


def _scan_counts(rot: float, inv_s: float, rows: int, ww: int):
    a_max = inv_s / math.cos(rot)
    b_max = math.tan(rot)
    c_max = math.sin(rot) * inv_s
    d_max = inv_s
    xs = resamp.scan_tiles_pass1(
        a_max, b_max, min(resamp.PASS1_CHUNK, rows)
    )
    ys = resamp.scan_tiles_pass2(c_max, d_max, min(128, ww))
    return xs, ys


def texture_split(spec, height: int, width: int):
    """Static frame-1 texture sub-tiling factor, or None if no valid factor
    exists. The in-kernel resample folds the reflect wrap ONCE per window at
    its center (scalar_fold_coeffs / compose.fused._fold_coeffs), which is
    only exact while the window's whole source footprint stays inside the
    slab's reflected margin: radius = window_diag/2 * max_inverse_scale must
    fit SLAB_MARGIN, and the pass-1 row span must fit the slab height. Modes
    with small scale envelopes (<= ~1.6x inverse) satisfy both at the full
    192x256 window (split 1); the doubled/tripled-motion modes 11 and 13
    (inverse scale 1.94 / 3.17) need 2x2 sub-tiling of the texture resample
    — each sub-window gets its own fold, DMA, and two-pass resample, while
    coverage/ownership/flow stay at full windows."""
    wh, ww = min(WIN_H, height), min(WIN_W, width)
    rot_o, inv_o = mode_envelope(spec, height, width)
    rot_o = min(rot_o, math.pi / 4)
    SH = _round_up(height + 2 * SLAB_MARGIN, 8)
    if quadrant_needed(spec):
        # Quadrant slabs are padded to the taller of both orientations
        # (_stack_quadrant), so the row-span bound relaxes accordingly.
        SH = max(SH, _round_up(width + 2 * SLAB_MARGIN, 8))
    for s in (1, 2):
        whs, wws = wh // s, ww // s
        if whs % 8 or wws % 128:
            continue
        radius = 0.5 * math.hypot(whs, wws) * inv_o
        Ps = resamp.max_row_span(whs, wws, rot_o + 1e-6, inv_o)
        # P == SH is valid: pass1_row_start clamps w0 to 0 and the whole
        # slab is staged.
        if radius + 2.0 <= SLAB_MARGIN and Ps <= SH:
            return s
    return None


def _col_span(rot: float, inv_s: float, wwl: int, rows: int) -> int:
    """Static bound on the pass-1 source-COLUMN span of one staged row block:
    u = A x + B w + C varies by |A|*wwl + |B|*rows over the (rows, wwl)
    window; +4 lerp/floor slack +129 for the 128-snap of the window start."""
    a_max = inv_s / math.cos(rot)
    b_max = math.tan(rot)
    return _round_up(int(math.ceil(a_max * wwl + b_max * rows + 4)) + 129, 128)


def resample_params(spec, height: int, width: int):
    """Static (P_obj, P_bg, x_scan, y_scan, x_scan_bg, y_scan_bg, tsplit,
    cw_obj, cw_bg): separate pass-1 row spans AND banded scan counts for the
    object motion envelope and the (usually much tighter) background texture
    chain — the background's row DMA, pass-1 compute, and per-block scan
    loops all shrink to its own envelope (mode 7: 3/3 vs the objects' 4/4).
    The object figures are for one (wh/tsplit, ww/tsplit) texture sub-window
    (see :func:`texture_split`). ``cw_obj``/``cw_bg`` are the column-window
    widths of the staged row blocks (the kernel DMAs only the 128-aligned
    column range a window's pass-1 can touch, clamped to the slab width —
    the background's full-row staging was the largest DMA term)."""
    wh, ww = min(WIN_H, height), min(WIN_W, width)
    rot_o, inv_o = mode_envelope(spec, height, width)
    # Quadrant factoring caps the residual rotation at 45 deg (see
    # quadrant_needed); the scan/span envelopes only ever see the residual.
    rot_o = min(rot_o, math.pi / 4)
    rot_b, inv_b = bg_envelope(spec)
    ts = texture_split(spec, height, width)
    if ts is None:
        raise ValueError(
            f"mode {spec.mode}'s motion envelope (inverse scale {inv_o:.2f})"
            f" does not fit the {SLAB_MARGIN}-px slab margin at any texture"
            f" sub-tiling of a {wh}x{ww} window; use the windowed path"
        )
    P = resamp.max_row_span(wh // ts, ww // ts, rot_o + 1e-6, inv_o)
    PBG = resamp.max_row_span(wh, ww, rot_b + 1e-6, inv_b)
    xs, ys = _scan_counts(rot_o, inv_o, P, ww // ts)
    xsb, ysb = _scan_counts(rot_b, inv_b, PBG, ww)
    cwo = _col_span(rot_o, inv_o, ww // ts, P)
    cwb = _col_span(rot_b, inv_b, ww, PBG)
    return P, PBG, xs, ys, xsb, ysb, ts, cwo, cwb


def _unpack3f(v):
    return (
        ((v >> 16) & 0xFF).astype(jnp.float32),
        ((v >> 8) & 0xFF).astype(jnp.float32),
        (v & 0xFF).astype(jnp.float32),
    )


def _pack3f(r, g, b):
    return (
        (r.astype(jnp.int32) << 16)
        | (g.astype(jnp.int32) << 8)
        | b.astype(jnp.int32)
    )


def _make_scene_kernel(
    H, W, K, C, E, EP, P, PBG, xscan, yscan, xscanb, yscanb, SHs, SWs, SHb,
    SWb, use_aa, inverse_flow, has_warp=False, emit_masks=False,
    debug_level=3, tsplit=1, CWO=None, CWB=None,
):
    # Column-window widths of the staged slab row blocks (<= slab width;
    # resample_params' envelope spans, min'd by the caller).
    CWO = SWs if CWO is None else CWO
    CWB = SWb if CWB is None else CWB
    # Profiling sublevels: 21/22 = the dl2 coverage pass with one primitive
    # family stubbed out (21: polygons only, 22: ellipses only) — splits the
    # coverage cost between the edge loop and the chord formula.
    skip_ell = debug_level == 21
    skip_poly = debug_level == 22
    if debug_level >= 20:
        debug_level = 2
    wh, ww = min(WIN_H, H), min(WIN_W, W)
    # Frame-1 texture sub-windows (texture_split): whs x wws resamples, each
    # with its own in-kernel reflect fold; P is sized for ONE sub-window.
    whs, wws = wh // tsplit, ww // tsplit
    assert tsplit == 1 or not has_warp, (
        "texture sub-tiling is never needed for warp modes (small envelopes)"
    )
    whE = min(wh + 2 * WARP_EY, H)
    wwE = min(ww + 2 * WARP_EX, W)
    whEp = _round_up(whE, 128)
    Wp = _round_up(W, 128)
    IN_THR = 1.0 - 0.5 / 255.0  # warped-binary threshold (cpp:765-773)
    # Static background tile grid (full-frame cover; the trailing tile clamps
    # into the frame and overwrites the overlap deterministically).
    bg_tiles = [
        (min(ty * wh, H - wh), min(tx * ww, W - ww))
        for ty in range(-(-H // wh))
        for tx in range(-(-W // ww))
    ]
    # Warp-object texture sub-tile origins covering the expanded grid.
    LYS = [0] if whE == wh else [0, whE - wh]
    LXS = [0] if wwE == ww else [0, wwE - ww]
    # Background-warp extended grid (frame + BG_E margins) and its tiling.
    HB = H + 2 * BG_EY
    WB = W + 2 * BG_EX
    whB = min(wh + 2 * BG_EY, HB)
    bg_ext_tiles = [
        (min(-BG_EY + ty * wh, H + BG_EY - wh),
         min(-BG_EX + tx * ww, W + BG_EX - ww))
        for ty in range(-(-HB // wh))
        for tx in range(-(-WB // ww))
    ]

    MAXW = K * MAX_TILES

    def kernel(*refs):
        (smeta_hbm, omi_hbm, omf_hbm, tmi_hbm, tmf_hbm, bgm_hbm, wl_hbm,
         edges_hbm, slabs_hbm, bgslabs_hbm) = refs[:10]
        i = 10
        if has_warp:
            aux_hbm = refs[i]; bgaux_hbm = refs[i + 1]; i += 2
        frames_out, flow_out = refs[i], refs[i + 1]; i += 2
        if emit_masks:
            ids_out = refs[i]; i += 1
        (acc0, acc1, accf, smeta, omi, omf, tmi, tmf, bgm, wl,
         es0, es1, rows0, rows1, t1t, outt,
         cov_aa, cov_in, cov_area) = refs[i:i + 19]
        i += 19
        if has_warp:
            (covE_aa, covE_in, covE_area, texE, igbuf, ivbuf,
             dtmp, dtmpT, frows,
             bgwork, bggbuf, ptmp, ptmpT, out3T) = refs[i:i + 14]
            i += 14
        if emit_masks:
            idacc = refs[i]; i += 1
        sems = refs[i]

        b = pl.program_id(0)

        # ---- load per-sample meta (all DMAs overlap) ----
        loads = [
            pltpu.make_async_copy(smeta_hbm.at[b], smeta, sems.at[3]),
            pltpu.make_async_copy(omi_hbm.at[b], omi, sems.at[4]),
            pltpu.make_async_copy(omf_hbm.at[b], omf, sems.at[5]),
            pltpu.make_async_copy(tmi_hbm.at[b], tmi, sems.at[6]),
            pltpu.make_async_copy(tmf_hbm.at[b], tmf, sems.at[7]),
            pltpu.make_async_copy(bgm_hbm.at[b], bgm, sems.at[0]),
            pltpu.make_async_copy(wl_hbm.at[b], wl, sems.at[1]),
        ]
        for cp in loads:
            cp.start()
        for cp in loads:
            cp.wait()

        # ---- retire the PREVIOUS sample's result stores ----
        # Stores are started at the end of each grid step and waited only
        # here, right before their source accumulators are overwritten, so
        # the store latency overlaps the next sample's meta loads instead of
        # serializing the grid (dedicated sems 8-11; a wait descriptor only
        # sizes the semaphore decrement, so .at[b] in place of the started
        # .at[b-1] slice is immaterial).
        def store_dmas():
            dmas = [
                pltpu.make_async_copy(acc0, frames_out.at[b, 0], sems.at[8]),
                pltpu.make_async_copy(acc1, frames_out.at[b, 1], sems.at[9]),
                pltpu.make_async_copy(accf, flow_out.at[b], sems.at[10]),
            ]
            if emit_masks:
                dmas.append(
                    pltpu.make_async_copy(idacc, ids_out.at[b], sems.at[11])
                )
            return dmas

        @pl.when(b > 0)
        def _():
            for cp in store_dmas():
                cp.wait()

        # ---- background flow init, in-kernel ----
        # The background flow planes are pure affine functions of the pixel
        # grid (getPointFlow conjugation, cpp:692-712); evaluating them here
        # from the bgm scalars deletes the (B, nflow, H, W) flow_init HBM
        # round trip and its XLA producer. apply_xy_det pins the products'
        # rounding so this init is BIT-identical to the windowed path's
        # compose/render.background_flow. Warp-field terms are added below
        # (render_background).
        pxF = lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
        pyF = lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
        for fi, base_m in ((0, BGM_PIX),) + (
            ((2, BGM_IPIX),) if inverse_flow else ()
        ):
            m = tuple(bgm[0, base_m + j] for j in range(6))
            fqx, fqy = affine_mod.apply_xy_det(m, pxF, pyF)
            accf[fi] = fqx - pxF
            accf[fi + 1] = fqy - pyF
        if emit_masks:
            # Index images (RenderCore cpp:740-774): background id everywhere,
            # object ids painted below.
            idacc[...] = jnp.full_like(idacc, BG_ID)

        # Flat SMEM accessors (metadata layouts in the module header).
        def OMI(k, frame, field):
            return omi[0, (k * 2 + frame) * OMI_SIZE + field]

        def OMF(k, frame, field):
            return omf[0, (k * 2 + frame) * OMF_SIZE + field]

        def TMI(k, frame, t, field):
            return tmi[0, ((k * 2 + frame) * MAX_TILES + t) * TMI_SIZE + field]

        def TMF(k, frame, t, field):
            return tmf[0, ((k * 2 + frame) * MAX_TILES + t) * TMF_SIZE + field]

        def WL(frame, j):
            # Flattened painter-order work list (k * MAX_TILES + t) per
            # frame, built by compose/fused.prepare_scene_inputs.
            return wl[0, frame * MAXW + j]

        def NW(frame):
            return smeta[0, 4 + K + frame]

        def unit_kt(frame, j):
            u = WL(frame, j)
            k = u // MAX_TILES
            return k, u - k * MAX_TILES

        def tile_origin(k, frame, t):
            y0 = pl.multiple_of(TMI(k, frame, t, TMI_Y0) & ~7, 8)
            x0 = pl.multiple_of(TMI(k, frame, t, TMI_X0) & ~127, 128)
            return y0, x0

        # (Background rendering runs below, after the shared helpers — all
        # paths, including mode 9, render and displace the background
        # in-kernel; see render_background().)

        def coverage_into(eref, k, frame, oy, ox, aa_ref, in_ref, area_ref,
                          gh, gw):
            """Composite coverage over a (gh, gw) grid with frame-coord
            origin (oy, ox): exact-area polygons / analytic ellipses +
            ordered screen algebra (cpp:591-646). Binary carried as f32.
            ``eref``: this unit's (4, EP) SMEM edge-table buffer."""
            aa_ref[:] = jnp.zeros_like(aa_ref)
            in_ref[:] = jnp.zeros_like(in_ref)
            add_bits = OMI(k, frame, OMI_ADD_BITS)
            poly_bits = OMI(k, frame, OMI_POLY_BITS)

            def comp(c, _):
                is_poly = ((poly_bits >> c) & 1) != 0
                area_ref[:] = jnp.zeros_like(area_ref)

                @pl.when(is_poly if not skip_poly else
                         (is_poly & (poly_bits < 0)))
                def _():
                    _area_accumulate_blocked(
                        eref, c * E, OMI(k, frame, OMI_NEDGES + c),
                        oy, ox, area_ref, gh, gw,
                    )
                    area = jnp.abs(area_ref[:])
                    area_ref[:] = jnp.minimum(area, 1.0) + jnp.where(
                        area >= 0.5, 2.0, 0.0
                    )

                @pl.when(jnp.logical_not(is_poly) if not skip_ell else
                         (jnp.logical_not(is_poly) & (poly_bits < 0)))
                def _():
                    # Fat ellipses: the reference's inscribed 100-gon, one
                    # chord per pixel with exact half-plane cell area
                    # (ops/raster.ellipse_chord_coverage; agg::ellipse
                    # cpp:455-479, 1080). Only the 8-row blocks meeting the
                    # prim's screen y-extent are evaluated — rows beyond the
                    # ELL_CULL_M margin are exactly zero (see OMF_EXT), and
                    # area_ref was just zeroed.
                    base = OMF_ELL + c * 8
                    i00 = OMF(k, frame, base + 0)
                    i01 = OMF(k, frame, base + 1)
                    i02 = OMF(k, frame, base + 2)
                    i10 = OMF(k, frame, base + 3)
                    i11 = OMF(k, frame, base + 4)
                    i12 = OMF(k, frame, base + 5)
                    rx_e = OMF(k, frame, base + 6)
                    ry_e = OMF(k, frame, base + 7)
                    ymn = OMF(k, frame, OMF_EXT + 2 * c) - ELL_CULL_M
                    ymx = OMF(k, frame, OMF_EXT + 2 * c + 1) + ELL_CULL_M
                    oyf = oy.astype(jnp.float32)
                    oxf = ox.astype(jnp.float32)
                    rb0 = jnp.clip(
                        jnp.floor(ymn - oyf).astype(jnp.int32) - 1, 0, gh
                    ) >> 3
                    rb1 = (jnp.clip(
                        jnp.floor(ymx - oyf).astype(jnp.int32), -1, gh - 1
                    ) >> 3) + 1

                    def eblk(rb, _):
                        r8 = pl.multiple_of(rb * 8, 8)
                        cx8 = (
                            lax.broadcasted_iota(jnp.int32, (8, gw), 1)
                        ).astype(jnp.float32) + (oxf + 0.5)
                        cy8 = (
                            lax.broadcasted_iota(jnp.int32, (8, gw), 0) + r8
                        ).astype(jnp.float32) + (oyf + 0.5)
                        ux = (i00 * cx8 + i01 * cy8 + i02) / rx_e
                        uy = (i10 * cx8 + i11 * cy8 + i12) / ry_e
                        aa_e, in_e = raster.ellipse_chord_coverage(
                            ux, uy, i00 / rx_e, i01 / rx_e, i10 / ry_e,
                            i11 / ry_e,
                        )
                        area_ref[pl.ds(r8, 8), :] = aa_e + jnp.where(
                            in_e, 2.0, 0.0
                        )
                        return 0

                    lax.fori_loop(rb0, jnp.minimum(rb1, gh // 8), eblk, 0)

                # area_ref carries aa in the fractional part and the binary
                # bit at +2 (one scratch, one pl.when pair).
                additive = ((add_bits >> c) & 1) != 0
                aa = area_ref[:] - jnp.where(area_ref[:] >= 2.0, 2.0, 0.0)
                ins = (area_ref[:] >= 2.0).astype(jnp.float32)
                a_aa = 1.0 - (1.0 - aa_ref[:]) * (1.0 - aa)
                a_in = jnp.maximum(in_ref[:], ins)
                s_aa = aa_ref[:] * (1.0 - aa)
                s_in = in_ref[:] * (1.0 - ins)
                aa_ref[:] = jnp.where(additive, a_aa, s_aa)
                in_ref[:] = jnp.where(additive, a_in, s_in)
                return 0

            lax.fori_loop(0, OMI(k, frame, OMI_NPRIMS), comp, 0)

        def own_mask(k, frame, t, y0, x0):
            pxi = lax.broadcasted_iota(jnp.int32, (wh, ww), 1) + x0
            pyi = lax.broadcasted_iota(jnp.int32, (wh, ww), 0) + y0
            return (
                (pyi >= TMI(k, frame, t, TMI_OY0))
                & (pyi < TMI(k, frame, t, TMI_OY1))
                & (pxi >= TMI(k, frame, t, TMI_OX0))
                & (pxi < TMI(k, frame, t, TMI_OX1))
            ).astype(jnp.float32)

        def blend_window(acc_frame, y0, x0, m, tr, tg, tb):
            bh, bw = m.shape  # full (wh, ww) window or one texture sub-window
            win = acc_frame[pl.ds(y0, bh), pl.ds(x0, bw)]
            fr, fg, fb = _unpack3f(win)
            fr = jnp.round(fr * (1.0 - m) + tr * m)
            fg = jnp.round(fg * (1.0 - m) + tg * m)
            fb = jnp.round(fb * (1.0 - m) + tb * m)
            acc_frame[pl.ds(y0, bh), pl.ds(x0, bw)] = _pack3f(fr, fg, fb)

        def write_ids(k, frame, mask01, y0, x0):
            # Painter's index image: the object id where the binary mask
            # fully covers (blitObject, cpp:765-774; fg ids = 10 + slot).
            mi = mask01.astype(jnp.int32)
            old = idacc[frame, pl.ds(y0, wh), pl.ds(x0, ww)]
            idacc[frame, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                (FG_ID_BASE + k) * mi + old * (1 - mi)
            )

        def motion_scalars(k, frame):
            return tuple(OMF(k, frame, OMF_MOTION + j) for j in range(6))

        def scalar_fold_coeffs(mm, cx_c, cy_c, nx=None, ny=None):
            """In-kernel reflect fold + two-pass split of a raw crop-space
            affine at footprint center (cx_c, cy_c) — the scalar twin of
            compose/fused._fold_coeffs, used where the fold must be chosen
            per sub-tile (warp-object expanded textures, background tiles).
            ``nx``/``ny``: the source's reflect periods (defaults: the
            frame-sized object crop)."""
            m00, m01, m02, m10, m11, m12 = mm
            margin = float(SLAB_MARGIN)
            nx = float(W) if nx is None else nx
            ny = float(H) if ny is None else ny

            def fold(s_c, n):
                r = s_c - (2.0 * n) * jnp.floor(s_c / (2.0 * n))
                mirror = r >= n
                off = s_c - r
                sig = jnp.where(mirror, -1.0, 1.0)
                beta = jnp.where(mirror, 2.0 * n - 1.0 + off, -off) + margin
                return sig, beta

            sx_c = m00 * cx_c + m01 * cy_c + m02
            sy_c = m10 * cx_c + m11 * cy_c + m12
            sigx, betax = fold(sx_c, nx)
            sigy, betay = fold(sy_c, ny)
            a = m00 * sigx
            bb = m01 * sigx
            e = m02 * sigx + betax
            c = m10 * sigy
            d = m11 * sigy
            f = m12 * sigy + betay
            B_ = bb / d
            return (a - B_ * c, B_, e - B_ * f, c, d, f)

        def _two_pass_split(mm):
            m00, m01, m02, m10, m11, m12 = mm
            B_ = m01 / m11
            return (m00 - B_ * m10, B_, m02 - B_ * m12, m10, m11, m12)

        def col_window(coeffs, ox, w0, wwl, Pl, CW, SW):
            """Column window of the staged row block: the 128-aligned start
            of the source-column range pass 1 can touch over an (output cols
            [ox, ox+wwl), staged rows [w0, w0+Pl)) window, clamped into a
            width-``SW`` slab, plus the coefficients rebased to it (u is
            shifted by -c0 through the C term). ``CW`` is the static span
            bound (resample_params._col_span); CW == SW disables windowing."""
            if CW >= SW:
                return jnp.int32(0), coeffs
            A, B, C_, c, d, f = coeffs
            xf = jnp.asarray(ox).astype(jnp.float32)
            wf = w0.astype(jnp.float32)
            us = [
                A * xx + B * wv + C_
                for xx in (xf, xf + (wwl - 1))
                for wv in (wf, wf + (Pl - 1))
            ]
            umin = jnp.minimum(jnp.minimum(us[0], us[1]),
                               jnp.minimum(us[2], us[3]))
            c0 = (jnp.floor(umin).astype(jnp.int32) - 1) & ~127
            c0 = pl.multiple_of(jnp.clip(c0, 0, SW - CW), 128)
            return c0, (A, B, C_ - c0.astype(jnp.float32), c, d, f)

        def sample_plane_affine(slot, ch, coeffs, y0, x0, xsc=None, ysc=None):
            """One (wh, ww) window of warp-aux plane ``ch`` sampled through an
            output->plane affine (two-pass split coeffs) — zero hardware
            gathers. The planes are (H, W); stage min(P, H) rows. ``xsc``/
            ``ysc`` override the scan counts (default: object envelope)."""
            PF = min(P, H)
            w0 = resamp.pass1_row_start(coeffs, x0, y0, wh, ww, PF, H)
            fdma = pltpu.make_async_copy(
                aux_hbm.at[slot, ch, pl.ds(w0, PF), :],
                frows.at[:PF, :W],
                sems.at[6],
            )
            fdma.start()
            fdma.wait()
            return resamp.resample_rows_f32(
                frows.at[:PF], w0, coeffs, x0, y0, wh, ww, PF,
                t1t.at[0], outt, xsc or xscan, ysc or yscan, sw=W,
            )

        def sample_wf_at_moved(k, frame, slot, ch, y0, x0):
            """Forward warp field channel sampled at the motion-moved window
            positions (getPointFlow cpp:398-406) via a two-pass f32 resample
            of the aux plane."""
            coeffs = _two_pass_split(motion_scalars(k, frame))
            return sample_plane_affine(slot, ch, coeffs, y0, x0)

        # ---- pipelined object units -------------------------------------
        # The object pass runs one flat painter-order work list per frame
        # (units = (object, tile)); unit j+1's edge-table and texture DMAs
        # are issued into the OTHER buffer slot while unit j computes, so
        # HBM traffic rides under the coverage/resample compute instead of
        # serializing with it (the round-2 roofline residue). Slots are
        # static (the unit loop is unrolled x2), so no scratch ref is ever
        # dynamically indexed. DMA descriptors are recreated at wait time
        # from the same SMEM scalars — the standard Pallas double-buffer
        # idiom. Deforming units (mode 9, frame 1) keep their internal DMAs
        # serial but still prefetch the NEXT unit's tables.

        def edges_dma(k, frame, eref, sem):
            return pltpu.make_async_copy(edges_hbm.at[b, k, frame], eref, sem)

        def tex_dma_f0(k, t, rows_ref, sem):
            y0, x0 = tile_origin(k, 0, t)
            tid = OMI(k, 0, OMI_TEX)
            sy = pl.multiple_of((SLAB_MARGIN + y0) & ~7, 8)
            sx = pl.multiple_of((SLAB_MARGIN + x0) & ~127, 128)
            return pltpu.make_async_copy(
                slabs_hbm.at[tid, pl.ds(sy, wh), pl.ds(sx, ww)],
                rows_ref.at[:wh, :ww],
                sem,
            )

        def tex_dma_f1(k, t, rows_ref, sem, sy=0, sx=0):
            """Frame-1 texture row DMA for sub-window (sy, sx) of tile t.
            tsplit == 1: one full-window resample through the XLA-precomputed
            per-tile fold (TMF). tsplit > 1 (modes 11/13): the fold is chosen
            IN-KERNEL at each sub-window's center from the raw residual
            affine (OMF_RAW) so every sub-footprint stays inside the slab's
            reflect margin (texture_split)."""
            y0, x0 = tile_origin(k, 1, t)
            tid = OMI(k, 1, OMI_TEX)
            if tsplit == 1:
                coeffs = tuple(TMF(k, 1, t, j) for j in range(6))
                oy, ox = y0, x0
            else:
                raw = tuple(OMF(k, 1, OMF_RAW + j) for j in range(6))
                oy = y0 + sy * whs
                ox = x0 + sx * wws
                coeffs = scalar_fold_coeffs(
                    raw, ox.astype(jnp.float32) + wws / 2.0,
                    oy.astype(jnp.float32) + whs / 2.0,
                    OMF(k, 1, OMF_RAW + 6), OMF(k, 1, OMF_RAW + 7),
                )
            w0 = resamp.pass1_row_start(coeffs, ox, oy, whs, wws, P, SHs)
            c0, coeffs = col_window(coeffs, ox, w0, wws, P, CWO, SWs)
            dma = pltpu.make_async_copy(
                slabs_hbm.at[tid, pl.ds(w0, P), pl.ds(c0, CWO)],
                rows_ref.at[:P, :CWO],
                sem,
            )
            return dma, coeffs, w0, oy, ox

        def start_unit(frame, j, eref, rows_ref, sem_e, sem_t):
            k, t = unit_kt(frame, j)
            edges_dma(k, frame, eref, sem_e).start()
            if debug_level < 2:
                return
            if frame == 0:
                tex_dma_f0(k, t, rows_ref, sem_t).start()
            elif has_warp:
                @pl.when(OMI(k, 1, OMI_WARP) == 0)
                def _():
                    tex_dma_f1(k, t, rows_ref, sem_t)[0].start()
            else:
                tex_dma_f1(k, t, rows_ref, sem_t)[0].start()

        def compute_unit(frame, j, eref, rows_ref, sem_t, acc_frame):
            """Unit j's compute; its DMAs were started by start_unit (same
            slot) and are waited here at their use points."""
            k, t = unit_kt(frame, j)
            if debug_level < 2:
                return
            y0, x0 = tile_origin(k, frame, t)
            warping = (
                (OMI(k, frame, OMI_WARP) != 0)
                if (has_warp and frame == 1) else None
            )

            def standard():
                coverage_into(eref, k, frame, y0, x0, cov_aa, cov_in,
                              cov_area, wh, ww)
                if debug_level < 3:
                    if frame == 0:
                        tex_dma_f0(k, t, rows_ref, sem_t).wait()
                    else:
                        tex_dma_f1(k, t, rows_ref, sem_t)[0].wait()
                    return
                own = own_mask(k, frame, t, y0, x0)
                m = (cov_aa[:] if use_aa else cov_in[:]) * own

                if frame == 0:
                    tex_dma_f0(k, t, rows_ref, sem_t).wait()
                    tr, tg, tb = _unpack3f(rows_ref[:wh, :ww])
                    blend_window(acc_frame, y0, x0, m, tr, tg, tb)
                else:
                    # tsplit x tsplit texture sub-windows, each with its own
                    # center fold + row DMA + two-pass resample, blended
                    # under the full window's coverage slice. Sub (0, 0) was
                    # prefetched by start_unit; the rest run serially in the
                    # same slot (the other slot holds the next unit's
                    # prefetch).
                    for sy in range(tsplit):
                        for sx in range(tsplit):
                            dma, coeffs, w0, oy, ox = tex_dma_f1(
                                k, t, rows_ref, sem_t, sy, sx
                            )
                            if (sy, sx) != (0, 0):
                                dma.start()
                            dma.wait()
                            tr, tg, tb = resamp.resample_rows_in_kernel(
                                rows_ref, w0, coeffs, ox, oy, whs, wws, P,
                                t1t if tsplit == 1 else t1t.at[:, :wws],
                                outt if tsplit == 1 else outt.at[:wws],
                                xscan, yscan, sw=CWO,
                            )
                            msub = m[
                                sy * whs : sy * whs + whs,
                                sx * wws : sx * wws + wws,
                            ]
                            blend_window(acc_frame, oy, ox, msub, tr, tg, tb)
                if emit_masks:
                    write_ids(k, frame, cov_in[:] * own_mask(k, frame, t,
                                                            y0, x0), y0, x0)

                emit = (frame == 0) or inverse_flow
                if emit:
                    px = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 1) + x0
                    ).astype(jnp.float32)
                    py = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 0) + y0
                    ).astype(jnp.float32)
                    mi = cov_in[:] * own
                    m00, m01, m02, m10, m11, m12 = motion_scalars(k, frame)
                    mvx = m00 * px + m01 * py + m02
                    mvy = m10 * px + m11 * py + m12
                    ofx = mvx - px
                    ofy = mvy - py
                    fi = 0 if frame == 0 else 2
                    wx = accf[fi, pl.ds(y0, wh), pl.ds(x0, ww)]
                    wy = accf[fi + 1, pl.ds(y0, wh), pl.ds(x0, ww)]
                    accf[fi, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                        ofx * mi + wx * (1.0 - mi)
                    )
                    accf[fi + 1, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                        ofy * mi + wy * (1.0 - mi)
                    )
                    if has_warp and frame == 0:
                        # Nonrigid flow: + forward field at the moved
                        # position, inside the frame (cpp:398-406). Additive
                        # after the overwrite, gated by the same mask.
                        @pl.when(OMI(k, frame, OMI_WARP) != 0)
                        def _():
                            slot = OMI(k, frame, OMI_SLOT)
                            inb = (
                                (mvx >= 0) & (mvx < W)
                                & (mvy >= 0) & (mvy < H)
                            ).astype(jnp.float32) * mi
                            wfx = sample_wf_at_moved(k, frame, slot, 2, y0, x0)
                            accf[0, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                                accf[0, pl.ds(y0, wh), pl.ds(x0, ww)]
                                + wfx * inb
                            )
                            wfy = sample_wf_at_moved(k, frame, slot, 3, y0, x0)
                            accf[1, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                                accf[1, pl.ds(y0, wh), pl.ds(x0, ww)]
                                + wfy * inb
                            )

            if warping is None:
                standard()
                return

            @pl.when(jnp.logical_not(warping))
            def _():
                standard()

            @pl.when(warping)
            def _():
                # ---- deforming object, frame 1 (renderMasks cpp:370-386 +
                # renderTransformedTexture cpp:341-346): evaluate coverage
                # and the affine-warped texture on an EXPANDED grid, then
                # displace both through the inverse field via the separable
                # two-pass (aux fields precomputed per bank epoch). ----
                tid = OMI(k, frame, OMI_TEX)
                slot = OMI(k, frame, OMI_SLOT)
                ey0 = pl.multiple_of(
                    jnp.clip(y0 - WARP_EY, 0, H - whE) & ~7, 8
                )
                ex0 = jnp.clip(x0 - WARP_EX, 0, W - wwE)
                ig_dma = pltpu.make_async_copy(
                    aux_hbm.at[slot, 0, pl.ds(ey0, whE), pl.ds(x0, ww)],
                    igbuf, sems.at[4],
                )
                ig_dma.start()
                iv_dma = pltpu.make_async_copy(
                    aux_hbm.at[slot, 1, pl.ds(y0, wh), pl.ds(x0, ww)],
                    ivbuf, sems.at[5],
                )
                iv_dma.start()

                coverage_into(eref, k, frame, ey0, ex0, covE_aa, covE_in,
                              covE_area, whE, wwE)

                mm = motion_scalars(k, frame)  # motion_inv (flow slot, f1)
                for ly in LYS:
                    for lx in LXS:
                        oy = ey0 + ly
                        ox = ex0 + lx
                        coeffs = scalar_fold_coeffs(
                            mm, ox.astype(jnp.float32) + ww / 2.0,
                            oy.astype(jnp.float32) + wh / 2.0,
                        )
                        w0 = resamp.pass1_row_start(
                            coeffs, ox, oy, wh, ww, P, SHs
                        )
                        c0, coeffs = col_window(
                            coeffs, ox, w0, ww, P, CWO, SWs
                        )
                        tdma = pltpu.make_async_copy(
                            slabs_hbm.at[tid, pl.ds(w0, P), pl.ds(c0, CWO)],
                            rows_ref.at[:P, :CWO],
                            sem_t,
                        )
                        tdma.start()
                        tdma.wait()
                        tr, tg, tb = resamp.resample_rows_in_kernel(
                            rows_ref, w0, coeffs, ox, oy, wh, ww, P,
                            t1t, outt, xscan, yscan, sw=CWO,
                        )
                        # Packed u8 — the reference materializes this very
                        # intermediate as a u8 CImg (cpp:341-346) before
                        # warping it.
                        texE[ly : ly + wh, lx : lx + ww] = (
                            resamp._pack_rgb_rounded(tr, tg, tb)
                        )

                ig_dma.wait()
                iv_dma.wait()
                gd = igbuf[:]
                vd = ivbuf[:]

                def disp(src_ref):
                    return resamp.displace_warp_in_kernel(
                        src_ref, gd, vd, x0, y0, ex0, ey0,
                        wh, ww, whE, wwE, dtmp, dtmpT, outt,
                    )

                own = own_mask(k, frame, t, y0, x0)
                aaW = disp(covE_aa)
                inW = (disp(covE_in) >= IN_THR).astype(jnp.float32)
                m = (aaW if use_aa else inW) * own
                trW, tgW, tbW = resamp.displace_warp_rgb_in_kernel(
                    texE, gd, vd, x0, y0, ex0, ey0,
                    wh, ww, whE, wwE, ptmp, ptmpT, out3T,
                )
                blend_window(acc_frame, y0, x0, m, trW, tgW, tbW)
                if emit_masks:
                    write_ids(k, frame, inW * own, y0, x0)
                if inverse_flow:
                    # Inverse flow of a deforming object: the inverse AFFINE
                    # displacement masked by the warped binary mask (the
                    # windowed path's semantics; the reference never computes
                    # inverse flow, cpp:1226).
                    px = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 1) + x0
                    ).astype(jnp.float32)
                    py = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 0) + y0
                    ).astype(jnp.float32)
                    m00, m01, m02, m10, m11, m12 = motion_scalars(k, frame)
                    ofx = m00 * px + m01 * py + m02 - px
                    ofy = m10 * px + m11 * py + m12 - py
                    mi = inW * own
                    wx = accf[2, pl.ds(y0, wh), pl.ds(x0, ww)]
                    wy = accf[3, pl.ds(y0, wh), pl.ds(x0, ww)]
                    accf[2, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                        ofx * mi + wx * (1.0 - mi)
                    )
                    accf[3, pl.ds(y0, wh), pl.ds(x0, ww)] = (
                        ofy * mi + wy * (1.0 - mi)
                    )

        def bg_window_dma(frame, oy, ox, rows_ref, sem):
            """DMA descriptor + resample coeffs for one plain-background
            window at frame-coord origin (oy, ox) — randomized crop chain
            (+ inverse big motion for frame 1), reflect fold chosen in-kernel
            at the window center (MovingObjectBackground, cpp:654-688).
            Recreated at wait time from the same SMEM scalars (the standard
            double-buffer idiom, as the object units)."""
            base = BGM_T0 if frame == 0 else BGM_T1
            aff = tuple(bgm[0, base + j] for j in range(6))
            coeffs = scalar_fold_coeffs(
                aff, ox + ww / 2.0, oy + wh / 2.0,
                bgm[0, BGM_SRCW], bgm[0, BGM_SRCH],
            )
            btid = smeta[0, 1 + K]
            w0 = resamp.pass1_row_start(
                coeffs, jnp.int32(ox), jnp.int32(oy), wh, ww, PBG, SHb
            )
            c0, coeffs = col_window(
                coeffs, jnp.int32(ox), w0, ww, PBG, CWB, SWb
            )
            bdma = pltpu.make_async_copy(
                bgslabs_hbm.at[btid, pl.ds(w0, PBG), pl.ds(c0, CWB)],
                rows_ref.at[:PBG, :CWB],
                sem,
            )
            return bdma, coeffs, w0

        def bg_tiles_pipelined(units):
            """Render a static list of background windows ``(frame, oy, ox,
            writer)`` with the tile i+1 row DMA in flight while tile i
            resamples (the background was the last serial start();wait()
            consumer in the kernel). ``writer(tr, tg, tb)`` commits one
            window's three channel planes."""
            slots = ((rows0, sems.at[4]), (rows1, sems.at[5]))
            bg_window_dma(*units[0][:3], *slots[0])[0].start()
            for i, (frame, oy, ox, writer) in enumerate(units):
                rows_ref, sem = slots[i % 2]
                if i + 1 < len(units):
                    nf, ny, nx, _ = units[i + 1]
                    bg_window_dma(nf, ny, nx, *slots[1 - i % 2])[0].start()
                bdma, coeffs, w0 = bg_window_dma(frame, oy, ox, rows_ref, sem)
                bdma.wait()
                writer(*resamp.resample_rows_in_kernel(
                    rows_ref, w0, coeffs, jnp.int32(ox), jnp.int32(oy),
                    wh, ww, PBG, t1t, outt, xscanb, yscanb, sw=CWB,
                ))

        def acc_writer(acc_frame, y0s, x0s):
            def write(tr, tg, tb):
                acc_frame[y0s : y0s + wh, x0s : x0s + ww] = _pack3f(
                    jnp.round(tr), jnp.round(tg), jnp.round(tb)
                )
            return write

        def plain_bg_units(frame, acc_frame):
            return [
                (frame, y0s, x0s, acc_writer(acc_frame, y0s, x0s))
                for (y0s, x0s) in bg_tiles
            ]

        def render_background():
            """Both background frames into the accumulators. Nonrigid samples
            (mode 9, ~bg_warp_p of them) deform frame 1 in-kernel: the plain
            frame-1 background is evaluated on an extended grid and displaced
            through the x2-upscaled inverse field (cpp:1194-1202 — crop
            resized x2 in size and magnitude; the displace-then-affine source
            chain commutes to displacing the affine-resampled frame, with the
            displacement read at big coords = frame + center). The forward
            field's flow contribution is added over the whole frame before
            any object overwrites it (getPointFlow cpp:714-717)."""
            if not has_warp:
                bg_tiles_pipelined(
                    plain_bg_units(0, acc0) + plain_bg_units(1, acc1)
                )
                return
            bg_tiles_pipelined(plain_bg_units(0, acc0))
            bgw = smeta[0, 2 + K] != 0
            slot = smeta[0, 3 + K]

            @pl.when(jnp.logical_not(bgw))
            def _():
                bg_tiles_pipelined(plain_bg_units(1, acc1))

            @pl.when(bgw)
            def _():
                # Plain frame 1 on the extended grid (margins >= the x2
                # field's displacement bound).
                def work_writer(eys, exs):
                    def write(tr, tg, tb):
                        # Packed u8: the reference's extended background is
                        # a u8 CImg too (cpp:1194-1202).
                        bgwork[
                            eys + BG_EY : eys + BG_EY + wh,
                            exs + BG_EX : exs + BG_EX + ww,
                        ] = resamp._pack_rgb_rounded(tr, tg, tb)
                    return write

                bg_tiles_pipelined([
                    (1, eys, exs, work_writer(eys, exs))
                    for (eys, exs) in bg_ext_tiles
                ])
                # Displace per output tile via the precomputed
                # column-inverse-corrected bg planes (bgaux).
                for (y0s, x0s) in bg_tiles:
                    band0 = y0s  # bgwork row y0s == frame row y0s - BG_EY
                    gdma = pltpu.make_async_copy(
                        bgaux_hbm.at[slot, 0, pl.ds(band0, whB),
                                     pl.ds(x0s, ww)],
                        bggbuf, sems.at[4],
                    )
                    gdma.start()
                    vdma = pltpu.make_async_copy(
                        bgaux_hbm.at[slot, 1, pl.ds(y0s + BG_EY, wh),
                                     pl.ds(x0s, ww)],
                        ivbuf, sems.at[5],
                    )
                    vdma.start()
                    gdma.wait()
                    vdma.wait()
                    gd = bggbuf[:]
                    vd = ivbuf[:]

                    rW, gW, bW = resamp.displace_warp_rgb_in_kernel(
                        bgwork.at[pl.ds(band0, whB)], gd, vd,
                        jnp.int32(x0s), jnp.int32(y0s),
                        jnp.int32(-BG_EX), jnp.int32(y0s - BG_EY),
                        wh, ww, whB, WB, ptmp, ptmpT, out3T,
                        x_scan=4, y_scan=4,
                    )
                    acc1[y0s : y0s + wh, x0s : x0s + ww] = _pack3f(
                        jnp.round(rW), jnp.round(gW), jnp.round(bW)
                    )
                # Forward-field flow contribution at the moved positions
                # (sampled from the native crop through the half-scale
                # composed affine, x2 magnitude), gated on landing inside
                # the 2Wx2H big texture.
                faff = _two_pass_split(
                    tuple(bgm[0, BGM_FAFF + j] for j in range(6))
                )
                mp = tuple(bgm[0, BGM_PIX + j] for j in range(6))
                for (y0s, x0s) in bg_tiles:
                    px = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 1) + x0s
                    ).astype(jnp.float32)
                    py = (
                        lax.broadcasted_iota(jnp.int32, (wh, ww), 0) + y0s
                    ).astype(jnp.float32)
                    mvx = mp[0] * px + mp[1] * py + mp[2] + (W / 2.0)
                    mvy = mp[3] * px + mp[4] * py + mp[5] + (H / 2.0)
                    inb = (
                        (mvx >= 0) & (mvx < 2.0 * W)
                        & (mvy >= 0) & (mvy < 2.0 * H)
                    ).astype(jnp.float32)
                    wfx = sample_plane_affine(
                        slot, 2, faff, jnp.int32(y0s), jnp.int32(x0s),
                        xscanb, yscanb,
                    )
                    accf[0, y0s : y0s + wh, x0s : x0s + ww] = (
                        accf[0, y0s : y0s + wh, x0s : x0s + ww]
                        + 2.0 * wfx * inb
                    )
                    wfy = sample_plane_affine(
                        slot, 3, faff, jnp.int32(y0s), jnp.int32(x0s),
                        xscanb, yscanb,
                    )
                    accf[1, y0s : y0s + wh, x0s : x0s + ww] = (
                        accf[1, y0s : y0s + wh, x0s : x0s + ww]
                        + 2.0 * wfy * inb
                    )

        if debug_level >= 0:
            render_background()

        def frame_pass(frame, acc_frame):
            """All of one frame's units in painter order, software-pipelined
            over two static buffer slots (edges: es0/es1 + sems 0/1;
            texture rows: rows0/rows1 + sems 2/3)."""
            n = NW(frame)
            slot_refs = (
                (es0, rows0, sems.at[0], sems.at[2]),
                (es1, rows1, sems.at[1], sems.at[3]),
            )

            @pl.when(n > 0)
            def _():
                start_unit(frame, 0, *slot_refs[0])

            def body(i2, _):
                j0 = i2 * 2
                for h in (0, 1):
                    j = j0 + h
                    eref, rows_ref, sem_e, sem_t = slot_refs[h]

                    @pl.when(j < n)
                    def _(j=j, h=h, eref=eref, rows_ref=rows_ref,
                          sem_e=sem_e, sem_t=sem_t):
                        @pl.when(j + 1 < n)
                        def _():
                            start_unit(frame, j + 1, *slot_refs[1 - h])

                        k, t = unit_kt(frame, j)
                        edges_dma(k, frame, eref, sem_e).wait()
                        compute_unit(frame, j, eref, rows_ref, sem_t,
                                     acc_frame)
                return 0

            lax.fori_loop(0, (n + 1) // 2, body, 0)

        if debug_level >= 1:
            frame_pass(0, acc0)
            frame_pass(1, acc1)

        # ---- store results (pipelined: waited by the NEXT grid step) ----
        for cp in store_dmas():
            cp.start()

        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            for cp in store_dmas():
                cp.wait()

    return kernel


def _pad128(n: int) -> int:
    return _round_up(n, 128)


def build_worklists(count, order, omi):
    """Flattened painter-order (object, tile) unit lists per frame, the
    megakernel's pipelined iteration domain.

    Returns ``(worklist (B, 2*K*MAX_TILES) i32, n_units (B, 2) i32)`` with
    entries ``k * MAX_TILES + t``. A unit exists for every painter position
    ``< count`` whose frame OMI_ON flag is set, tiles ``0..nty*ntx-1`` in
    row-major order — exactly the units the nested object/tile loops of the
    unpipelined kernel visited, in the same order (painter overwrite
    semantics depend on it, cpp:740-774)."""
    _, K = order.shape

    def one(cnt, ord_, om):
        t = jnp.arange(MAX_TILES)
        jidx = jnp.arange(K)

        def frame(f):
            on = om[:, f, OMI_ON][ord_] != 0
            nt = (om[:, f, OMI_NTY] * om[:, f, OMI_NTX])[ord_]
            valid = (
                (jidx[:, None] < cnt)
                & on[:, None]
                & (t[None, :] < nt[:, None])
            ).reshape(-1)
            val = (ord_[:, None] * MAX_TILES + t[None, :]).reshape(-1)
            pos = jnp.argsort(~valid, stable=True)
            return val[pos], jnp.sum(valid)

        w0, n0 = frame(0)
        w1, n1 = frame(1)
        return jnp.concatenate([w0, w1]), jnp.stack([n0, n1])

    wl, nw = jax.vmap(one)(count, order, omi)
    return wl.astype(jnp.int32), nw.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("spec_key", "use_aa", "inverse_flow", "emit_masks",
                     "interpret", "debug_level"),
)
def scene_render_pallas(
    count, order, bg_meta, omi, omf, tmi, tmf, bgm, edges, slabs, bgslabs,
    warp_aux=None, bgaux=None, worklist=None, n_units=None,
    *, spec_key, use_aa=True, inverse_flow=False, emit_masks=False,
    interpret=False, debug_level=3,
):
    """Run the scene megakernel over a batch.

    Inputs (built by compose/fused.py): ``count`` (B,), ``order`` (B,K),
    ``omi`` (B,K,2,OMI_SIZE) i32, ``omf`` (B,K,2,OMF_SIZE) f32,
    ``tmi`` (B,K,2,MAX_TILES,TMI_SIZE) i32, ``tmf`` same in f32,
    ``bg_meta`` (B, 3) i32 [bg texture id, bg warp flag, bg warp slot],
    ``bgm`` (B, BGM_SIZE) f32 raw background affines/periods/motion (layout
    constants above; reflect folds are chosen in-kernel per tile), ``edges``
    (B,K,2,4,EP) f32, ``slabs`` (T,SHs,SWs) i32 packed object-crop slabs,
    ``bgslabs`` (T,SHb,SWb) i32 packed full-source slabs. The affine
    background flow init is evaluated IN-KERNEL from the bgm pixel-motion
    scalars (BGM_PIX / BGM_IPIX; the warp-field term is also added
    in-kernel). Frames render entirely in-kernel.
    Mode 9 passes ``warp_aux`` (N,4,H,W) and ``bgaux`` (N,2,H+2*BG_EY,W)
    (warpfields.generator.make_warp_aux).

    All small metadata is flattened to (B, mult-of-128) rows here and DMA'd
    into unpadded SMEM scratch per sample (SMEM BlockSpec windows tile-pad
    their last two dims to (8, 128), which inflates these tables ~50x past
    the 1 MB SMEM budget).

    ``spec_key``: hashable (P, PBG, xscan, yscan, xscanb, yscanb, tsplit,
    cw_obj, cw_bg, H, W) static tuple from ``resample_params`` + frame dims
    (``P``/scans are per texture sub-window, see :func:`texture_split`;
    ``cw_*`` are the staged column-window widths, clamped to the slab
    widths here). Returns (frames (B,2,H,W) i32, flow (B,2 or 4,H,W) f32).
    """
    from ..config import MAX_COMPONENTS, MAX_EDGES

    P, PBG, xscan, yscan, xscanb, yscanb, tsplit, cwo, cwb, H, W = spec_key
    B, K = order.shape
    EP = edges.shape[-1]
    C = MAX_COMPONENTS
    E = MAX_EDGES
    SHs, SWs = slabs.shape[1], slabs.shape[2]
    SHb, SWb = bgslabs.shape[1], bgslabs.shape[2]
    wh, ww = min(WIN_H, H), min(WIN_W, W)
    Pmax = max(P, PBG)
    Pp = _round_up(Pmax, 128)
    nflow = 4 if inverse_flow else 2
    NBT = (-(-H // wh)) * (-(-W // ww))
    has_warp = warp_aux is not None
    whE = min(wh + 2 * WARP_EY, H)
    wwE = min(ww + 2 * WARP_EX, W)
    whEp = _round_up(whE, 128)
    Wp = _round_up(W, 128)

    CWO = min(cwo, SWs)
    CWB = min(cwb, SWb)
    kernel = _make_scene_kernel(
        H, W, K, C, E, EP, P, PBG, xscan, yscan, xscanb, yscanb, SHs, SWs,
        SHb, SWb, use_aa, inverse_flow, has_warp, emit_masks, debug_level,
        tsplit, CWO, CWB,
    )

    # Flatten + pad the metadata to (B, mult-of-128) HBM rows.
    def flat(x, width):
        x = x.reshape(B, 1, -1)
        # (B, 1, width): leading dims slice cleanly for row DMA (a 2-D
        # (B, width) array gets an (8, 128) HBM tiling whose rows can't be
        # sliced singly).
        return jnp.pad(x, ((0, 0), (0, 0), (0, width - x.shape[2])))

    MAXW = K * MAX_TILES
    if worklist is None:
        # Painter-order fallback for callers that predate the pipelined
        # work lists: every (in-order object, tile) pair, with per-unit
        # validity re-derived in XLA from the same tables the kernel holds.
        worklist, n_units = build_worklists(count, order, omi)
    SM_LEN = _pad128(6 + K)
    smeta = flat(
        jnp.concatenate(
            [
                count.reshape(B, 1),
                order.astype(jnp.int32),
                bg_meta.reshape(B, -1).astype(jnp.int32),
                n_units.reshape(B, 2).astype(jnp.int32),
            ],
            1,
        ),
        SM_LEN,
    )
    wl_f = flat(worklist.astype(jnp.int32), _pad128(2 * MAXW))
    omi_w = _pad128(K * 2 * OMI_SIZE)
    omf_w = _pad128(K * 2 * OMF_SIZE)
    tm_w = _pad128(K * 2 * MAX_TILES * TMI_SIZE)
    omi_f = flat(omi.astype(jnp.int32), omi_w)
    omf_f = flat(omf.astype(jnp.float32), omf_w)
    tmi_f = flat(tmi.astype(jnp.int32), tm_w)
    tmf_f = flat(tmf.astype(jnp.float32), tm_w)
    bg_w = _pad128(BGM_SIZE)
    bgm_f = flat(bgm.astype(jnp.float32), bg_w)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # The rows buffer stages object windows (frame 0: ww cols), object
    # frame-1 row blocks (CWO cols), and background row blocks (CWB cols).
    rows_w = max(ww, CWO, CWB)
    scratch = [
        pltpu.VMEM((H, W), jnp.int32),
        pltpu.VMEM((H, W), jnp.int32),
        pltpu.VMEM((nflow, H, W), jnp.float32),
        pltpu.SMEM((1, SM_LEN), jnp.int32),
        pltpu.SMEM((1, omi_w), jnp.int32),
        pltpu.SMEM((1, omf_w), jnp.float32),
        pltpu.SMEM((1, tm_w), jnp.int32),
        pltpu.SMEM((1, tm_w), jnp.float32),
        pltpu.SMEM((1, bg_w), jnp.float32),
        pltpu.SMEM((1, _pad128(2 * MAXW)), jnp.int32),
        pltpu.SMEM((4, EP), jnp.float32),
        pltpu.SMEM((4, EP), jnp.float32),
        pltpu.VMEM((Pmax, rows_w), jnp.int32),
        pltpu.VMEM((Pmax, rows_w), jnp.int32),
        pltpu.VMEM((3, ww, Pp), jnp.float32),
        pltpu.VMEM((ww, _round_up(wh, 128)), jnp.float32),
        pltpu.VMEM((wh, ww), jnp.float32),
        pltpu.VMEM((wh, ww), jnp.float32),
        pltpu.VMEM((wh, ww), jnp.float32),
    ]
    if has_warp:
        HB = H + 2 * BG_EY
        WB = W + 2 * BG_EX
        whB = min(wh + 2 * BG_EY, HB)
        whBp = _round_up(whB, 128)
        scratch += [
            pltpu.VMEM((whE, wwE), jnp.float32),     # covE_aa
            pltpu.VMEM((whE, wwE), jnp.float32),     # covE_in
            pltpu.VMEM((whE, wwE), jnp.float32),     # covE_area
            pltpu.VMEM((whE, wwE), jnp.int32),       # texE (packed RGB)
            pltpu.VMEM((whE, ww), jnp.float32),      # igbuf
            pltpu.VMEM((wh, ww), jnp.float32),       # ivbuf
            pltpu.VMEM((whE, ww), jnp.float32),      # dtmp
            pltpu.VMEM((ww, whEp), jnp.float32),     # dtmpT
            pltpu.VMEM((P, Wp), jnp.float32),        # frows
            pltpu.VMEM((HB, WB), jnp.int32),         # bgwork (packed ext bg)
            pltpu.VMEM((whB, ww), jnp.float32),      # bggbuf
            # Packed-RGB displacement-warp scratch, shared by the object and
            # background branches (sized for the larger of the two).
            pltpu.VMEM((max(whE, whB), ww), jnp.int32),     # ptmp
            pltpu.VMEM((ww, max(whEp, whBp)), jnp.int32),   # ptmpT
            pltpu.VMEM((3, ww, _round_up(wh, 128)), jnp.float32),  # out3T
        ]
    if emit_masks:
        scratch.append(pltpu.VMEM((2, H, W), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((12,)))

    n_in = 10 + (2 if has_warp else 0)
    n_out = 3 if emit_masks else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[any_spec] * n_in,
        out_specs=(any_spec,) * n_out,
        scratch_shapes=scratch,
    )
    inputs = [smeta, omi_f, omf_f, tmi_f, tmf_f, bgm_f, wl_f, edges, slabs,
              bgslabs]
    if has_warp:
        inputs += [warp_aux, bgaux]
    out_shape = [
        jax.ShapeDtypeStruct((B, 2, H, W), jnp.int32),
        jax.ShapeDtypeStruct((B, nflow, H, W), jnp.float32),
    ]
    if emit_masks:
        out_shape.append(jax.ShapeDtypeStruct((B, 2, H, W), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if emit_masks:
        return out
    return out[0], out[1], None
