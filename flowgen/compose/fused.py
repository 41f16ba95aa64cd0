"""Fused batch rendering: XLA precompute feeding the scene megakernel.

This path replaces :func:`flowgen.compose.render.render_batch`'s per-object
XLA dispatch loop with ONE Mosaic program per sample
(flowgen/ops/pallas_scene.py). The division of labor:

* XLA (this module, all dense/vmapped): the background pass (quad-gather
  frames + analytic flow, render.background_pass), per-object screen bboxes
  and painter-order compaction, window-tile grids with ownership rects,
  screen-space edge tables, ellipse inverse transforms, and the per-tile
  two-pass resample coefficients with the reflect fold composed in.
* Mosaic: everything per-pixel — coverage, composite algebra, texture
  unpack/resample, blending, flow overwrite.

Semantics match the windowed XLA path (render.render_sample) exactly for
coverage/binary masks/flow; frame-1 textures use the banded two-pass
resampler, whose only deviation from true bilinear is interpolation along the
shear direction (see ops/pallas_resample.py — sub-level, same order as the
reference's own multi-resample blur).

Eligibility is static per frame dims only (``pallas_scene.fused_eligible``):
every mode runs in-kernel — rotation envelopes beyond the resampler's 45-deg
conditioning bound (modes 11/13) are quadrant-factored (``_quadrant_factor``),
nonrigid deformation (mode 9) and inverse flow run in-kernel. Non-(8,128)-
aligned frame dims fall back to render.render_batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MAX_COMPONENTS, MAX_EDGES, DataGenConfig
from ..ops import affine
from ..ops import pallas_resample as resamp
from ..ops import pallas_scene as ps
from ..params.blueprint import Scene
from . import render as render_mod

EDGE_POOL = ((MAX_COMPONENTS * MAX_EDGES + 127) // 128) * 128  # 896
MAX_TILES_AXIS = 3


def _cdiv(a, b):
    return (a + b - 1) // b


def _tile_grid(lo, hi, on, frame_dim, win, snap, margin):
    """Per-object tile grid along one axis. ``lo``/``hi``: [K] bbox bounds,
    ``win``: tile extent, ``snap``: alignment (8 sublanes / 128 lanes),
    ``margin``: [K] cover margin (AA feather; + the warp displacement bound
    for deforming objects). Returns (anchor, n_tiles) int32 [K]."""
    cov_lo = jnp.clip(jnp.floor(lo - margin), 0, frame_dim).astype(jnp.int32)
    cov_hi = jnp.clip(jnp.ceil(hi + margin) + 1, 0, frame_dim).astype(jnp.int32)
    anchor = cov_lo & ~(snap - 1)
    n = jnp.clip(_cdiv(cov_hi - anchor, win), 1, MAX_TILES_AXIS)
    return anchor, jnp.where(on, n, 0)


def _edge_table(tr, prims):
    """Screen-space edge endpoints for every primitive slot under transforms
    ``tr`` [K,C,2,3]: (K, 4, EDGE_POOL) f32, rows [ax, ay, bx, by]."""
    pts = affine.apply(tr, prims.edge_pts)               # [K,C,E,2]
    b = jnp.roll(pts, -1, axis=2)
    K, C, E = pts.shape[0], pts.shape[1], pts.shape[2]
    tab = jnp.stack(
        [pts[..., 0], pts[..., 1], b[..., 0], b[..., 1]], axis=1
    ).reshape(K, 4, C * E)
    pad = EDGE_POOL - C * E
    return jnp.pad(tab, ((0, 0), (0, 0), (0, pad)))


def _ell_params(tr, prims):
    """Per-primitive ellipse params [K, C*8]: inverse transform (6), rx, ry."""
    inv = affine.invert(tr)                              # [K,C,2,3]
    K, C = inv.shape[0], inv.shape[1]
    return jnp.concatenate(
        [
            inv.reshape(K, C, 6),
            prims.ell_rx[..., None],
            prims.ell_ry[..., None],
        ],
        axis=-1,
    ).reshape(K, C * 8)


def _ell_yext(tr, prims):
    """Per-primitive screen y-extent [K, C*2] = (ymin, ymax) of the ellipse
    under ``tr``: center tr[1,2] +- |(tr[1,0]*rx, tr[1,1]*ry)| — the kernel's
    chord-coverage pass culls row blocks provably outside it
    (ps.OMF_EXT / ELL_CULL_M)."""
    K, C = tr.shape[0], tr.shape[1]
    cy = tr[..., 1, 2]
    hy = jnp.sqrt(
        (tr[..., 1, 0] * prims.ell_rx) ** 2
        + (tr[..., 1, 1] * prims.ell_ry) ** 2
    )
    return jnp.stack([cy - hy, cy + hy], axis=-1).reshape(K, C * 2)


def _fold_coeffs(t, cx, cy, nx, ny, margin):
    """Two-pass resample coefficients for windows centered at (cx, cy)
    [..., T], sampling an (ny, nx) texture through the affine ``t``
    [..., 2, 3] with AGG reflect wrap folded in (period 2nx x 2ny; the fold
    at the footprint center is a translation or mirror per axis — both
    affine — composed into the output->slab map; see ops/pallas_scene.py
    docstring)."""
    m = t[..., None, :, :]                               # [...,1,2,3]
    scx = m[..., 0, 0] * cx + m[..., 0, 1] * cy + m[..., 0, 2]   # [...,T]
    scy = m[..., 1, 0] * cx + m[..., 1, 1] * cy + m[..., 1, 2]

    def fold(s_c, n):
        r = jnp.mod(s_c, 2.0 * n)
        mirror = r >= n
        off = s_c - r
        sigma = jnp.where(mirror, -1.0, 1.0)
        beta = jnp.where(mirror, 2.0 * n - 1.0 + off, -off) + margin
        return sigma, beta

    sx, bx = fold(scx, jnp.asarray(nx, jnp.float32))
    sy, by = fold(scy, jnp.asarray(ny, jnp.float32))
    a = m[..., 0, 0] * sx
    bb = m[..., 0, 1] * sx
    e = m[..., 0, 2] * sx + bx
    c = m[..., 1, 0] * sy
    d = m[..., 1, 1] * sy
    f = m[..., 1, 2] * sy + by
    # two_pass_coeffs, vectorized (ops/pallas_resample.py:94-102).
    B_ = bb / d
    A = a - B_ * c
    C_ = e - B_ * f
    return jnp.stack([A, B_, C_, c, d, f], axis=-1)      # [K,T,6]


def _quadrant_factor(minv, W, H):
    """Factor each frame-1 sampling affine [K, 2, 3] (output -> source) as
    quadrant * residual so the banded resampler's |rot| < 45 deg conditioning
    holds for ANY object rotation (modes 11/13 reach +-123 deg; reference AGG
    spans handle arbitrary affines, DataGenerator.cpp:203-221).

    q = round(theta / 90deg) in {-2..2}. The 180-deg part is the point
    reflection S: p -> -1-p, under which the reflect-wrap extension is
    pointwise INVARIANT (AGG reflect at -1-t equals t), so composing S costs
    nothing and flips the linear part by R(180). The +-90-deg parts compose
    the coordinate swap Q: (x,y) -> (y, W-1-x) and sample the rot90 slab copy
    (texture id offset by the atlas size). Residual rotation = theta - q*90
    in [-45, 45] deg always.

    Returns (t_eff [K,2,3], rot90 [K] bool): the composed affine into the
    (possibly rotated) slab's source coords and the odd-quadrant flag."""
    theta = jnp.arctan2(minv[:, 1, 0], minv[:, 0, 0])
    q = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    mirror = (q == -1) | (jnp.abs(q) == 2)
    rot90 = jnp.abs(q) == 1
    # S o M: negate everything, translation gets the extra -1.
    tm = jnp.where(
        mirror[:, None, None],
        jnp.concatenate([-minv[..., :2], -minv[..., 2:] - 1.0], axis=-1),
        minv,
    )
    # Q o M: row0' = row1; row1' = -row0 except translation W-1 - t0.
    tq = jnp.stack(
        [
            tm[:, 1, :],
            jnp.concatenate(
                [-tm[:, 0, :2], (W - 1.0) - tm[:, 0, 2:]], axis=-1
            ),
        ],
        axis=1,
    )
    return jnp.where(rot90[:, None, None], tq, tm), rot90


def _span_requirements(t_eff, wh, ww, chunk, xchunk):
    """ACTUAL two-pass resampling requirements of effective output->source
    affines ``t_eff`` [..., 2, 3]: (row_span, xs_need, ys_need) — the exact
    per-affine analogs of the static sizing in
    ``pallas_resample.max_row_span`` / ``scan_tiles_pass1`` /
    ``scan_tiles_pass2`` (including their +4/+8 and +3/+1 slack terms), using
    the same coefficients the kernel derives (``two_pass_coeffs``)."""
    a = t_eff[..., 0, 0]
    b = t_eff[..., 0, 1]
    c = t_eff[..., 1, 0]
    d = t_eff[..., 1, 1]
    d_safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    B = b / d_safe
    A = a - B * c
    span = jnp.abs(c) * ww + jnp.abs(d) * wh + 4.0 + 8.0
    xs_need = jnp.ceil(
        (jnp.abs(A) * 128.0 + jnp.abs(B) * chunk + 3.0) / 128.0
    ) + 1.0
    ys_need = jnp.ceil(
        (jnp.abs(c) * xchunk + jnp.abs(d) * 128.0 + 3.0) / 128.0
    ) + 1.0
    return span, xs_need, ys_need


def envelope_violations(scenes: Scene, cfg: DataGenConfig, bgm=None):
    """Runtime guard for the fused path's statically-sized resampler: count
    the scene elements in a batch whose ACTUAL frame-1 sampling affine needs
    a larger pass-1 row span or scan window than the kernel compiled for the
    mode's declared envelope (``pallas_scene.mode_envelope``).

    Zero for every built-in mode by construction — the FlyingChairs shapers
    map into closed ranges (DataGenerator.cpp:826-921) and quadrant factoring
    caps residual rotations at 45 deg. A custom :func:`flowgen.config.
    register_mode` whose shapers escape their declared ranges trips this
    (out-of-envelope affines would otherwise resample garbage silently —
    reads stay in-bounds, the band scan just misses source rows).

    ``scenes`` is a batch; ``bgm`` optionally the per-sample background meta
    payload of :func:`render_batch_fused` (its frame-1 affine is checked
    against the background envelope when given). Returns an int32 scalar,
    usable under jit."""
    H, W = cfg.height, cfg.width
    spec = cfg.mode_spec
    wh, ww = min(ps.WIN_H, H), min(ps.WIN_W, W)
    P, PBG, xs, ys, xsb, ysb, tsp, _, _ = ps.resample_params(spec, H, W)
    whs, wws = wh // tsp, ww // tsp
    chunk = float(min(resamp.PASS1_CHUNK, max(P, PBG)))
    xchunk = float(min(128, wws))
    quadrant = ps.quadrant_needed(spec)

    def one(s):
        objs = s.objects
        if quadrant:
            t_eff, _ = _quadrant_factor(objs.motion_inv, float(W), float(H))
        else:
            t_eff = objs.motion_inv
        span, xsn, ysn = _span_requirements(t_eff, whs, wws, chunk, xchunk)
        bad = (span > P) | (xsn > xs) | (ysn > ys)
        # Only frame-1 on-screen objects ever resample.
        _, (lo1, hi1) = render_mod._all_bboxes(s.prims, objs.motion)
        on1 = objs.valid & ~render_mod._offscreen(
            lo1, hi1, render_mod.AA_MARGIN + 1.0, H, W
        )
        return jnp.sum((bad & on1).astype(jnp.int32))

    n = jnp.sum(jax.vmap(one)(scenes))
    if bgm is not None:
        t1 = bgm[:, 6:12].reshape(-1, 2, 3)
        span, xsn, ysn = _span_requirements(t1, wh, ww, chunk, xchunk)
        n = n + jnp.sum(
            ((span > PBG) | (xsn > xsb) | (ysn > ysb)).astype(jnp.int32)
        )
    return n


_BUILTIN_MODES = frozenset(range(1, 14)) | frozenset(range(101, 114))


def _validate_enabled(cfg: DataGenConfig) -> bool:
    if cfg.validate_envelope == "always":
        return True
    if cfg.validate_envelope == "never":
        return False
    return cfg.mode not in _BUILTIN_MODES


def prepare_scene_inputs(scene: Scene, cfg: DataGenConfig, n_textures: int,
                         quadrant: bool = False):
    """Build one sample's megakernel operands (vmap over the batch)."""
    H, W = cfg.height, cfg.width
    wh, ww = min(ps.WIN_H, H), min(ps.WIN_W, W)
    prims, objs = scene.prims, scene.objects
    K, C = prims.valid.shape

    (lo0, hi0), (lo1, hi1) = render_mod._all_bboxes(prims, objs.motion)
    n_prims = jnp.sum(prims.valid, axis=1).astype(jnp.int32)
    has_warp = cfg.mode_spec.warp_p > 0.0
    warp_k = (objs.warp & objs.valid) if has_warp else jnp.zeros_like(objs.valid)
    margin0 = jnp.full((K,), render_mod.AA_MARGIN + 1.0)
    # Frame-1 cover must include the displaced mask support for deforming
    # objects (the inverse field moves coverage by up to WARP_MARGIN px).
    margin1 = margin0 + jnp.where(warp_k, render_mod.WARP_MARGIN, 0.0)
    on0 = objs.valid & ~render_mod._offscreen(
        lo0, hi0, render_mod.AA_MARGIN, H, W
    )
    on1 = objs.valid & ~render_mod._offscreen(lo1, hi1, margin1, H, W)
    process = on0 | on1
    order = jnp.argsort(~process, stable=True).astype(jnp.int32)
    count = jnp.sum(process).astype(jnp.int32)

    # --- tile grids (both frames) ---
    def tiles(lo, hi, on, margin):
        ay, nty = _tile_grid(lo[:, 1], hi[:, 1], on, H, wh, 8, margin)
        ax, ntx = _tile_grid(lo[:, 0], hi[:, 0], on, W, ww, 128, margin)
        t = jnp.arange(ps.MAX_TILES)
        ty = t[None, :] // jnp.maximum(ntx, 1)[:, None]   # [K,T]
        tx = t[None, :] % jnp.maximum(ntx, 1)[:, None]
        oy0 = ay[:, None] + ty * wh
        ox0 = ax[:, None] + tx * ww
        y0 = jnp.clip(oy0, 0, H - wh)
        x0 = jnp.clip(ox0, 0, W - ww)
        tmi = jnp.stack(
            [
                y0, x0,
                oy0, jnp.minimum(oy0 + wh, H),
                ox0, jnp.minimum(ox0 + ww, W),
                jnp.zeros_like(y0), jnp.zeros_like(y0),
            ],
            axis=-1,
        ).astype(jnp.int32)                               # [K,T,8]
        return tmi, nty, ntx

    tmi0, nty0, ntx0 = tiles(lo0, hi0, on0, margin0)
    tmi1, nty1, ntx1 = tiles(lo1, hi1, on1, margin1)
    tmi = jnp.stack([tmi0, tmi1], axis=1)                 # [K,2,T,8]

    # --- per-object meta ---
    add_bits = jnp.sum(
        prims.additive.astype(jnp.int32) << jnp.arange(C)[None, :], axis=1
    )
    poly_bits = jnp.sum(
        prims.is_poly.astype(jnp.int32) << jnp.arange(C)[None, :], axis=1
    )
    tex_id = objs.tex_id % n_textures
    zeros = jnp.zeros_like(tex_id)

    warp_slot = objs.warp_slot.astype(jnp.int32)

    # Frame-1 quadrant factoring (large rotations -> rot90 slabs + residual).
    if quadrant:
        t_samp1, rot90_k = _quadrant_factor(objs.motion_inv, float(W), float(H))
        tex_id1 = tex_id + n_textures * rot90_k.astype(jnp.int32)
        nx1 = jnp.where(rot90_k, float(H), float(W))[:, None]
        ny1 = jnp.where(rot90_k, float(W), float(H))[:, None]
    else:
        t_samp1 = objs.motion_inv
        tex_id1 = tex_id
        nx1 = jnp.full((K, 1), float(W))
        ny1 = jnp.full((K, 1), float(H))

    def omi_frame(on, nty, ntx, tex):
        cols = [
            on.astype(jnp.int32), nty, ntx, tex,
            n_prims, add_bits, poly_bits, warp_k.astype(jnp.int32),
        ]
        cols += [prims.n_edges[:, c].astype(jnp.int32) for c in range(C)]
        cols += [zeros] * (ps.OMI_SIZE - 1 - len(cols))
        cols += [warp_slot]
        return jnp.stack(cols, axis=-1)                   # [K,OMI_SIZE]

    omi = jnp.stack(
        [omi_frame(on0, nty0, ntx0, tex_id),
         omi_frame(on1, nty1, ntx1, tex_id1)], axis=1
    ).astype(jnp.int32)                                   # [K,2,OMI_SIZE]

    # --- per-object float meta + edges ---
    intr = prims.intrinsic                                # [K,C,2,3]
    tr0 = jnp.broadcast_to(intr, intr.shape)
    tr1 = affine.compose(intr, objs.motion[:, None])

    def omf_frame(motion, tr, raw):
        mot = motion.reshape(K, 6)
        pad = jnp.zeros((K, ps.OMF_ELL - 6))
        ell = _ell_params(tr, prims)
        tail = jnp.zeros(
            (K, ps.OMF_RAW - ps.OMF_ELL - ell.shape[1])
        )
        yext = _ell_yext(tr, prims)
        epad = jnp.zeros((K, ps.OMF_SIZE - ps.OMF_EXT - yext.shape[1]))
        return jnp.concatenate([mot, pad, ell, tail, raw, yext, epad],
                               axis=-1)

    # Frame-1 RAW residual texture affine + reflect periods (OMF_RAW slots):
    # folded in-kernel per sub-window when the mode's envelope needs texture
    # sub-tiling (ps.texture_split; modes 11/13).
    raw1 = jnp.concatenate([t_samp1.reshape(K, 6), nx1, ny1], axis=-1)
    omf = jnp.stack(
        [omf_frame(objs.motion, tr0, jnp.zeros_like(raw1)),
         omf_frame(objs.motion_inv, tr1, raw1)], axis=1
    ).astype(jnp.float32)                                 # [K,2,OMF_SIZE]

    edges = jnp.stack([_edge_table(tr0, prims), _edge_table(tr1, prims)],
                      axis=1).astype(jnp.float32)         # [K,2,4,EP]

    # --- frame-1 resample coefficients per tile, reflect fold composed ---
    ctrx = tmi1[..., ps.TMI_X0].astype(jnp.float32) + ww / 2.0   # [K,T]
    ctry = tmi1[..., ps.TMI_Y0].astype(jnp.float32) + wh / 2.0
    coef1 = _fold_coeffs(
        t_samp1, ctrx, ctry, nx1, ny1, float(ps.SLAB_MARGIN)
    )                                                     # [K,T,6]
    tmf1 = jnp.pad(coef1, ((0, 0), (0, 0), (0, ps.TMF_SIZE - 6)))
    tmf = jnp.stack([jnp.zeros_like(tmf1), tmf1], axis=1) # [K,2,T,8]

    return count, order, omi, omf, tmi, tmf.astype(jnp.float32), edges


def _bg_meta_payload(scene: Scene, cfg: DataGenConfig, src_h, src_w):
    """Per-sample background metadata vector (ps.BGM_SIZE f32): the RAW
    output->source affines of both frames (frame 0: crop_t o T(+center);
    frame 1: crop_t o bg_big_inv o T(+center) — the affines of
    render.background_pass), the source reflect periods, the bg pixel motion
    (conjugated about the frame center), and the forward-field sampling
    affine u = (pixmot(p) + center + 0.5)/2 - 0.5 (the x2-upscaled field of
    cpp:1194-1202 read from the native crop). Reflect folds are chosen
    IN-KERNEL per tile (ps.scalar_fold_coeffs). ``src_h``/``src_w`` may be
    traced per-sample native dims (TextureDB path)."""
    from ..ops import texture as tex_mod

    H, W = cfg.height, cfg.width
    bg = scene.background
    crop_t = tex_mod.randomized_crop_transform_native(
        src_h, src_w, 2 * H, 2 * W,
        bg.tex_rot_deg, bg.tex_zoom, bg.tex_shift[0], bg.tex_shift[1],
    )
    center = affine.translation(W / 2.0, H / 2.0)
    t0 = affine.chain(center, crop_t)
    bg_big_inv = affine.invert(
        affine.conjugate_about(bg.motion, float(W), float(H))
    )
    t1 = affine.chain(center, bg_big_inv, crop_t)
    pixmot = affine.conjugate_about(bg.motion, W / 2.0, H / 2.0)
    flin = pixmot[:, :2] * 0.5
    ftr = (
        pixmot[:, 2] + jnp.array([W / 2.0, H / 2.0]) + 0.5
    ) * 0.5 - 0.5
    faff = jnp.concatenate([flin, ftr[:, None]], axis=1)
    # Inverse pixel motion (BGM_IPIX): the kernel initializes the inverse
    # flow planes from it (render.background_flow's affine.invert term).
    ipix = affine.invert(pixmot)
    zeros2 = jnp.zeros((2,), jnp.float32)
    return jnp.concatenate(
        [
            t0.reshape(6), t1.reshape(6),
            jnp.stack([jnp.asarray(src_w, jnp.float32),
                       jnp.asarray(src_h, jnp.float32)]),
            zeros2,
            pixmot.reshape(6), zeros2,
            faff.reshape(6), zeros2,
            ipix.reshape(6), zeros2,
        ]
    )


def render_batch_fused(scenes: Scene, slabs, bgslabs, src_hw,
                       cfg: DataGenConfig, interpret: bool = False,
                       quad_atlas=None, warp_bank=None, warp_aux=None,
                       tex_sizes=None):
    """Fused render of a batch: frames entirely in the scene megakernel
    (background + objects, including mode-9 deformation of both); the affine
    flow init and the warp-field flow terms are computed in-kernel too.
    ``src_hw``: the texture sources' (height, width) — the bg slabs'
    unpadded dims. For nonrigid modes pass ``warp_aux`` from
    warpfields.generator.make_warp_aux (an (obj_aux, bg_aux) pair).
    ``quad_atlas``/``warp_bank`` are accepted for callers that share them
    with the windowed path but are not used here. Output signature matches
    render.render_batch."""
    del quad_atlas, warp_bank
    H, W = cfg.height, cfg.width
    spec = cfg.mode_spec
    has_warp = spec.warp_p > 0.0

    quadrant = ps.quadrant_needed(spec)
    n_tex = slabs.shape[0] // 2 if quadrant else slabs.shape[0]
    count, order, omi, omf, tmi, tmf, edges = jax.vmap(
        lambda s: prepare_scene_inputs(s, cfg, n_tex, quadrant=quadrant)
    )(scenes)
    bg_tex = scenes.background.tex_id % bgslabs.shape[0]
    bg = scenes.background
    bg_meta = jnp.stack(
        [
            bg_tex.astype(jnp.int32),
            bg.warp.astype(jnp.int32),
            bg.warp_slot.astype(jnp.int32),
        ],
        axis=1,
    )
    if tex_sizes is not None:
        sz = jnp.asarray(tex_sizes)[bg_tex]           # [B, 2] native (h, w)
        bgm = jax.vmap(
            lambda s, hw: _bg_meta_payload(s, cfg, hw[0], hw[1])
        )(scenes, sz)
    else:
        bgm = jax.vmap(
            lambda s: _bg_meta_payload(s, cfg, src_hw[0], src_hw[1])
        )(scenes)

    if _validate_enabled(cfg):
        viol = envelope_violations(scenes, cfg, bgm=bgm)
        jax.lax.cond(
            viol > 0,
            lambda v: jax.debug.print(
                "flowgen WARNING: {v} scene element(s) exceed mode "
                f"{cfg.mode}'s declared motion envelope; their fused "
                "resampling is unreliable (fix the ModeSpec ranges "
                "passed to register_mode)", v=v),
            lambda v: None,
            viol,
        )

    obj_aux = bg_aux = None
    if has_warp:
        obj_aux, bg_aux = warp_aux

    P, PBG, xs, ys, xsb, ysb, tsp, cwo, cwb = ps.resample_params(spec, H, W)
    frames, flow, ids = ps.scene_render_pallas(
        count, order, bg_meta, omi, omf, tmi, tmf, bgm, edges,
        slabs, bgslabs, obj_aux, bg_aux,
        spec_key=(P, PBG, xs, ys, xsb, ysb, tsp, cwo, cwb, H, W),
        use_aa=cfg.use_antialiasing,
        inverse_flow=cfg.compute_inverse_flow,
        emit_masks=cfg.emit_masks,
        interpret=interpret,
    )

    def unpack(v):
        return jnp.stack(
            [
                ((v >> 16) & 0xFF).astype(jnp.float32),
                ((v >> 8) & 0xFF).astype(jnp.float32),
                (v & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        )

    image0 = unpack(frames[:, 0])
    image1 = unpack(frames[:, 1])
    flow0 = jnp.moveaxis(flow[:, 0:2], 1, -1)
    out = [image0, image1, flow0]
    if cfg.compute_inverse_flow:
        out.append(jnp.moveaxis(flow[:, 2:4], 1, -1))
    if cfg.emit_masks:
        out += list(masks_from_ids(ids, flow[:, 0], flow[:, 1]))
    return tuple(out)


def masks_from_ids(ids, fx, fy):
    """Occlusion + motion-boundary masks from the painter's index images.

    ``occlusion``: frame-0 pixel p is occluded iff its flow target p + f(p)
    leaves the frame or lands on a pixel owned by a DIFFERENT object in the
    frame-1 index image (the generative-model definition; nearest-neighbor
    id lookup). ``motion_boundary``: 4-neighborhood discontinuities of the
    frame-0 index image. Returns two (B, H, W) bool arrays."""
    B, _, H, W = ids.shape
    ids0 = ids[:, 0]
    ids1 = ids[:, 1]
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    tx = jnp.round(xx[None] + fx).astype(jnp.int32)
    ty = jnp.round(yy[None] + fy).astype(jnp.int32)
    oob = (tx < 0) | (tx >= W) | (ty < 0) | (ty >= H)
    base = (jnp.arange(B) * H * W)[:, None, None]
    flat_idx = base + jnp.clip(ty, 0, H - 1) * W + jnp.clip(tx, 0, W - 1)
    target = jnp.take(ids1.reshape(-1), flat_idx)
    occlusion = oob | (target != ids0)

    p = jnp.pad(ids0, ((0, 0), (1, 1), (1, 1)), mode="edge")
    boundary = (
        (ids0 != p[:, :-2, 1:-1])
        | (ids0 != p[:, 2:, 1:-1])
        | (ids0 != p[:, 1:-1, :-2])
        | (ids0 != p[:, 1:-1, 2:])
    )
    return occlusion, boundary
