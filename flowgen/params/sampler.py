"""Scene sampling: blueprint generation for all 13 modes.

TPU-native equivalent of ``ObjectParametersGenerator::generateBackground`` /
``generateForegroundObject`` / ``generateNumberOfFgObjects``
(src/caffe/DataGenerator.cpp:2105-2835). The reference walks 46 stateful RNG
streams sequentially per object; here every quantity is a pure function of
``(seed, sample_index, stream, object, component)`` (see flowgen/random/streams.py)
and all object/component slots are sampled densely and merged with selects, so
one ``vmap`` produces a whole batch of scenes in a single fused dispatch.

Distributional parity notes vs the reference:
* Stream *assignment* differs (counter-based keys vs shared sequential Mersenne
  streams), so identical seeds do not reproduce reference scenes bit-for-bit;
  the per-quantity distributions are identical.
* Composite components re-roll their type until non-composite
  (cpp:2326-2332, 2441-2444) — here component types draw uniformly from the
  non-composite kinds directly, which is the same distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import (
    EDGE_SUBDIV,
    ELLIPSE_STEPS,
    KIND_COMPOSITE,
    KIND_ELLIPSE,
    KIND_POLYGON,
    MAX_COMPONENTS,
    MAX_EDGES,
    MAX_OBJECTS,
    MAX_SPOKES,
    DataGenConfig,
    ModeSpec,
)
from ..ops import affine
from ..random import shapers
from ..random.streams import ScopeDraws, Stream, sample_bits_table, sample_key
from .blueprint import Background, Objects, Primitives, Scene

# Polygon segment type codes (PolySegmentType_t, DataGenerator.h:377-381).
SEG_DUMMY = 0
SEG_LINE = 1
SEG_CURVE = 2


def _triggered(d: ScopeDraws, s_trig, s_val, p, a, b, default, shaper):
    """trigger ? shaper(a,b) : default  — the pervasive reference idiom
    (e.g. cpp:2122-2123, 2155-2156)."""
    hit = shapers.trigger(p, d.uniform(s_trig, 0.0, 1.0))
    val = shaper(a, b, d.normal(s_val))
    return jnp.where(hit, val, default)


# ---------------------------------------------------------------------------
# Polygon geometry
# ---------------------------------------------------------------------------


def _sample_spoke_polygon(d: ScopeDraws, spec: ModeSpec):
    """Star polygon: spokes at perturbed angles with random radii
    (cpp:2206-2229 and the shared variant with curves, cpp:2287-2316).

    Returns (verts[S,2], types[S], n_spokes). ``d`` is the scope's draw view
    (object or component region of the sample's bits table).
    """
    S = MAX_SPOKES
    n = d.uniform_int(Stream.POLY_SPOKES, *spec.spokes_range)
    i = jnp.arange(S, dtype=jnp.float32)
    dphi = d.uniform(Stream.POLY_DPHI, *spec.dphi_range_deg, (S,))
    phi = (i * 360.0 / n.astype(jnp.float32) + dphi) * (jnp.pi / 180.0)
    r = d.uniform(Stream.POLY_R, *spec.spoke_r_range, (S,))
    xs = d.uniform(Stream.POLY_SCALE_X, *spec.poly_scale_range)
    ys = d.uniform(Stream.POLY_SCALE_Y, *spec.poly_scale_range)
    verts = jnp.stack([xs * r * jnp.cos(phi), ys * r * jnp.sin(phi)], axis=-1)

    if spec.axis_aligned_rect:
        # Mode 1: fixed 4-spoke axis-aligned rectangle (cpp:2163-2183).
        x = r[0] * xs
        y = r[0] * ys
        rect = jnp.array([[1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]])
        rect = rect * jnp.stack([x, y])
        verts = jnp.zeros_like(verts).at[:4].set(rect)
        n = jnp.int32(4)
        types = jnp.full((S,), SEG_LINE, jnp.int32).at[0].set(SEG_DUMMY)
        return verts, types, n

    # Segment types with the reference's skip-next-after-curve walk
    # (cpp:2305-2315): index 0 is the start point (Dummy); a Curve3 at i uses
    # vertex i as control point and consumes i+1 (marked Dummy).
    curve_u = d.uniform(Stream.POLY_CURVE_TRIGGER, 0.0, 1.0, (S,))
    types = [jnp.int32(SEG_DUMMY)]
    prev_dummy = jnp.bool_(False)
    for idx in range(1, S):
        can_curve = spec.allow_curves and spec.curve_p > 0.0
        is_curve = (
            jnp.bool_(can_curve)
            & (jnp.int32(idx) < n - 1)
            & (curve_u[idx] < spec.curve_p)
            & ~prev_dummy
        )
        t = jnp.where(
            prev_dummy, SEG_DUMMY, jnp.where(is_curve, SEG_CURVE, SEG_LINE)
        ).astype(jnp.int32)
        types.append(t)
        prev_dummy = is_curve
    return verts, jnp.stack(types), n


def flatten_outline(verts, types, n):
    """Flatten a (possibly curved) closed spoke outline to ``MAX_EDGES``
    points, compacted.

    Replaces AGG's path_storage + conv_curve adaptive flattening
    (MovingObjectPolygon::renderMasks, cpp:520-534): each half of a quadratic
    Bezier (control = curve spoke, endpoints = neighbor spokes) is sampled at
    ``EDGE_SUBDIV`` points (12 chords per curve vs AGG's adaptive count);
    straight segments contribute a single point (their subdivision is
    geometrically inert, so it is dropped). Points are compacted to the front
    of the array and the true count returned — rasterization backends can then
    skip the padding at run time. Padding slots repeat point 0 (zero-length
    edges are inert for winding and distance).

    Returns (points [MAX_EDGES, 2], n_points int32).
    """
    S = MAX_SPOKES
    e = jnp.arange(S)
    # Wrap-around neighbors via static rolls + boundary selects instead of
    # mod-index gathers: verts[(e+k) % n] costs a 20-row hardware gather per
    # primitive (~490k gather rows per batch across B*K*(1+C) primitives),
    # while jnp.roll is a free layout shuffle. Only rows e < n are ever kept
    # by the compaction below, and for those the select form is exact.
    last = e == n - 1
    ve = verts
    va = jnp.where(last[:, None], verts[0], jnp.roll(verts, -1, axis=0))
    vprev = jnp.where((e == 0)[:, None], verts[n - 1],
                      jnp.roll(verts, 1, axis=0))
    vnext = jnp.where(
        last[:, None], verts[1],
        jnp.where((e == n - 2)[:, None], verts[0],
                  jnp.roll(verts, -2, axis=0)),
    )
    ta = jnp.where(last, types[0], jnp.roll(types, -1, axis=0))
    a_nonzero = ~last  # a = (e+1)%n is 0 exactly when e == n-1

    t = (jnp.arange(EDGE_SUBDIV, dtype=jnp.float32) / EDGE_SUBDIV)[None, :, None]

    def bezier(p0, c, p1, s):
        p0, c, p1 = p0[:, None, :], c[:, None, :], p1[:, None, :]
        return (1 - s) ** 2 * p0 + 2 * s * (1 - s) * c + s**2 * p1

    line_pts = ve[:, None, :] + t * (va - ve)[:, None, :]
    first_half = bezier(ve, va, vnext, t * 0.5)       # arrival vertex is a control pt
    second_half = bezier(vprev, ve, va, 0.5 + t * 0.5)

    case_cfirst = (ta == SEG_CURVE) & a_nonzero
    case_csecond = (ta == SEG_DUMMY) & a_nonzero
    is_curve_slot = case_cfirst | case_csecond
    pts = jnp.where(
        case_cfirst[:, None, None],
        first_half,
        jnp.where(case_csecond[:, None, None], second_half, line_pts),
    )

    # Compaction as an exact FACTORED one-hot contraction. Kept points are
    # contiguous per spoke (curve slots keep all EDGE_SUBDIV subdivisions,
    # line slots keep sub 0 only), so output row j maps to the unique spoke
    # whose [start, cum) interval contains j, at sub-offset j - start. A flat
    # 120x120 permutation matmul is exact too but materializes a
    # (B*K*(1+C), 120, 120) f32 mask (~350 MB of HBM traffic per batch);
    # the (120, S) spoke one-hot is 6x smaller and the sub-offset select is
    # pure VPU. Every output is still a single exact term (one 1.0 per row;
    # Precision.HIGHEST keeps the f32 coordinates un-rounded).
    per_spoke = jnp.where(is_curve_slot, EDGE_SUBDIV, 1) * (e < n)
    cum = jnp.cumsum(per_spoke)
    start = cum - per_spoke
    n_pts = cum[-1].astype(jnp.int32)
    j = jnp.arange(MAX_EDGES)
    oh = (
        (start[None, :] <= j[:, None]) & (j[:, None] < cum[None, :])
    ).astype(jnp.float32)
    g = jnp.matmul(oh, pts.reshape(S, EDGE_SUBDIV * 2),
                   precision=jax.lax.Precision.HIGHEST)
    start_j = jnp.sum(oh * start[None, :].astype(jnp.float32), axis=1)
    curve_j = jnp.sum(oh * is_curve_slot[None, :].astype(jnp.float32), axis=1)
    off = jnp.where(curve_j > 0, j - start_j.astype(jnp.int32), 0)
    sel = (off[:, None] == jnp.arange(EDGE_SUBDIV)[None, :]).astype(
        jnp.float32
    )
    pts = jnp.sum(g.reshape(MAX_EDGES, EDGE_SUBDIV, 2) * sel[..., None],
                  axis=1)
    pts = jnp.where((j < n_pts)[:, None], pts, pts[0])
    return pts, n_pts


# ---------------------------------------------------------------------------
# Per-primitive geometry bundle
# ---------------------------------------------------------------------------


def _sample_geometry(d: ScopeDraws, spec: ModeSpec, kinds):
    """Sample one primitive's geometry: kind, ellipse radii, flattened outline.

    ``kinds`` is the static tuple of kinds to choose among (object kinds for
    top-level objects; non-composite kinds for components)."""
    kind = shapers.choice(jnp.array(kinds, jnp.int32), d.raw_index(Stream.OBJ_TYPE))
    f = spec.ellipse_radius_factor
    rx = d.uniform(Stream.ELLI_SCALE_X, *spec.ellipse_scale_range) * f
    ry = d.uniform(Stream.ELLI_SCALE_Y, *spec.ellipse_scale_range) * f
    verts, types, n = _sample_spoke_polygon(d, spec)
    edge_pts, n_edges = flatten_outline(verts, types, n)
    return kind, rx, ry, edge_pts, n_edges


# ---------------------------------------------------------------------------
# Scene sampling
# ---------------------------------------------------------------------------


def sample_background(d: ScopeDraws, spec: ModeSpec, width, height,
                      n_warp_slots):
    """generateBackground (cpp:2105-2143). ``d``: the sample-level scope of
    the bits table."""
    rot = _triggered(
        d, Stream.BG_ROT_TRIGGER, Stream.BG_ROT,
        spec.bg_rot_p, *spec.bg_rot_range, 0.0, shapers.gaussian_sq,
    )
    scale = _triggered(
        d, Stream.BG_SCALE_TRIGGER, Stream.BG_SCALE,
        spec.bg_scale_p, *spec.bg_scale_range, 1.0, shapers.gaussian_sq,
    )
    pre_tx = shapers.gaussian_4(*spec.bg_trans_range, d.normal(Stream.BG_TRANS_X))
    pre_ty = shapers.gaussian_4(*spec.bg_trans_range, d.normal(Stream.BG_TRANS_Y))
    if spec.horizontal_only:
        pre_ty = jnp.zeros_like(pre_ty)   # rectified stereo: x-shift only
    # Rotate the translation into the post-rotation frame (cpp:2124-2129).
    tx = jnp.cos(-rot) * pre_tx - jnp.sin(-rot) * pre_ty
    ty = jnp.sin(-rot) * pre_tx + jnp.cos(-rot) * pre_ty
    motion = affine.motion_transform(rot, scale, tx, ty)

    tex_id = d.raw_index(Stream.BG_TEX_ID)
    tex_rot = d.uniform(Stream.BG_INIT_ROT, *spec.bg_init_rot_range)
    tex_zoom = d.uniform(Stream.BG_INIT_SCALE, *spec.bg_init_scale_range)
    shift_x = shapers.choice(
        jnp.array([0.0, float(width)]), d.raw_index(Stream.BG_INIT_TRANS_X)
    )
    shift_y = shapers.choice(
        jnp.array([0.0, float(height)]), d.raw_index(Stream.BG_INIT_TRANS_Y)
    )
    warp = shapers.trigger(
        spec.warp_p, d.uniform(Stream.OBJ_DEFORMS_NONRIGIDLY, 0.0, 1.0)
    )
    warp_slot = d.uniform_int(Stream.WARP_ASSIGN, 0, max(n_warp_slots - 1, 0))
    return Background(
        motion=motion,
        tex_id=tex_id,
        tex_rot_deg=tex_rot,
        tex_zoom=tex_zoom,
        tex_shift=jnp.stack([shift_x, shift_y]),
        warp=warp,
        warp_slot=warp_slot,
    )


def sample_scene(
    skey,
    spec: ModeSpec,
    *,
    width: int,
    height: int,
    n_warp_slots: int = 1,
) -> Scene:
    """Sample one complete scene blueprint for ``spec``.

    ``skey`` is the per-sample key from :func:`flowgen.random.streams.sample_key`.
    """
    K, C = MAX_OBJECTS, MAX_COMPONENTS
    w2, h2 = width / 2.0, height / 2.0
    m = spec.obj_init_trans_margin

    # One threefry call yields every random word of the sample: scope 0 is
    # the sample level, scopes 1..K the objects, then K*C component scopes.
    bits = sample_bits_table(skey, 1 + K + K * C)
    bg = sample_background(ScopeDraws(bits[0]), spec, width, height,
                           n_warp_slots)
    obj_rows = bits[1 : 1 + K]
    comp_rows = bits[1 + K :].reshape(K, C, bits.shape[1])

    # generateNumberOfFgObjects: int(Uniform(16,24)) (cpp:2832-2835).
    n_objects = (
        ScopeDraws(bits[0]).uniform(Stream.NUM_FG_OBJECTS, *spec.n_fg_range)
    ).astype(jnp.int32)
    ks = jnp.arange(K)
    valid = ks < n_objects

    non_composite = tuple(k for k in spec.obj_types if k != KIND_COMPOSITE)

    def per_object(k, orow, crows):
        ok = ScopeDraws(orow)

        obj_kind, s_rx, s_ry, s_pts, s_ne = _sample_geometry(ok, spec, spec.obj_types)
        is_comp = obj_kind == KIND_COMPOSITE

        # Intrinsic pose and motion (shared by every primitive of the object).
        init_rot = ok.uniform(Stream.OBJ_INIT_ROT, *spec.obj_init_rot_range)
        init_tx = ok.uniform(Stream.OBJ_INIT_TRANS_X, -w2 - m, 3 * w2 + m)
        init_ty = ok.uniform(Stream.OBJ_INIT_TRANS_Y, -h2 - m, 3 * h2 + m)
        rot = _triggered(
            ok, Stream.OBJ_ROT_TRIGGER, Stream.OBJ_ROT,
            spec.obj_rot_p, *spec.obj_rot_range, 0.0, shapers.gaussian_sq,
        )
        scale = _triggered(
            ok, Stream.OBJ_SCALE_TRIGGER, Stream.OBJ_SCALE,
            spec.obj_scale_p, *spec.obj_scale_range, 1.0, shapers.gaussian_sq,
        )
        tx = shapers.gaussian_cube(*spec.obj_trans_range, ok.normal(Stream.OBJ_TRANS_X))
        ty = shapers.gaussian_cube(*spec.obj_trans_range, ok.normal(Stream.OBJ_TRANS_Y))
        if spec.horizontal_only:
            ty = jnp.zeros_like(ty)       # rectified stereo: x-shift only
        tex_id = ok.raw_index(Stream.OBJ_TEX_ID)
        thin = spec.use_thin & shapers.trigger(
            spec.thin_p, ok.uniform(Stream.OBJ_IS_EXTRA_THIN, 0.0, 1.0)
        )
        warp = shapers.trigger(
            spec.warp_p, ok.uniform(Stream.OBJ_DEFORMS_NONRIGIDLY, 0.0, 1.0)
        )
        warp_slot = ok.uniform_int(Stream.WARP_ASSIGN, 0, max(n_warp_slots - 1, 0))

        motion = affine.motion_transform(rot, scale, tx, ty)

        # --- Component-slot geometry (used when the object is a composite) ---
        def per_component(crow):
            ck = ScopeDraws(crow)
            c_kind, c_rx, c_ry, c_pts, c_ne = _sample_geometry(ck, spec, non_composite)
            c_init_rot = ck.uniform(Stream.OBJ_INIT_ROT, *spec.obj_init_rot_range)
            off_x = ck.uniform(Stream.COMP_OFFSET, *spec.component_offset_range)
            off_y = ck.uniform(Stream.COMP_OFFSET_Y, *spec.component_offset_range)
            c_add = shapers.trigger(
                spec.component_additive_p,
                ck.uniform(Stream.COMP_IS_ADDITIVE, 0.0, 1.0),
            )
            return c_kind, c_rx, c_ry, c_pts, c_ne, c_init_rot, off_x, off_y, c_add

        (c_kind, c_rx, c_ry, c_pts, c_ne, c_init_rot, off_x, off_y, c_add) = jax.vmap(
            per_component
        )(crows)

        n_parts = ok.uniform_int(
            Stream.COMP_NUM_COMPONENTS, *spec.n_components_range
        )
        comp_thin = thin  # composite "outline" variant trigger (cpp:2504, 2668)

        cs = jnp.arange(C)

        # Regular composite (cpp:2384-2428 / 2549-2592): slot 0 = primary
        # full-size additive part sharing the parent pose; slots >0 = shrunk
        # (x0.2) parts with re-rolled rotation and offset translation.
        reg_valid = cs < n_parts
        is_primary = cs == 0
        shrink = jnp.where(is_primary, 1.0, spec.component_shrink)
        reg_rot = jnp.where(is_primary, init_rot, c_init_rot)
        reg_tx = jnp.where(is_primary, init_tx, init_tx + off_x)
        reg_ty = jnp.where(is_primary, init_ty, init_ty + off_y)
        reg_add = jnp.where(is_primary, True, c_add)
        reg_rx = c_rx * shrink
        reg_ry = c_ry * shrink
        reg_pts = c_pts * shrink[:, None, None]

        # Thin composite, "outline" style (cpp:2504-2547 / 2668-2713): two
        # copies of component-0's shape; the inner (subtractive) copy is either
        # shrunk x0.9 or (ellipses, 50%) offset instead.
        ell_offset = (c_kind[0] == KIND_ELLIPSE) & shapers.trigger(
            spec.generic_p, ok.uniform(Stream.GENERIC_TRIGGER, 0.0, 1.0)
        )
        o_dx = ok.uniform(Stream.COMP_INIT_TRANS_X, *spec.comp_init_trans_range)
        o_dy = ok.uniform(Stream.COMP_INIT_TRANS_Y, *spec.comp_init_trans_range)
        inner_scale = jnp.where(ell_offset, 1.0, spec.outline_shrink)
        thin_valid = cs < 2
        is_outer = cs == 0
        thin_kind = jnp.broadcast_to(c_kind[0], (C,))
        thin_rx = jnp.where(is_outer, c_rx[0], c_rx[0] * inner_scale)
        thin_ry = jnp.where(is_outer, c_ry[0], c_ry[0] * inner_scale)
        thin_pts = jnp.where(
            is_outer[:, None, None],
            c_pts[0][None],
            c_pts[0][None] * jnp.where(c_kind[0] == KIND_POLYGON, spec.outline_shrink, 1.0),
        )
        thin_tx = jnp.where(is_outer | ~ell_offset, init_tx, init_tx + o_dx)
        thin_ty = jnp.where(is_outer | ~ell_offset, init_ty, init_ty + o_dy)
        thin_rot = jnp.broadcast_to(init_rot, (C,))
        thin_add = is_outer

        # Simple object (one primitive in slot 0). Thin "needle" objects shrink
        # the local x axis (ellipse rx, polygon x coords) by 0.05
        # (cpp:2462-2464, 2496-2500).
        needle = thin & ~is_comp
        simple_valid = cs == 0
        simple_rx = jnp.where(needle, s_rx * spec.thin_shrink, s_rx)
        simple_pts = s_pts * jnp.where(
            needle, jnp.array([spec.thin_shrink, 1.0]), jnp.array([1.0, 1.0])
        )
        # Thin needle ellipses flatten to AGG's literal 100-gon (agg::ellipse
        # with 100 steps, cpp:1080) and take the exact-area polygon path: the
        # analytic SDF ramp cannot measure the area of a sub-pixel-wide shape
        # (ops/raster.py). Fat ellipses keep the cheap closed form.
        ell_needle = needle & (obj_kind == KIND_ELLIPSE)
        ang = jnp.arange(ELLIPSE_STEPS, dtype=jnp.float32) * (
            2.0 * jnp.pi / ELLIPSE_STEPS
        )
        gon = jnp.stack(
            [jnp.cos(ang) * (s_rx * spec.thin_shrink), jnp.sin(ang) * s_ry], -1
        )
        gon = jnp.concatenate(
            [gon, jnp.broadcast_to(gon[:1], (MAX_EDGES - ELLIPSE_STEPS, 2))], 0
        )
        simple_pts = jnp.where(ell_needle, gon, simple_pts)
        simple_ne = jnp.where(ell_needle, ELLIPSE_STEPS, s_ne)
        simple_poly = (obj_kind == KIND_POLYGON) | ell_needle

        # --- Merge the three layouts ---
        def pick(simple, thin_v, reg_v):
            return jnp.where(
                is_comp, jnp.where(comp_thin, thin_v, reg_v), simple
            )

        prim_valid = pick(simple_valid, thin_valid, reg_valid) & valid[k]
        prim_add = pick(jnp.ones((C,), bool), thin_add, reg_add)
        prim_is_poly = pick(
            jnp.broadcast_to(simple_poly, (C,)),
            thin_kind == KIND_POLYGON,
            c_kind == KIND_POLYGON,
        )
        prim_rx = pick(jnp.broadcast_to(simple_rx, (C,)), thin_rx, reg_rx)
        prim_ry = pick(jnp.broadcast_to(s_ry, (C,)), thin_ry, reg_ry)
        prim_rot = pick(jnp.broadcast_to(init_rot, (C,)), thin_rot, reg_rot)
        prim_tx = pick(jnp.broadcast_to(init_tx, (C,)), thin_tx, reg_tx)
        prim_ty = pick(jnp.broadcast_to(init_ty, (C,)), thin_ty, reg_ty)
        prim_pts = jnp.where(
            is_comp,
            jnp.where(comp_thin, thin_pts, reg_pts),
            jnp.broadcast_to(simple_pts[None], (C,) + simple_pts.shape),
        )
        # Scaling never changes point counts: component slots inherit their
        # own counts; the thin "outline" pair reuses component 0's.
        prim_ne = pick(
            jnp.broadcast_to(simple_ne, (C,)), jnp.broadcast_to(c_ne[0], (C,)), c_ne
        )
        prim_intrinsic = affine.intrinsic_transform(prim_rot, prim_tx, prim_ty)

        return (
            tex_id, motion, warp, warp_slot,
            prim_valid, prim_add, prim_is_poly,
            prim_intrinsic, prim_rx, prim_ry, prim_pts, prim_ne,
        )

    (
        tex_id, motion, warp, warp_slot,
        p_valid, p_add, p_is_poly, p_intr, p_rx, p_ry, p_pts, p_ne,
    ) = jax.vmap(per_object)(ks, obj_rows, comp_rows)

    # Fold the conjugated background motion into every object's motion
    # (addBackgroundMotion, cpp:324-335).
    bg_conj = affine.conjugate_about(bg.motion, w2, h2)
    motion_total = affine.compose(motion, jnp.broadcast_to(bg_conj, motion.shape))

    objects = Objects(
        valid=valid,
        tex_id=tex_id,
        motion=motion_total,
        motion_inv=affine.invert(motion_total),
        warp=warp,
        warp_slot=warp_slot,
    )
    prims = Primitives(
        valid=p_valid,
        additive=p_add,
        is_poly=p_is_poly,
        intrinsic=p_intr,
        ell_rx=p_rx,
        ell_ry=p_ry,
        edge_pts=p_pts,
        n_edges=p_ne,
    )
    return Scene(background=bg, objects=objects, prims=prims, n_objects=n_objects)


def sample_scene_batch(root, sample_indices, cfg: DataGenConfig, n_warp_slots=1):
    """Vmapped scene sampling for a batch of global sample indices."""
    spec = cfg.mode_spec

    def one(idx):
        return sample_scene(
            sample_key(root, idx),
            spec,
            width=cfg.width,
            height=cfg.height,
            n_warp_slots=n_warp_slots,
        )

    return jax.vmap(one)(sample_indices)
