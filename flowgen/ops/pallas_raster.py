"""Pallas TPU kernels for exact-area coverage rasterization.

Drop-in accelerated backends for :mod:`flowgen.ops.raster`: the per-edge
exact-area accumulation (Green's theorem with the edge clipped to each pixel
cell — see ``raster.edge_cell_area``) fuses into one Mosaic kernel whose edge
loop runs only over the primitive's *actual* outline points (dynamic trip
count culling the static padding) — something the dense XLA path cannot do.
Typical polygons use 20-60 of the 120 padded edge slots, so the kernel saves
both the padding work and all intermediate HBM traffic of the unfused path.

Numerics match ``raster.polygon_coverage`` up to f32 rounding (the jnp path
broadcasts per-edge coefficient arrays; the kernel evaluates explicit FMAs),
and both match AGG's scanline-accumulated exact cell areas
(MovingObjectBase::draw, src/caffe/DataGenerator.cpp:351-368): ``aa`` is the
covered area fraction, ``inside`` is area >= 0.5 (gamma_threshold(0.5)).

The pixel block (the object evaluation window, e.g. 192x256 or the full frame)
lives in VMEM for the duration; edge endpoints are scalars in SMEM, read per
edge iteration. Accumulators are VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster as raster_mod


def _area_accumulate(edges_ref, base, n_edges, px, py, area_ref):
    """Accumulate exact signed cell-area contributions of edge slots
    [base, base + n_edges) into ``area_ref`` (see raster.edge_cell_area for
    the math; px/py are pixel-center grids, cells are unit squares)."""
    xlo = px - 0.5
    ylo = py - 0.5

    def edge(e, _):
        ax = edges_ref[0, base + e]
        ay = edges_ref[1, base + e]
        bx = edges_ref[2, base + e]
        by = edges_ref[3, base + e]
        dx = bx - ax
        dy = by - ay
        inv_dy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, 0.0)
        inv_dx = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, 0.0)

        # Edge-parameter interval inside the cell's row slab (ascending).
        r0 = (ylo - ay) * inv_dy
        r1 = (ylo + 1.0 - ay) * inv_dy
        ta = jnp.clip(jnp.minimum(r0, r1), 0.0, 1.0)
        tb = jnp.clip(jnp.maximum(r0, r1), 0.0, 1.0)
        # Breakpoints where x(t) crosses the cell's x-faces.
        s0 = (xlo - ax) * inv_dx
        s1 = (xlo + 1.0 - ax) * inv_dx
        p = jnp.clip(jnp.minimum(s0, s1), ta, tb)
        q = jnp.clip(jnp.maximum(s0, s1), ta, tb)
        # g(t) = clamp(x(t) - xlo, 0, 1): constant outside [p, q], linear in.
        ga = jnp.clip(ax + ta * dx - xlo, 0.0, 1.0)
        gb = jnp.clip(ax + tb * dx - xlo, 0.0, 1.0)
        # Middle piece via the unclamped midpoint ordinate (exact between
        # the face crossings; vanishes with q == p in every degenerate
        # |dx| ~ 0 case) — raster.edge_cell_area's form.
        mid = (ax - xlo) + (p + q) * (0.5 * dx)
        integral = ga * (p - ta) + mid * (q - p) + gb * (tb - q)
        area_ref[:] = area_ref[:] + dy * integral
        return 0

    # Dynamic trip count: culls padding AND avoids Mosaic unrolling a
    # static-bound loop into register-spill blowups.
    lax.fori_loop(0, n_edges, edge, 0)


def _area_accumulate_blocked(edges_ref, base, n_edges, oy, ox, area_ref,
                             gh: int, gw: int):
    """Row-block-culled twin of :func:`_area_accumulate` for regular pixel
    grids: cell centers at ``(ox + j + 0.5, oy + i + 0.5)`` over an
    ``(gh, gw)`` window (``gh`` a multiple of 8).

    The per-cell exact-area formula is identically zero for every cell row
    whose unit slab ``[oy+i, oy+i+1]`` lies outside the edge's y-extent
    (``ta == tb`` collapses the integral), so each edge only visits the 8-row
    blocks its y-span touches — typically 2-5 of the window's ``gh/8``. This
    is a pure evaluation-order change: the accumulated values are bit-exact
    vs the dense loop (skipped contributions are exactly 0.0)."""
    nb = gh // 8
    oyf = oy.astype(jnp.float32)
    oxf = ox.astype(jnp.float32)
    xlo = (
        lax.broadcasted_iota(jnp.int32, (8, gw), 1).astype(jnp.float32) + oxf
    )

    def edge(e, _):
        ax = edges_ref[0, base + e]
        ay = edges_ref[1, base + e]
        bx = edges_ref[2, base + e]
        by = edges_ref[3, base + e]
        dx = bx - ax
        dy = by - ay
        inv_dy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, 0.0)
        inv_dx = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, 0.0)

        # Window rows whose slab [oy+i, oy+i+1] meets [min(ay,by), max(ay,by)]:
        # i in [floor(min - oy) - 1, floor(max - oy)] (conservative by one).
        ylo_e = jnp.minimum(ay, by) - oyf
        yhi_e = jnp.maximum(ay, by) - oyf
        rlo = jnp.floor(ylo_e).astype(jnp.int32) - 1
        rhi = jnp.floor(yhi_e).astype(jnp.int32)
        rb0 = jnp.clip(rlo, 0, gh) >> 3
        rb1 = (jnp.clip(rhi, -1, gh - 1) >> 3) + 1

        # Edges entirely LEFT of the window contribute exactly 0 (every
        # clip(x - xlo, 0, 1) term is 0 there — unlike right-side edges,
        # whose full-column contribution dy*(tb-ta) is load-bearing), so the
        # block loop is branch-skipped for them: bit-exact, and multi-tile
        # objects stop re-integrating their off-tile edges.
        x_live = jnp.maximum(ax, bx) >= oxf

        @pl.when(x_live)
        def _():
            # Column-only quantities, hoisted out of the row-block loop (the
            # x-face crossing parameters depend on the column alone): saves 6
            # wide VPU ops per block iteration beyond the first,
            # bit-identical. Inside the x_live branch so culled edges skip
            # them too.
            s0 = (xlo - ax) * inv_dx
            s1 = (xlo + 1.0 - ax) * inv_dx
            smin = jnp.minimum(s0, s1)
            smax = jnp.maximum(s0, s1)
            hmid = ax - xlo
            hdx = 0.5 * dx

            def blk(rb, _):
                r8 = pl.multiple_of(rb * 8, 8)
                # Row-only quantities on (8, 1): ta/tb (the slab-clipped edge
                # parameter range) and the chord x at them depend only on the
                # row, so computing them narrow and broadcasting saves ~1/4 of
                # the wide VPU ops — values are bit-identical (same inputs per
                # row, broadcast only replicates).
                ylo = (
                    lax.broadcasted_iota(jnp.int32, (8, 1), 0) + r8
                ).astype(jnp.float32) + oyf
                r0 = (ylo - ay) * inv_dy
                r1 = (ylo + 1.0 - ay) * inv_dy
                ta = jnp.clip(jnp.minimum(r0, r1), 0.0, 1.0)
                tb = jnp.clip(jnp.maximum(r0, r1), 0.0, 1.0)
                xta = ax + ta * dx
                xtb = ax + tb * dx
                p = jnp.clip(smin, ta, tb)
                q = jnp.clip(smax, ta, tb)
                ga = jnp.clip(xta - xlo, 0.0, 1.0)
                gb = jnp.clip(xtb - xlo, 0.0, 1.0)
                # Middle piece via the unclamped midpoint ordinate (exact
                # between the face crossings; vanishes with q == p in every
                # degenerate |dx| ~ 0 case): two fewer clamped chord
                # evaluations per block — ~25% of the in-block wide VPU ops.
                mid = hmid + (p + q) * hdx
                integral = ga * (p - ta) + mid * (q - p) + gb * (tb - q)
                area_ref[pl.ds(r8, 8), :] = (
                    area_ref[pl.ds(r8, 8), :] + dy * integral
                )
                return 0

            lax.fori_loop(rb0, jnp.minimum(rb1, nb), blk, 0)

        return 0

    lax.fori_loop(0, n_edges, edge, 0)


def _kernel(edges_ref, n_ref, px_ref, py_ref, aa_ref, in_ref, area_ref):
    px = px_ref[:]
    py = py_ref[:]
    area_ref[:] = jnp.zeros_like(area_ref)
    _area_accumulate(edges_ref, 0, n_ref[0], px, py, area_ref)
    area = jnp.abs(area_ref[:])
    aa_ref[:] = jnp.minimum(area, 1.0)
    in_ref[:] = (area >= 0.5).astype(jnp.float32)


def _make_object_window_kernel(wh, ww, use_aa, emit_flow, max_comps, max_edges):
    """Kernel factory: full per-object window pass for one frame.

    Loops the object's primitives (exact-area polygon scan or analytic
    ellipse), accumulates the composite screen algebra, then alpha-blends the
    texture window and (optionally) overwrites flow where the binary mask
    fully covers — i.e. everything the renderer's f0/f1 branches did with ~10
    XLA ops, fused into one Mosaic kernel."""

    def kernel(
        meta_ref,      # SMEM i32: [n_prims, x0, y0, additive*C, is_poly*C, n_edges*C]
        fmeta_ref,     # SMEM f32: [motion(6), ell params C*8: inv(6), rx, ry]
        edges_ref,     # SMEM f32 (4, C*E): per-prim screen-space edge endpoints
        tex_ref,       # VMEM (3, wh, ww) — channels-first: a minor dim of 3
                       # would be lane-padded 3->128 (42x VMEM inflation)
        frame_ref,     # VMEM (3, wh, ww)
        flow_ref,      # VMEM (2, wh, ww) (ignored when not emit_flow)
        frame_out,
        flow_out,
        acc_aa, acc_in, aa_t, in_t, area_ref,
    ):
        n_prims = meta_ref[0]
        x0 = meta_ref[1]
        y0 = meta_ref[2]
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1).astype(jnp.float32)
            + x0.astype(jnp.float32)
        )
        py = (
            jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0).astype(jnp.float32)
            + y0.astype(jnp.float32)
        )
        cx = px + 0.5  # coverage at pixel centers
        cy = py + 0.5

        acc_aa[:] = jnp.zeros_like(acc_aa)
        acc_in[:] = jnp.zeros_like(acc_in)

        def comp(c, _):
            # Dynamic trip count (no pl.when guard): static-bound loops get
            # unrolled by Mosaic into register-spill blowups.
            if True:
                is_poly = meta_ref[3 + max_comps + c] != 0

                area_ref[:] = jnp.zeros_like(area_ref)

                @pl.when(is_poly)
                def _():
                    _area_accumulate(
                        edges_ref, c * max_edges, meta_ref[3 + 2 * max_comps + c],
                        cx, cy, area_ref,
                    )

                @pl.when(is_poly)
                def _():
                    area = jnp.abs(area_ref[:])
                    aa_t[:] = jnp.minimum(area, 1.0)
                    in_t[:] = (area >= 0.5).astype(jnp.int32)

                @pl.when(jnp.logical_not(is_poly))
                def _():
                    base = 6 + c * 8
                    i00 = fmeta_ref[base + 0]
                    i01 = fmeta_ref[base + 1]
                    i02 = fmeta_ref[base + 2]
                    i10 = fmeta_ref[base + 3]
                    i11 = fmeta_ref[base + 4]
                    i12 = fmeta_ref[base + 5]
                    rx_e = fmeta_ref[base + 6]
                    ry_e = fmeta_ref[base + 7]
                    ux = (i00 * cx + i01 * cy + i02) / rx_e
                    uy = (i10 * cx + i11 * cy + i12) / ry_e
                    # Reference 100-gon, chord-exact per pixel
                    # (ops/raster.ellipse_chord_coverage).
                    aa_e, in_e = raster_mod.ellipse_chord_coverage(
                        ux, uy, i00 / rx_e, i01 / rx_e, i10 / ry_e,
                        i11 / ry_e,
                    )
                    aa_t[:] = aa_e
                    in_t[:] = in_e.astype(jnp.int32)

                # Ordered composite screen algebra (cpp:591-646). Keep the
                # binary accumulator in i32 — Mosaic cannot select i1 vectors.
                additive = meta_ref[3 + c] != 0
                aa = aa_t[:]
                ins = in_t[:]  # 0/1 int32
                a_aa = 1.0 - (1.0 - acc_aa[:]) * (1.0 - aa)
                a_in = jnp.maximum(acc_in[:], ins)
                s_aa = acc_aa[:] * (1.0 - aa)
                s_in = acc_in[:] * (1 - ins)
                acc_aa[:] = jnp.where(additive, a_aa, s_aa)
                acc_in[:] = jnp.where(additive, a_in, s_in)

            return 0

        lax.fori_loop(0, n_prims, comp, 0)

        inside = acc_in[:] != 0
        m = (acc_aa[:] if use_aa else inside.astype(jnp.float32))[None]
        frame_out[:] = jnp.round(
            frame_ref[:] * (1.0 - m) + tex_ref[:] * m
        )

        if emit_flow:
            # Flow at integer coords (computeFlowImage, cpp:807-817): affine
            # displacement of the object's motion where fully covered.
            m00 = fmeta_ref[0]
            m01 = fmeta_ref[1]
            m02 = fmeta_ref[2]
            m10 = fmeta_ref[3]
            m11 = fmeta_ref[4]
            m12 = fmeta_ref[5]
            ofx = m00 * px + m01 * py + m02 - px
            ofy = m10 * px + m11 * py + m12 - py
            # Mosaic can't select i1 vectors; use a {0,1} float mask (exact
            # for these values).
            mi = inside.astype(jnp.float32)[None]
            flow_out[:] = jnp.stack([ofx, ofy], 0) * mi + flow_ref[:] * (1.0 - mi)
        else:
            flow_out[:] = flow_ref[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("use_aa", "emit_flow", "interpret")
)
def object_window_pallas(
    edges, meta, fmeta, tex_w, frame_w, flow_w,
    *, use_aa=True, emit_flow=True, interpret=False,
):
    """Fused per-object window pass. Shapes:
      edges (4, C*E) f32 screen-space endpoints per primitive slot;
      meta (3 + 3C,) i32: [n_prims, x0, y0, additive[C], is_poly[C], n_edges[C]];
      fmeta (6 + 8C,) f32: [motion 2x3 row-major, per-prim (ellipse inverse
        transform 2x3 row-major, rx, ry)];
      tex_w/frame_w (wh, ww, 3), flow_w (wh, ww, 2).
    Returns (blended frame_w, updated flow_w)."""
    wh, ww = frame_w.shape[0], frame_w.shape[1]
    C = (meta.shape[0] - 3) // 3
    E = edges.shape[1] // C
    kernel = _make_object_window_kernel(wh, ww, use_aa, emit_flow, C, E)
    # Channels-first inside the kernel (minor dims of 2/3 would be lane-padded
    # to 128 in VMEM).
    tex_w = jnp.moveaxis(tex_w, -1, 0)
    frame_w = jnp.moveaxis(frame_w, -1, 0)
    flow_w = jnp.moveaxis(flow_w, -1, 0)
    shape3 = jax.ShapeDtypeStruct((3, wh, ww), jnp.float32)
    shape2 = jax.ShapeDtypeStruct((2, wh, ww), jnp.float32)
    scr = (wh, ww)
    out = pl.pallas_call(
        kernel,
        out_shape=(shape3, shape2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(scr, jnp.float32),
            pltpu.VMEM(scr, jnp.int32),
            pltpu.VMEM(scr, jnp.float32),
            pltpu.VMEM(scr, jnp.int32),
            pltpu.VMEM(scr, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The nested primitive/edge loops carry several window-sized
            # temporaries; leave Mosaic generous stack headroom.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, fmeta, edges, tex_w, frame_w, flow_w)
    return _channels_last(out)


def _channels_last(pair):
    f, fl = pair
    return jnp.moveaxis(f, 0, -1), jnp.moveaxis(fl, 0, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def polygon_coverage_pallas(edge_pts, n_edges, px, py, interpret=False):
    """Coverage of a closed (compacted) polyline against a pixel grid.

    ``edge_pts``: (E, 2) points, the first ``n_edges`` real, the rest padding;
    ``px``/``py``: (H, W) f32 sample positions. Returns (aa, inside) matching
    raster.polygon_coverage.
    """
    e = edge_pts.shape[0]
    a = edge_pts
    b = jnp.roll(edge_pts, -1, axis=0)
    # Close the real outline: the edge leaving the last real point must return
    # to point 0 (padding already repeats point 0, so b at n-1 is point 0 only
    # if padding exists; force it for the full case too).
    bx = jnp.where(jnp.arange(e) == n_edges - 1, edge_pts[0, 0], b[:, 0])
    by = jnp.where(jnp.arange(e) == n_edges - 1, edge_pts[0, 1], b[:, 1])
    edges = jnp.stack([a[:, 0], a[:, 1], bx, by]).astype(jnp.float32)

    shape = px.shape
    aa, inside = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(shape, jnp.float32),
        ],
        interpret=interpret,
    )(edges, jnp.asarray(n_edges, jnp.int32).reshape(1), px, py)
    return aa, inside > 0.5
