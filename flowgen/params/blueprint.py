"""Scene description pytrees.

Struct-of-arrays equivalent of the reference's heap-allocated blueprint graph
(``ObjectBlueprint`` / ``TaskBucket``, include/caffe/data_generation/
DataGenerator.h:385-437): a scene is a fixed-capacity, dense, maskable record
that XLA can trace once. Dynamic lists become static slots with validity masks:

* up to ``MAX_OBJECTS`` foreground objects (reference samples 16..23),
* up to ``MAX_COMPONENTS`` primitives per object (composite components; simple
  objects occupy primitive slot 0 only),
* polygon outlines pre-flattened to ``MAX_EDGES`` points in object-local
  coordinates (AGG's adaptive ``conv_curve`` flattening becomes a fixed
  6-points-per-spoke subdivision; straight segments subdivide losslessly).

All leaves are per-sample; batching adds a leading axis via ``jax.vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class Background(NamedTuple):
    """Background blueprint (generateBackground, DataGenerator.cpp:2105-2143)."""

    motion: jax.Array        # (2,3) M_bg = R(rot)·S(scale)·T(rotated trans)
    tex_id: jax.Array        # int32
    tex_rot_deg: jax.Array   # sampled in [-pi, pi] but *applied as degrees*
                             # (CImg rotate takes degrees; DataGenerator.cpp:97-103)
    tex_zoom: jax.Array
    tex_shift: jax.Array     # (2,) pixels, each from {0, W} / {0, H}
    warp: jax.Array          # bool: nonrigid deformation (mode 9)
    warp_slot: jax.Array     # int32 index into the warp-crop bank


class Objects(NamedTuple):
    """Per-object state shared by all of an object's primitives. [K] leaves."""

    valid: jax.Array         # bool[K]: slot k holds a real object (k < n_objects)
    tex_id: jax.Array        # int32[K]
    motion: jax.Array        # f32[K,2,3] full motion incl. background conjugation
                             # (setMotion + addBackgroundMotion, cpp:312-335)
    motion_inv: jax.Array    # f32[K,2,3]
    warp: jax.Array          # bool[K] nonrigid deformation flag
    warp_slot: jax.Array     # int32[K] index into the warp-crop bank


class Primitives(NamedTuple):
    """Per-primitive geometry. [K, C] leaves. A simple object is one primitive
    in slot 0; a composite's components occupy slots 0..n_parts-1 in blit-algebra
    order (MovingObjectComposite::renderMasks, cpp:591-646)."""

    valid: jax.Array         # bool[K,C]
    additive: jax.Array      # bool[K,C]: True=union, False=subtract
    is_poly: jax.Array       # bool[K,C]: polygon vs ellipse
    intrinsic: jax.Array     # f32[K,C,2,3] per-primitive intrinsic pose R·T
    ell_rx: jax.Array        # f32[K,C]
    ell_ry: jax.Array        # f32[K,C]
    edge_pts: jax.Array      # f32[K,C,E,2] flattened closed outline, local
                             # coords, compacted (slots >= n_edges repeat pt 0)
    n_edges: jax.Array       # int32[K,C] true outline point count


class Scene(NamedTuple):
    """One sample's complete generation recipe (TaskBucket equivalent,
    DataGenerator.h:423-437, minus the result buffers which are the renderer's
    outputs)."""

    background: Background
    objects: Objects
    prims: Primitives
    n_objects: jax.Array     # int32
