"""Counter-based random streams.

TPU-native replacement for the reference's per-distribution Mersenne Twister
objects (include/caffe/data_generation/SimpleRandom.h:15-145): each of the ~46
named sampler streams in ``ObjectParametersGenerator`` (DataGenerator.h:524-587)
owned an independent ``std::mt19937`` seeded with a deterministic incrementing
seed (DataGenerator.cpp:1360-1365).

Here every draw is a pure function of ``(root_seed, stream_id, sample_index,
object_index, component_index)`` via threefry key folding. This makes the whole
generator stateless: any sample can be re-materialized from its global index,
which gives exact checkpoint/resume and device-count-invariant sharding for free
(impossible in the reference, where stream consumption interleaved with thread
scheduling — see SURVEY.md §5).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class Stream(enum.IntEnum):
    """Named stream ids, mirroring the RNG_* members of ObjectParametersGenerator
    (DataGenerator.h:524-587). Values are arbitrary but stable: changing them
    changes every generated scene for a given seed."""

    # Background
    BG_TEX_ID = 0
    BG_INIT_ROT = 1
    BG_INIT_TRANS_X = 2
    BG_INIT_TRANS_Y = 3
    BG_ROT_TRIGGER = 4
    BG_ROT = 5
    BG_TRANS_X = 6
    BG_TRANS_Y = 7
    BG_SCALE_TRIGGER = 8
    BG_INIT_SCALE = 9
    BG_SCALE = 10
    # Foreground objects
    NUM_FG_OBJECTS = 11
    OBJ_TYPE = 12
    OBJ_TEX_ID = 13
    OBJ_INIT_TRANS_X = 14
    OBJ_INIT_TRANS_Y = 15
    OBJ_TRANS_X = 16
    OBJ_TRANS_Y = 17
    OBJ_INIT_ROT = 18
    OBJ_ROT_TRIGGER = 19
    OBJ_ROT = 20
    OBJ_INIT_SCALE = 21
    OBJ_SCALE_TRIGGER = 22
    OBJ_SCALE = 23
    OBJ_TEX_SHIFT_X = 24
    OBJ_TEX_SHIFT_Y = 25
    OBJ_TEX_ROT = 26
    OBJ_TEX_ZOOM = 27
    # Ellipse specifics
    ELLI_SCALE_X = 28
    ELLI_SCALE_Y = 29
    # Polygon specifics
    POLY_SPOKES = 30
    POLY_DPHI = 31
    POLY_R = 32
    POLY_SCALE_X = 33
    POLY_SCALE_Y = 34
    POLY_CURVE_TRIGGER = 35
    # Composite components
    COMP_INIT_TRANS_X = 36
    COMP_INIT_TRANS_Y = 37
    COMP_NUM_COMPONENTS = 38
    COMP_IS_ADDITIVE = 39
    COMP_OFFSET = 40
    COMP_OFFSET_Y = 47
    # Thin objects / deformations / generic
    OBJ_IS_EXTRA_THIN = 41
    OBJ_DEFORMS_NONRIGIDLY = 42
    GENERIC_UNIFORM = 43
    GENERIC_TRIGGER = 44
    # Warp-field synthesis (no reference analog: the reference CropGenerator
    # seeds from std::random_device, WarpFields.cpp:549-550; ours is keyed).
    WARP_FIELD = 45
    WARP_ASSIGN = 46


def root_key(seed) -> jax.Array:
    return jax.random.key(seed)


# ---------------------------------------------------------------------------
# Bulk counter-based draws (the hot-path API)
#
# Chained ``fold_in`` per (stream, object, component) costs hundreds of
# small threefry dispatches per traced scene (~6 ms/batch measured round 2).
# The scene sampler instead derives ALL of a sample's randomness in ONE
# threefry call — ``jax.random.bits(sample_key, (N,))`` is counter-based by
# construction — and call sites read static slots of the bits table. Slot
# layout: every named stream owns a fixed-width block inside a per-scope
# region (scopes: 1 sample-level + MAX_OBJECTS object + MAX_OBJECTS *
# MAX_COMPONENTS component regions). The layout is part of the seed
# contract: changing widths or offsets reshuffles all generated content.
# ---------------------------------------------------------------------------

# Streams drawing (MAX_SPOKES,)-shaped vectors; all others get 2 slots
# (scalar uniforms use slot 0; scalar normals consume both via Box-Muller).
_VECTOR_STREAMS = {}


def _build_layout():
    from ..config import MAX_SPOKES

    vec = {
        Stream.POLY_DPHI: MAX_SPOKES,
        Stream.POLY_R: MAX_SPOKES,
        Stream.POLY_CURVE_TRIGGER: MAX_SPOKES,
    }
    offsets = {}
    acc = 0
    for s in sorted(Stream, key=int):
        offsets[s] = acc
        acc += vec.get(s, 2)
    return offsets, acc


_SLOT_OFFSET, SCOPE_STRIDE = None, None


def _layout():
    global _SLOT_OFFSET, SCOPE_STRIDE
    if _SLOT_OFFSET is None:
        _SLOT_OFFSET, SCOPE_STRIDE = _build_layout()
    return _SLOT_OFFSET, SCOPE_STRIDE


def sample_bits_table(skey: jax.Array, n_scopes: int):
    """All random words for one sample: (n_scopes, SCOPE_STRIDE) uint32,
    one threefry call on the per-sample key. Scope 0 is the sample level
    (background + counts); callers slice further scopes for
    objects/components."""
    _, stride = _layout()
    return jax.random.bits(skey, (n_scopes, stride), dtype=jnp.uint32)


class ScopeDraws:
    """Static-slot draw accessors over one scope's bits row (uint32 vector).

    Distribution semantics match the key-based helpers below: ``uniform`` is
    U[a, b) at 24-bit resolution, ``uniform_int`` the closed range [a, b]
    (modulo; bias <= range/2^32), ``normal`` a Box-Muller N(0,1) pair
    reduced to its cosine branch.
    """

    __slots__ = ("row",)

    def __init__(self, row):
        self.row = row

    def _slot(self, stream, width=1):
        off = _layout()[0][stream]
        return lax.slice_in_dim(self.row, off, off + width)

    def u01(self, stream, width=1):
        b = self._slot(stream, width)
        return (b >> 8).astype(jnp.float32) * (1.0 / (1 << 24))

    def uniform(self, stream, a, b, shape=()):
        width = int(np.prod(shape)) if shape else 1
        u = self.u01(stream, width)
        val = a + u * (b - a)
        return val.reshape(shape) if shape else val[0]

    def uniform_int(self, stream, a, b):
        span = jnp.uint32(b - a + 1)
        return (a + (self._slot(stream)[0] % span)).astype(jnp.int32)

    def raw_index(self, stream):
        """Non-negative unbounded random index (callers take ``% n``)."""
        return (self._slot(stream)[0] & jnp.uint32(0x7FFFFFFF)).astype(
            jnp.int32
        )

    def normal(self, stream):
        b = self._slot(stream, 2)
        u1 = (b[0] >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + (
            0.5 / (1 << 24)
        )
        u2 = (b[1] >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        return r * jnp.cos(2.0 * jnp.pi * u2)


def sample_key(root: jax.Array, sample_index) -> jax.Array:
    """Key for one generated sample (image pair). ``sample_index`` is the global
    monotone sample counter, so content is independent of batch size and device
    layout."""
    return jax.random.fold_in(root, sample_index)


def stream_key(key: jax.Array, stream: Stream, *indices) -> jax.Array:
    """Key for one named stream, optionally refined by per-object / per-component
    indices (static ints or traced int arrays)."""
    k = jax.random.fold_in(key, int(stream))
    for idx in indices:
        k = jax.random.fold_in(k, idx)
    return k


def uniform(key, a, b, shape=()):
    """U[a, b) — std::uniform_real_distribution equivalent (SimpleRandom.h:95-109)."""
    return jax.random.uniform(key, shape, minval=a, maxval=b, dtype=jnp.float32)


def uniform_int(key, a, b, shape=()):
    """Uniform integer on the *closed* range [a, b] — matches
    std::uniform_int_distribution (SimpleRandom.h:75-89)."""
    return jax.random.randint(key, shape, a, b + 1, dtype=jnp.int32)


def normal(key, mean=0.0, stddev=1.0, shape=()):
    """N(mean, stddev) — std::normal_distribution (SimpleRandom.h:130-142)."""
    return mean + stddev * jax.random.normal(key, shape, dtype=jnp.float32)
