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
