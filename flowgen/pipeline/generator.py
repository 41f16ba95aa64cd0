"""Generation pipeline: jitted batch step + streaming runtime.

This replaces the reference's entire L3/L4 runtime — the task scheduler with
its mutex-guarded queues and worker threads (DataGenerator, src/caffe/
DataGenerator.cpp:990-1349) and the Caffe layer adapter with its prefetch
thread and blob buckets (src/caffe/layers/data_generation_layer.cpp:36-299).

On TPU the "scheduler" is one compiled program: scene sampling, warp-field
synthesis, rasterization, compositing, and flow synthesis fuse into a single
device step ``(seed, step_index, atlas) -> batch``. Pipelining falls out of
JAX's async dispatch: the runtime keeps ``prefetch`` steps in flight, which is
the moral equivalent of the reference's prefetch-queue depth
(train.prototxt:13) without any queues or 1 ms spin-waits.

Because every batch is a pure function of ``(seed, step)``, the stream is
deterministic, seekable, and trivially resumable — checkpoint/resume of the
data stream (impossible in the reference, SURVEY.md §5) is just "remember the
step counter".
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compose.render import render_batch
from ..config import DataGenConfig
from ..params.sampler import sample_scene_batch
from ..random.streams import root_key
from ..warpfields import generator as warpgen
from .. import texture_io
from ..texture_io import TextureDB


def _adapt_output(images0, images1, flow0, flow1, cfg: DataGenConfig,
                  masks=None):
    """Apply output-compatibility transforms. The reference emits float batches
    {B,3,H,W} in 0..255 BGR plus {B,2,H,W} flow (data_generation_layer.cpp:
    227-229; BGR swap at texture load, DataGenerator.cpp:129-131)."""
    if cfg.warp_oob == "nan" and cfg.mode_spec.warp_p > 0.0:
        # Decode the OOB sentinel (warpfields.generator.apply_oob_policy)
        # back into the reference's signaling-NaN forward flow
        # (WarpFields.cpp:389-398 via getPointFlow cpp:398-406).
        from ..warpfields.generator import OOB_FLOW_THRESH

        flow0 = jnp.where(jnp.abs(flow0) > OOB_FLOW_THRESH, jnp.nan, flow0)
    if cfg.channel_order == "bgr":
        images0 = images0[..., ::-1]
        images1 = images1[..., ::-1]
    out = {"image0": images0, "image1": images1, "flow0": flow0}
    if flow1 is not None:
        out["flow1"] = flow1
    if cfg.layout == "nchw":
        out = {k: jnp.moveaxis(v, -1, 1) for k, v in out.items()}
    if masks is not None:
        out["occlusion"], out["motion_boundary"] = masks  # (B, H, W) bool
    if cfg.mode_spec.horizontal_only:
        # Rectified-stereo semantics: left = image0, right = image1,
        # disparity positive for leftward apparent motion.
        out["disparity"] = -(
            flow0[..., 0] if cfg.layout == "nhwc" else out["flow0"][:, 0]
        )
    return out


def use_fused_path(cfg: DataGenConfig) -> bool:
    """Whether this config renders through the scene megakernel
    (compose/fused.py). ``cfg.render_impl`` is the dial (see config.py):
    "fused" (default) selects the megakernel on every backend whenever the
    config is eligible — all 13 modes and output combinations are, given
    (8, 128)-aligned frame dims (large rotations via quadrant-factored
    slabs, nonrigid deformation and inverse flow in-kernel — see
    ops/pallas_scene.fused_eligible) — so image content is a pure function
    of (seed, step, cfg), backend-independent, like the reference's single
    renderer (DataGenerator.cpp:337-349). "windowed" forces the XLA
    fallback; "auto" keys off the backend (legacy/no image contract)."""
    from ..compose.render import _pallas_enabled
    from ..ops.pallas_scene import fused_eligible

    if cfg.render_impl == "windowed" or cfg.use_pallas == "never":
        return False
    eligible = cfg.windowed and fused_eligible(
        cfg.mode_spec, cfg.height, cfg.width, cfg.compute_inverse_flow
    )
    if cfg.render_impl == "auto":
        return eligible and _pallas_enabled(cfg)
    return eligible


def _fused_interpret() -> bool:
    """Off-TPU, the megakernel runs in Pallas interpret mode (Mosaic only
    lowers for TPU). Trace-time constant; cpu covers the virtual multi-device
    test mesh too."""
    return jax.default_backend() == "cpu"


def generate_batch(root, step, atlas, cfg: DataGenConfig, base_index=None,
                   warp_bank=None, slabs=None, warp_aux=None):
    """One batch: samples ``cfg.batch_size`` scenes at global indices
    ``base_index .. base_index+B-1`` (default ``step*B``) and renders them.
    Pure; jit with cfg static. In mode 9 a precomputed ``warp_bank`` can be
    passed (see make_generate_fn's epoch caching); otherwise it is derived
    from ``(root, step // warp_bank_reuse_steps)`` inline. ``slabs`` likewise
    pre-bakes the fused path's packed texture slabs."""
    from ..compose.render import prepare_atlas

    b = cfg.batch_size
    if base_index is None:
        base_index = step * b
    indices = base_index + jnp.arange(b)
    # Accept a raw (T, SH, SW, 3) atlas, one already quad-packed to
    # (T, SH, SW, 12) by prepare_atlas, or a texture_io.TextureDB (native
    # field-of-view path). Callers on the hot path (Generator,
    # make_generate_fn) pre-pack ONCE outside the step — packing is ~10 ms per
    # batch at 32 textures and the atlas never changes. The barrier pins the
    # packed atlas: without it XLA rematerializes it into each of its many
    # gather consumers, recomputing it per object (3x slowdown at 32 textures).
    db = atlas if isinstance(atlas, TextureDB) else None
    if db is not None:
        atlas = jnp.asarray(db.canonical)
    if atlas.shape[-1] != 12:
        atlas = prepare_atlas(atlas)
    atlas = jax.lax.optimization_barrier(atlas)
    n_slots = 1
    inline_aux = None
    if cfg.mode_spec.warp_p > 0.0:
        n_slots = warpgen.bank_size(cfg)
        if warp_bank is None:
            if use_fused_path(cfg):
                # Shared-big-field producer: same content as the hot path's
                # epoch cache (one solve per big field, not per crop).
                warp_bank, inline_aux = warpgen.make_bank_and_aux(
                    root, step, cfg
                )
            else:
                warp_bank = warpgen.make_warp_bank(root, step, cfg)
    else:
        warp_bank = None
    scenes = sample_scene_batch(root, indices, cfg, n_warp_slots=n_slots)
    if use_fused_path(cfg):
        from ..compose.fused import render_batch_fused
        from ..ops.pallas_scene import (
            prepare_bg_slabs,
            prepare_bg_slabs_db,
            prepare_obj_slabs,
            prepare_slabs,
            quadrant_needed,
        )

        if slabs is None:
            quad = quadrant_needed(cfg.mode_spec)
            if db is not None:
                slabs = (
                    prepare_obj_slabs(jnp.asarray(db.obj_tex), quadrant=quad),
                    prepare_bg_slabs_db(db.sources, db.sizes),
                )
            else:
                # Quad channels 0:3 are the raw image (texture.make_quad).
                slabs = (
                    prepare_slabs(atlas[..., :3], cfg.height, cfg.width,
                                  quadrant=quad),
                    prepare_bg_slabs(atlas[..., :3]),
                )
        slabs = jax.lax.optimization_barrier(slabs)
        if warp_bank is not None and warp_aux is None:
            # Derived inline (hot-path callers cache it per bank epoch). A
            # caller-provided bank without aux takes the per-crop fallback
            # solve (no big fields to share).
            warp_aux = (inline_aux if inline_aux is not None
                        else warpgen.make_warp_aux(warp_bank))
        rendered = render_batch_fused(
            scenes, slabs[0], slabs[1], (atlas.shape[1], atlas.shape[2]), cfg,
            interpret=_fused_interpret(),
            quad_atlas=atlas, warp_bank=warp_bank, warp_aux=warp_aux,
            tex_sizes=None if db is None else jnp.asarray(db.sizes),
        )
    else:
        rendered = list(render_batch(scenes, atlas, cfg, warp_bank))
        if cfg.emit_masks:
            # The windowed loop carries the painter's index images (2, H, W)
            # as its last output; derive the masks exactly as the fused path
            # does from its in-kernel ids.
            from ..compose.fused import masks_from_ids

            ids = rendered.pop()
            f0 = rendered[2]
            rendered += list(masks_from_ids(ids, f0[..., 0], f0[..., 1]))
    rendered = list(rendered)
    i0, i1, f0 = rendered[:3]
    rest = rendered[3:]
    f1 = rest.pop(0) if cfg.compute_inverse_flow else None
    masks = tuple(rest) if cfg.emit_masks else None
    if cfg.photometric_augment:
        from ..ops import photometric

        i0, i1 = photometric.augment_batch(root, indices, i0, i1)
    return _adapt_output(i0, i1, f0, f1, cfg, masks)


def make_atlas_packer():
    """Host-side quad-pack cache: packs a concrete atlas once per distinct
    array object (the atlas is static across steps; repacking costs ~10 ms per
    batch at 32 textures). Traced atlases (callers composing under jit) fall
    through — generate_batch packs inline."""
    from ..compose.render import prepare_atlas

    pack = jax.jit(prepare_atlas)
    cache = {}

    def packed(atlas):
        if isinstance(atlas, TextureDB):
            # Quad-pack the canonical array in place; the other DB fields
            # pass through for the fused path's slabs/sizes.
            if atlas.canonical.shape[-1] == 12:
                return atlas
            if cache.get("id") != id(atlas.canonical):
                cache["id"] = id(atlas.canonical)
                cache["val"] = atlas._replace(
                    canonical=pack(jnp.asarray(atlas.canonical))
                )
            return cache["val"]
        if atlas.shape[-1] == 12 or isinstance(atlas, jax.core.Tracer):
            return atlas
        if cache.get("id") != id(atlas):
            cache["id"] = id(atlas)
            cache["val"] = pack(atlas)
        return cache["val"]

    return packed


def make_slab_packer(cfg: DataGenConfig):
    """Host-side cache of the fused path's packed texture slabs (see
    ops/pallas_scene.prepare_slabs) — like make_atlas_packer, built once per
    distinct atlas. Returns ``fn(atlas) -> slabs or None`` (None when the
    config doesn't use the fused path; generate_batch then ignores it)."""
    if not use_fused_path(cfg):
        return lambda atlas: None
    from ..ops.pallas_scene import (
        prepare_bg_slabs,
        prepare_bg_slabs_db,
        prepare_obj_slabs,
        prepare_slabs,
        quadrant_needed,
    )

    quad = quadrant_needed(cfg.mode_spec)
    pack = jax.jit(
        lambda a: (
            prepare_slabs(a, height=cfg.height, width=cfg.width,
                          quadrant=quad),
            prepare_bg_slabs(a),
        )
    )
    pack_db = jax.jit(
        lambda obj, src, sizes: (
            prepare_obj_slabs(obj, quadrant=quad),
            prepare_bg_slabs_db(src, sizes),
        )
    )
    cache = {}

    def slabs(atlas):
        if isinstance(atlas, TextureDB):
            if cache.get("id") != id(atlas.sources):
                cache["id"] = id(atlas.sources)
                cache["val"] = pack_db(
                    jnp.asarray(atlas.obj_tex), jnp.asarray(atlas.sources),
                    jnp.asarray(atlas.sizes),
                )
            return cache["val"]
        if isinstance(atlas, jax.core.Tracer):
            return None  # composed under jit: generate_batch derives inline
        if cache.get("id") != id(atlas):
            cache["id"] = id(atlas)
            cache["val"] = pack(atlas[..., :3])
        return cache["val"]

    return slabs


class BankEpochCache:
    """Host-side (warp bank, warp aux) cache keyed by ``step // reuse`` with
    sequential-consumption prefetch: :meth:`prefetch_next` (call AFTER
    dispatching a step's generation work) dispatches the NEXT epoch's
    bank+aux asynchronously on the epoch's last step, so the epoch boundary
    costs no pipeline bubble — the deterministic analog of the reference's
    always-running producer threads (WarpFields.cpp:489). A seek elsewhere
    only wastes the prediction; results stay exact. Shared by the unsharded
    (:func:`make_generate_fn`) and sharded (pipeline/sharding.py) paths."""

    def __init__(self, bank_fn, aux_fn, reuse: int, build_fn=None):
        self._bank_fn = bank_fn
        self._aux_fn = aux_fn
        self._build_fn = build_fn  # combined (bank, aux) producer, preferred
        self._reuse = max(reuse, 1)
        self._c = {}

    def _build(self, root, step: int):
        if self._build_fn is not None:
            # Shared-big-field producer (warpgen.make_bank_and_aux): one
            # dispatch, and the aux column inverses solve once per big field
            # instead of per crop.
            return self._build_fn(root, jnp.int32(step))
        bank = self._bank_fn(root, jnp.int32(step))
        aux = self._aux_fn(bank) if self._aux_fn is not None else None
        return bank, aux

    def get(self, root, step: int):
        c, reuse = self._c, self._reuse
        epoch = int(step) // reuse
        if c.get("epoch") != epoch:
            if c.get("next_epoch") == epoch:
                # Pre-dispatched at the previous epoch's tail — the device
                # already worked through it behind the generation steps.
                c["bank"] = c.pop("next_bank")
                c["aux"] = c.pop("next_aux")
                del c["next_epoch"]
            else:
                c["bank"], c["aux"] = self._build(root, epoch * reuse)
            c["epoch"] = epoch
        return c["bank"], c["aux"]

    def prefetch_next(self, root, step: int):
        c, reuse = self._c, self._reuse
        epoch = int(step) // reuse
        if int(step) % reuse == reuse - 1 and c.get("next_epoch") != epoch + 1:
            c["next_bank"], c["next_aux"] = self._build(
                root, (epoch + 1) * reuse
            )
            c["next_epoch"] = epoch + 1


def make_generate_fn(cfg: DataGenConfig, mesh=None):
    """Compiled generation step. With a mesh, generation shards over the
    ``data`` axis via shard_map — per-device independent generation, zero
    collectives on the hot path (SURVEY.md §2: the TPU-native replacement for
    the reference's first-level thread pool).

    In mode 9 the warp-crop bank is cached host-side and regenerated only
    every ``cfg.warp_bank_reuse_steps`` steps — the deterministic analog of
    the reference CropGenerator's crop reuse (WarpFields.cpp:516-538)."""
    if mesh is not None:
        from .sharding import make_sharded_generate_fn

        return make_sharded_generate_fn(cfg, mesh)

    gen = jax.jit(functools.partial(generate_batch, cfg=cfg))
    packed = make_atlas_packer()
    slab_of = make_slab_packer(cfg)
    if cfg.mode_spec.warp_p == 0.0:
        return lambda root, step, atlas: gen(
            root, step, packed(atlas), slabs=slab_of(packed(atlas))
        )

    bank_cache = BankEpochCache(
        jax.jit(functools.partial(warpgen.make_warp_bank, cfg=cfg)),
        None,
        cfg.warp_bank_reuse_steps,
        build_fn=(
            jax.jit(functools.partial(warpgen.make_bank_and_aux, cfg=cfg))
            if use_fused_path(cfg) else None
        ),
    )

    def fn(root, step, atlas):
        bank, aux = bank_cache.get(root, int(step))
        out = gen(
            root, jnp.int32(step), packed(atlas), warp_bank=bank,
            slabs=slab_of(packed(atlas)), warp_aux=aux,
        )
        bank_cache.prefetch_next(root, int(step))
        return out

    return fn


def make_mixed_generate_fn(cfgs, weights=None, mesh=None):
    """Deterministic per-step mode mixture (the IJCV paper's curriculum /
    dataset-mixing experiments; the reference could only run one hardcoded
    mode per process).

    ``cfgs``: one DataGenConfig per ingredient (same batch/frame dims and
    output signature; each mode compiles once, first use). ``weights``:
    mixture probabilities (default uniform). The mode choice is a pure
    function of (seed, step) — a host-side counter-based draw, no device
    round trip — so the mixed stream stays seekable and resumable like the
    single-mode one. Returns ``fn(root, step, atlas)``."""
    if not cfgs:
        raise ValueError("need at least one config")
    sig = {
        (c.batch_size, c.height, c.width, c.layout, c.channel_order,
         c.compute_inverse_flow, c.emit_masks,
         c.mode_spec.horizontal_only)
        for c in cfgs
    }
    if len(sig) > 1:
        raise ValueError(
            "mixed-mode ingredients must share batch/frame dims and output "
            f"signature; got {sorted(sig)}"
        )
    p = np.full(len(cfgs), 1.0 / len(cfgs)) if weights is None else (
        np.asarray(weights, np.float64) / np.sum(weights)
    )
    cum = np.cumsum(p)
    fns = [make_generate_fn(c, mesh) for c in cfgs]
    seed = cfgs[0].seed

    def fn(root, step, atlas):
        # Philox counter draw keyed by (seed, step): stateless, seekable.
        u = np.random.default_rng([seed, int(step), 0x6D69785D]).random()
        return fns[int(np.searchsorted(cum, u, side="right").clip(
            0, len(fns) - 1
        ))](root, step, atlas)

    return fn


class Generator:
    """Streaming batch source with the reference layer's lifecycle surface.

    API parity with DataGenerator (DataGenerator.h:452-479) + the prefetching
    layer: Start/Stop/Pause/Resume, ``retrieve_batch`` (blocking, like
    retrieveFinishedTask cpp:1324-1349), iterator protocol, and a seekable
    ``step`` counter for exact resume.
    """

    def __init__(
        self,
        cfg: DataGenConfig,
        atlas: Optional[np.ndarray] = None,
        mesh=None,
        start_step: int = 0,
        as_numpy: bool = False,
    ):
        self.cfg = cfg
        if atlas is None:
            atlas = texture_io.atlas_for_config(cfg)
        from ..compose.render import prepare_atlas

        # Quad-pack once at construction; the step then skips the ~10 ms/batch
        # repack (generate_batch accepts packed/raw atlases and TextureDBs).
        if isinstance(atlas, TextureDB):
            self._atlas = atlas._replace(
                canonical=jax.jit(prepare_atlas)(jnp.asarray(atlas.canonical))
            )
        else:
            self._atlas = jax.jit(prepare_atlas)(jnp.asarray(atlas))
        self._root = root_key(cfg.seed)
        self._fn = make_generate_fn(cfg, mesh)
        self._step = start_step
        self._as_numpy = as_numpy
        from ..utils.profiling import ThroughputMeter

        self.meter = ThroughputMeter()
        self._running = False
        self._paused = threading.Event()
        self._paused.set()  # not paused
        self._inflight = []
        self._lock = threading.Lock()

    # -- lifecycle (Start/Stop/Pause/Resume, DataGenerator.cpp:1010-1063) --
    def start(self):
        if self._running:
            return self
        self._running = True
        self._pump()
        return self

    def stop(self):
        self._running = False
        with self._lock:
            self._inflight.clear()
        return self

    def pause(self):
        self._paused.clear()
        return self

    def resume(self):
        self._paused.set()
        if self._running:
            self._pump()
        return self

    @property
    def step(self) -> int:
        """Next global step index; persist this for exact stream resume."""
        return self._step

    def _dispatch(self):
        out = self._fn(self._root, jnp.int32(self._step), self._atlas)
        self._step += 1
        return out

    def _pump(self):
        """Keep ``prefetch`` async device steps in flight (the reference's
        prefetch-bucket pipelining, data_generation_layer.cpp:141-172, without
        threads: JAX dispatch is already asynchronous)."""
        with self._lock:
            while self._running and self._paused.is_set() and (
                len(self._inflight) < max(1, self.cfg.prefetch)
            ):
                self._inflight.append(self._dispatch())

    # -- consumption --
    def retrieve_batch(self):
        """Blocking fetch of the next finished batch."""
        if not self._running:
            self.start()
        while not self._paused.is_set():
            time.sleep(0.001)
        with self._lock:
            # A racing stop() may clear the prefetch queue between our start()
            # check and here; dispatch inline rather than IndexError. The step
            # counter only moves under the lock, so the stream stays exact.
            out = self._inflight.pop(0) if self._inflight else self._dispatch()
        self._pump()
        if self._as_numpy:
            out = {k: np.asarray(v) for k, v in out.items()}
        self.meter.tick(self.cfg.batch_size)
        return out

    def has_retrievable_batches(self) -> bool:
        return len(self._inflight) > 0

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        return self.retrieve_batch()
