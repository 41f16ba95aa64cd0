#!/usr/bin/env python
"""One-shot device-time breakdown of the generation step (run on real TPU).

Times each pipeline component with pipelined dispatch (N async steps, one
scalar readback) so the ~30-45 ms tunnel round-trip per synchronized call
does not pollute component numbers. Prints one line per measurement as it
lands (the run is long: each distinct jit is a multi-minute remote compile
the first time; enable the persistent compilation cache to amortize).

Usage: python tools/profile_scene.py [section ...]
  sections: full prep kernel mode9  (default: all)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# The env var alone is DEAD here (axon sitecustomize imports jax first);
# flowgen.utils.profiling.enable_compile_cache() below does the real work.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flowgen.utils.profiling import enable_compile_cache

enable_compile_cache()

BATCH = 32
STEPS = 12


def pipelined(fn, *args, steps=STEPS, warmup=True):
    """Dispatch ``steps`` async calls, read back one scalar from the last."""
    probe = lambda o: float(jnp.ravel(jax.tree.leaves(o)[0])[-1])
    if warmup:
        probe(fn(*args))
    t0 = time.perf_counter()
    outs = None
    for _ in range(steps):
        outs = fn(*args)
    probe(outs)
    return (time.perf_counter() - t0) / steps


def report(name, secs):
    print(f"{name:42s} {secs * 1e3:9.3f} ms/batch "
          f"({BATCH / secs:8.1f} samples/s)", flush=True)


def main():
    sections = set(sys.argv[1:]) or {"full", "prep", "kernel", "mode9"}

    import flowgen
    from flowgen import DataGenConfig
    from flowgen.compose import fused as fused_mod
    from flowgen.compose import render as render_mod
    from flowgen.ops import pallas_scene as ps
    from flowgen.params.sampler import sample_scene_batch
    from flowgen.random.streams import root_key

    cfg = DataGenConfig(mode=7, batch_size=BATCH, seed=0)
    atlas_np = flowgen.procedural_atlas(32, height=cfg.height, width=cfg.width)
    atlas = jnp.asarray(atlas_np, jnp.float32)
    root = root_key(0)
    step = jnp.int32(1)

    t0 = time.perf_counter()

    if "full" in sections:
        fn = flowgen.make_generate_fn(cfg)
        report("full step (pipelined)", pipelined(fn, root, step, atlas))
        # per-step (synchronized) for the tunnel-overhead delta
        probe = lambda o: float(jnp.ravel(o["flow0"])[-1])
        t = time.perf_counter()
        for i in range(6):
            probe(fn(root, jnp.int32(i), atlas))
        report("full step (synchronized)", (time.perf_counter() - t) / 6)

    # ---- shared precompute products ----
    H, W = cfg.height, cfg.width
    indices = jnp.arange(BATCH)

    @jax.jit
    def sample_only(root, step):
        return sample_scene_batch(root, step * BATCH + indices, cfg)

    @jax.jit
    def prep_all(root, step, atlas):
        from flowgen.compose.render import prepare_atlas
        scenes = sample_scene_batch(root, step * BATCH + indices, cfg)
        slabs = ps.prepare_slabs(atlas, H, W)
        bgslabs = ps.prepare_bg_slabs(atlas)
        count, order, omi, omf, tmi, tmf, edges = jax.vmap(
            lambda s: fused_mod.prepare_scene_inputs(s, cfg, slabs.shape[0])
        )(scenes)
        bg_tex = scenes.background.tex_id % bgslabs.shape[0]
        bg = scenes.background
        bg_meta = jnp.stack(
            [bg_tex.astype(jnp.int32), bg.warp.astype(jnp.int32),
             bg.warp_slot.astype(jnp.int32)], axis=1,
        )
        bgm = jax.vmap(
            lambda s: fused_mod._bg_meta_payload(s, cfg, atlas.shape[1],
                                                 atlas.shape[2])
        )(scenes)
        return (count, order, bg_meta, omi, omf, tmi, tmf, bgm, edges,
                slabs, bgslabs)

    if "prep" in sections or "kernel" in sections:
        report("scene sampling only", pipelined(sample_only, root, step))
        report("sampling + all precompute", pipelined(prep_all, root, step,
                                                      atlas))

    if "prep" in sections:
        # Subtraction-free terms: each stage from CONCRETE inputs.
        from flowgen.random import streams as streams_mod
        from flowgen.config import MAX_OBJECTS

        from flowgen.config import MAX_COMPONENTS

        n_scopes = 1 + MAX_OBJECTS + MAX_OBJECTS * MAX_COMPONENTS

        @jax.jit
        def bits_only(root, step):
            def one(i):
                sk = streams_mod.sample_key(root, i)
                return streams_mod.sample_bits_table(sk, n_scopes)
            return jax.vmap(one)(step * BATCH + indices)

        report("  bits tables only", pipelined(bits_only, root, step))

        scenes_c = jax.block_until_ready(sample_only(root, step))

        @jax.jit
        def prep_obj_only(scenes):
            return jax.vmap(
                lambda s: fused_mod.prepare_scene_inputs(s, cfg, 32)
            )(scenes)

        @jax.jit
        def bgm_only(scenes):
            return jax.vmap(
                lambda s: fused_mod._bg_meta_payload(
                    s, cfg, atlas.shape[1], atlas.shape[2]
                )
            )(scenes)

        report("  object precompute only", pipelined(prep_obj_only, scenes_c))
        report("  bg meta payload only", pipelined(bgm_only, scenes_c))

        # Inside prepare_scene_inputs: the transform/edge-table algebra vs
        # the tile-grid/meta packing (the remainder).
        from flowgen.ops import affine as affine_mod

        @jax.jit
        def edges_only(scenes):
            def one(s):
                prims = s.prims
                intr = prims.intrinsic
                tr0 = jnp.broadcast_to(intr, intr.shape)
                tr1 = affine_mod.compose(intr, s.objects.motion[:, None])
                e = jnp.stack([fused_mod._edge_table(tr0, prims),
                               fused_mod._edge_table(tr1, prims)], axis=1)
                ell = jnp.stack([fused_mod._ell_params(tr0, prims),
                                 fused_mod._ell_params(tr1, prims)], axis=1)
                return e, ell
            return jax.vmap(one)(scenes)

        report("    edge+ell tables only", pipelined(edges_only, scenes_c))

    if "kernel" in sections:
        inputs = jax.block_until_ready(prep_all(root, step, atlas))
        P, PBG, xs, ys, xsb, ysb, tsp, cwo, cwb = ps.resample_params(
            cfg.mode_spec, H, W)
        for dl, label in (
            (0, "megakernel dl0 (DMA in/out only)"),
            (1, "megakernel dl1 (+bg resample+obj loop)"),
            (2, "megakernel dl2 (+edge DMA+coverage)"),
            (21, "megakernel dl2a (coverage: polygons only)"),
            (22, "megakernel dl2b (coverage: ellipses only)"),
            (3, "megakernel dl3 (full)"),
        ):
            k = jax.jit(
                lambda *a, _dl=dl: ps.scene_render_pallas(
                    *a, spec_key=(P, PBG, xs, ys, xsb, ysb, tsp, cwo, cwb,
                                  H, W), use_aa=True,
                    inverse_flow=False, emit_masks=False, debug_level=_dl,
                )
            )
            report(label, pipelined(k, *inputs))

    if "mode9" in sections:
        import dataclasses as _dc

        from flowgen.config import MODES, register_mode
        from flowgen.warpfields import generator as warpgen
        cfg9 = DataGenConfig(mode=9, batch_size=BATCH, seed=0)
        bank_fn = jax.jit(
            lambda r, s: warpgen.make_warp_bank(r, s, cfg9)
        )
        report("mode9 warp bank (full bank)", pipelined(bank_fn, root, step,
                                                        steps=4))
        ba_fn = jax.jit(
            lambda r, s: warpgen.make_bank_and_aux(r, s, cfg9)
        )
        report("mode9 bank+aux (shared big fields)",
               pipelined(ba_fn, root, step, steps=4))
        fn9 = flowgen.make_generate_fn(cfg9)
        report("mode9 full step (pipelined, cached bank)",
               pipelined(fn9, root, step, atlas))
        # Warp-cost split: the same recipe with warp_p=0 draws IDENTICAL
        # scenes (the trigger consumes the same stream) minus every
        # deformation branch — full-step delta = in-kernel warp cost.
        if 990 not in MODES:
            register_mode(_dc.replace(MODES[9], mode=990, warp_p=0.0))
        cfg90 = DataGenConfig(mode=990, batch_size=BATCH, seed=0,
                              validate_envelope="never")
        fn90 = flowgen.make_generate_fn(cfg90)
        report("mode9 twin w/o warps (warp_p=0)",
               pipelined(fn90, root, step, atlas))

    print(f"total wall {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
