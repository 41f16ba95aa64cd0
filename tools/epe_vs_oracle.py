#!/usr/bin/env python
"""Per-mode flow EPE of the PRODUCTION fused path against the scalar NumPy
oracle (flowgen/reference_check/oracle.py) on identically-seeded scenes.

Publishes the "sub-pixel flow agreement" claim as a measured table, directly
on the production path at production size: for every registered rendering
mode, scenes sampled from the production key derivation are rendered through
``render_batch_fused`` — the scene megakernel, run in Pallas interpret mode
on the CPU (tools/check_pallas_tpu.py certifies Mosaic == interpret on real
hardware) — at the reference's 512x384 frame, and compared against the
oracle's literal re-derivation of the reference semantics
(DataGenerator.cpp:702-818). Mode 9 routes one shared warp bank into both
sides and is additionally measured with compute_inverse_flow=True
(table row "9_inverse").

Ownership flips are counted SEPARATELY from EPE: at an exact 0.5-coverage
tie the binary mask can resolve differently in f32 vs f64, flipping which
object owns the pixel — both flows are exact, the argmax differs. A pixel
with |d| > 0.1 px is a flip (object flows differ by whole pixels there;
numerical noise is ~1e-5), so the table reports flipped-pixel counts plus
the max EPE over NON-flipped pixels, alongside the raw max for transparency.

Writes one JSON document (default EPE_TABLE.json at the repo root,
incrementally per mode) and prints a markdown table for BENCHMARKS.md.

Usage: python tools/epe_vs_oracle.py [--out FILE] [--scenes N] [mode ...]
Runs on CPU (tens of minutes for all modes at 512x384).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

FLIP_THRESH = 0.1  # px; ownership flips are whole-pixel, noise is ~1e-5


def main():
    jax.config.update("jax_platforms", "cpu")
    from flowgen.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    import flowgen
    from flowgen.compose.fused import render_batch_fused
    from flowgen.compose.render import prepare_atlas
    from flowgen.config import MODES
    from flowgen.ops.pallas_scene import (
        prepare_bg_slabs, prepare_slabs, quadrant_needed,
    )
    from flowgen.params.sampler import sample_scene_batch
    from flowgen.random.streams import root_key
    from flowgen.reference_check import oracle
    from flowgen.warpfields import generator as warpgen

    args = sys.argv[1:]
    out_path = "EPE_TABLE.json"
    n_scenes = 2
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--scenes" in args:
        i = args.index("--scenes")
        n_scenes = int(args[i + 1])
        del args[i : i + 2]
    mode_args = args or [str(m) for m in sorted(MODES)] + ["9_inverse"]

    table = {}

    def write(path=out_path):
        merged = dict(table)
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f)
            if prior.get("path") == "fused":
                merged = {**prior.get("per_mode", {}), **table}
        with open(path, "w") as f:
            json.dump(
                {
                    "path": "fused",
                    "interpret": True,
                    "frame": [384, 512],
                    "flip_thresh_px": FLIP_THRESH,
                    "per_mode": merged,
                },
                f,
                indent=1,
            )

    for mode_arg in mode_args:
        inverse = mode_arg.endswith("_inverse")
        mode = int(mode_arg.split("_")[0])
        cfg = flowgen.DataGenConfig(
            mode=mode, batch_size=n_scenes, seed=7,
            compute_inverse_flow=inverse,
        )
        H, W = cfg.height, cfg.width
        spec = cfg.mode_spec

        atlas = jnp.asarray(
            flowgen.procedural_atlas(4, height=H, width=W), jnp.float32
        )
        quad = prepare_atlas(atlas)
        slabs = prepare_slabs(
            quad[..., :3], H, W, quadrant=quadrant_needed(spec)
        )
        bgslabs = prepare_bg_slabs(quad[..., :3])
        warp_aux = bank_np = None
        n_slots = 1
        if spec.warp_p > 0.0:
            # impl="xla" keeps the (slow under interpret) bank build in XLA;
            # the SAME bank feeds both sides, so bank content cancels out of
            # the EPE — this table measures RENDER fidelity.
            bank, warp_aux = warpgen.make_bank_and_aux(
                root_key(7), jnp.int32(0), cfg, impl="xla"
            )
            n_slots = warpgen.bank_size(cfg)
            bank_np = {
                "flow": np.asarray(bank.flow),
                "iflow": np.asarray(bank.iflow),
            }
        scenes = sample_scene_batch(
            root_key(7), jnp.arange(n_scenes), cfg, n_warp_slots=n_slots
        )

        out = render_batch_fused(
            scenes, slabs, bgslabs, (H, W), cfg,
            interpret=True, warp_aux=warp_aux,
        )
        flows = [np.asarray(out[2])]
        if inverse:
            flows.append(np.asarray(out[3]))

        atlas_np = np.asarray(atlas)
        ds = []
        for s in range(n_scenes):
            scene_np = oracle.scene_to_numpy(
                jax.tree.map(lambda x: x[s], scenes)
            )
            o = oracle.render_scene_oracle(
                scene_np, atlas_np, W, H, warp_bank=bank_np,
                compute_inverse=inverse,
            )
            ds.append(np.abs(flows[0][s] - o[2]).max(-1))
            if inverse:
                ds.append(np.abs(flows[1][s] - o[3]).max(-1))
        d = np.stack(ds)
        flips = d > FLIP_THRESH
        unflipped = np.where(flips, 0.0, d)
        table[mode_arg] = {
            "median_epe": float(np.median(d)),
            "max_epe_unflipped": float(unflipped.max()),
            "max_epe": float(d.max()),
            "flipped_px": int(flips.sum()),
            "flipped_frac": float(flips.mean()),
            "pixels": int(d.size),
            "scenes": n_scenes,
        }
        r = table[mode_arg]
        print(
            f"mode {mode_arg:>9}: median EPE {r['median_epe']:.2e} px, "
            f"max(unflipped) {r['max_epe_unflipped']:.2e}, "
            f"flips {r['flipped_px']}/{r['pixels']} "
            f"({r['flipped_frac']:.1e}), raw max {r['max_epe']:.3f}",
            flush=True,
        )
        write()

    print("\n| mode | median EPE (px) | max EPE non-flipped (px) "
          "| flipped px | flipped frac |")
    print("|---|---|---|---|---|")
    for m, r in table.items():
        print(
            f"| {m} | {r['median_epe']:.2e} | {r['max_epe_unflipped']:.2e} "
            f"| {r['flipped_px']} | {r['flipped_frac']:.1e} |"
        )


if __name__ == "__main__":
    main()
