#!/usr/bin/env python
"""Per-mode flow EPE of the TPU renderer against the scalar NumPy oracle
(flowgen/reference_check/oracle.py) on identically-seeded scenes.

Publishes the "sub-pixel flow agreement" claim as a measured table: for every
registered rendering mode, N scenes are sampled from the production key
derivation, rendered through the windowed XLA path (flow math identical to the
megakernel path — pinned by tests/test_fused.py), and compared against the
oracle's literal re-derivation of the reference semantics
(DataGenerator.cpp:702-818). Mode 9 routes its warp bank into both sides.

Writes one JSON document (default EPE_TABLE.json at the repo root) and prints
a markdown table for BENCHMARKS.md.

Usage: python tools/epe_vs_oracle.py [--out FILE] [--scenes N] [mode ...]
Runs fine on CPU (several minutes for all modes).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import flowgen
    from flowgen.compose.render import prepare_atlas, render_sample
    from flowgen.config import MODES
    from flowgen.params.sampler import sample_scene
    from flowgen.random.streams import root_key, sample_key
    from flowgen.reference_check import oracle
    from flowgen.warpfields import generator as warpgen

    args = sys.argv[1:]
    out_path = "EPE_TABLE.json"
    n_scenes = 4
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--scenes" in args:
        i = args.index("--scenes")
        n_scenes = int(args[i + 1])
        del args[i : i + 2]
    modes = [int(m) for m in args] or sorted(MODES)

    W, H = 192, 160
    atlas_np = flowgen.procedural_atlas(3, height=H, width=W)
    quad = jax.jit(prepare_atlas)(jnp.asarray(atlas_np))

    table = {}
    for mode in modes:
        cfg = flowgen.DataGenConfig(mode=mode, batch_size=1, width=W, height=H)
        spec = cfg.mode_spec
        bank = bank_np = None
        n_slots = 1
        if spec.warp_p > 0.0:
            bank = warpgen.make_warp_bank(root_key(2), jnp.int32(0), cfg)
            bank_np = {
                "flow": np.asarray(bank.flow),
                "iflow": np.asarray(bank.iflow),
            }
            n_slots = warpgen.bank_size(cfg)

        medians, maxes, fracs = [], [], []
        for s in range(n_scenes):
            scene = sample_scene(
                sample_key(root_key(7), s), spec, width=W, height=H,
                n_warp_slots=n_slots,
            )
            out = render_sample(scene, quad, cfg, warp_bank=bank)
            _, _, o_flow = oracle.render_scene_oracle(
                oracle.scene_to_numpy(scene), atlas_np, W, H,
                warp_bank=bank_np,
            )
            d = np.abs(np.asarray(out.flow0) - o_flow).max(-1)
            medians.append(float(np.median(d)))
            maxes.append(float(d.max()))
            fracs.append(float((d > 0.1).mean()))
        table[str(mode)] = {
            "median_epe": max(medians),
            "max_epe": max(maxes),
            "frac_gt_0.1px": max(fracs),
            "scenes": n_scenes,
        }
        print(
            f"mode {mode:3d}: median EPE {max(medians):.2e} px, "
            f"max {max(maxes):.3f}, frac>0.1px {max(fracs):.4f}",
            flush=True,
        )

    with open(out_path, "w") as f:
        json.dump({"frame": [H, W], "per_mode": table}, f, indent=1)

    print("\n| mode | median EPE (px) | max EPE (px) | frac > 0.1 px |")
    print("|---|---|---|---|")
    for m, r in table.items():
        print(
            f"| {m} | {r['median_epe']:.2e} | {r['max_epe']:.3f} "
            f"| {r['frac_gt_0.1px']:.4f} |"
        )


if __name__ == "__main__":
    main()
