#!/usr/bin/env python
"""On-device megakernel correctness check (run on real TPU hardware).

Two comparisons per mode, from the same concrete inputs:

1. **Mosaic vs interpreter** — ``render_batch_fused`` compiled on the TPU
   against the SAME kernel run in Pallas interpreter mode on the host CPU,
   with bit-identical operands (scenes/slabs/aux staged once on CPU). This
   is BOTH the lowering check (any Mosaic compilation bug shows up as a
   mismatch) AND, since r5's ``render_impl="fused"`` default routes every
   backend through this kernel, the IMAGE content contract: the same
   (seed, step, cfg) must yield the same frames on every backend. Flow must
   agree to f32 noise; frames are integer-rounded so they agree exactly
   except where backend fma/div rounding straddles a u8 .5 boundary — the
   gate requires ZERO pixels >= 2 levels apart and < 1% >= 1 level.

2. **Fused vs windowed (both on TPU)** — consistency check on the DEBUG
   fallback renderer (``render_impl="windowed"``, non-contractual for image
   bytes since r5). The two paths resample through different (both
   documented, both reflect-exact) chains: point-wise quad gathers vs the
   banded two-pass over true-reflect slabs, and the fused path rounds
   frames; images therefore differ sub-level almost everywhere and the
   comparison bounds the distribution, not the max. Flow uses identical
   coverage math and must match exactly for rigid modes (median + outliers
   for mode 9's two displacement-warp formulations) — flow IS contractual
   on both paths.

A third check, selected with the pseudo-mode ``bank``, certifies the mode-9
CONTENT contract (cfg.warp_bank_impl="pallas" on every backend): the banded
Mosaic warp-bank composition compiled on the TPU against the same composition
run in interpret mode on the host CPU, from identical (seed, step)-derived
keys end-to-end (warpfields/pallas_fields.make_big_fields_pallas).

Usage: python tools/check_pallas_tpu.py [--json OUT.json] [mode|bank ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# The env var alone is DEAD here (axon sitecustomize imports jax first);
# flowgen.utils.profiling.enable_compile_cache() is called in main().
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def _retry(fn, attempts=3):
    """Re-run ``fn`` on tunneled-backend flakes (FAILED_PRECONDITION).

    The dev TPU tunnel intermittently fails a device->host readback
    mid-session; the computation itself is deterministic, so a retry with
    the same operands is safe and usually succeeds.
    """
    import time

    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — backend flake, retry
            last = e
            print(f"  retry {i + 1}/{attempts} after: {e}", flush=True)
            time.sleep(15)
    raise last


def _start_keepalive(device, period_s=60):
    """Touch the TPU with a tiny transfer periodically from a daemon thread.

    The tunneled backend has failed device_puts (FAILED_PRECONDITION) when
    the first real TPU op lands only after many minutes of CPU-side staging;
    an op immediately after client init followed by periodic touches keeps
    the session warm. Runs until process exit."""
    import threading

    import jax
    import numpy as np_

    def loop():
        x = np_.ones((8,), np_.float32)
        while True:
            try:
                jax.device_put(x, device).block_until_ready()
            except Exception:
                pass
            time_mod.sleep(period_s)

    import time as time_mod

    t = threading.Thread(target=loop, daemon=True)
    t.start()


def _fused_outputs(scenes, slabs, bgslabs, src_hw, cfg, warp_aux, device,
                   interpret):
    import jax

    from flowgen.compose.fused import render_batch_fused

    inputs = jax.device_put((scenes, slabs, bgslabs, warp_aux), device)
    scenes_d, slabs_d, bgslabs_d, aux_d = inputs
    with jax.default_device(device):
        out = render_batch_fused(
            scenes_d, slabs_d, bgslabs_d, src_hw, cfg,
            interpret=interpret, warp_aux=aux_d,
        )
    return [np.asarray(o) for o in out]


def _check_bank(tpu, cpu):
    """Mosaic-vs-interpret identity of the mode-9 warp bank itself, end to
    end from (seed, step)-derived keys at reduced size (big=384, the 128x96
    frame's field). Flow values gate at f32 noise; the NaN (out-of-bounds)
    masks must agree exactly."""
    import jax

    from flowgen.random.streams import Stream, root_key, stream_key
    from flowgen.warpfields.pallas_fields import make_big_fields_pallas

    keys = [
        stream_key(jax.random.fold_in(root_key(3), 0), Stream.WARP_FIELD, i)
        for i in range(2)
    ]

    def run(device, interpret):
        with jax.default_device(device):
            f, i = make_big_fields_pallas(keys, 384, interpret=interpret)
        return np.asarray(f), np.asarray(i)

    f_t, i_t = _retry(lambda: run(tpu, False))
    f_c, i_c = run(cpu, True)
    nan_mismatch = max(
        (np.isnan(f_t) != np.isnan(f_c)).mean(),
        (np.isnan(i_t) != np.isnan(i_c)).mean(),
    )
    d = np.maximum(
        np.abs(np.nan_to_num(f_t) - np.nan_to_num(f_c)),
        np.abs(np.nan_to_num(i_t) - np.nan_to_num(i_c)),
    )
    ok = (
        float(nan_mismatch) < 1e-4
        and float(np.median(d)) < 1e-4
        and float((d > 0.01).mean()) < 1e-3
    )
    res = {
        "flow_median": float(np.median(d)),
        "flow_frac_gt_0.01": float((d > 0.01).mean()),
        "flow_max": float(d.max()),
        "nan_mask_mismatch": float(nan_mismatch),
        "ok": bool(ok),
    }
    print(
        f"bank: mosaic-vs-interp med {res['flow_median']:.1e} "
        f">0.01 {res['flow_frac_gt_0.01']:.2e} max {res['flow_max']:.1e} "
        f"nan_mismatch {nan_mismatch:.1e} {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    return res


def main():
    import jax
    import jax.numpy as jnp

    from flowgen.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import flowgen
    from flowgen.ops.pallas_scene import (
        prepare_bg_slabs, prepare_slabs, quadrant_needed,
    )
    from flowgen.compose.render import prepare_atlas
    from flowgen.params.sampler import sample_scene_batch
    from flowgen.random.streams import root_key
    from flowgen.warpfields import generator as warpgen

    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    modes = args or ["1", "7", "9"]
    failures = 0
    results = {}
    cpu = jax.devices("cpu")[0]
    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    print(f"devices: tpu={tpu}, cpu={cpu}", flush=True)
    _start_keepalive(tpu)

    def _write_json(new_results):
        # Written after EVERY mode (merging into any modes already in the
        # file): per-mode wall time through the tunneled backend is many
        # minutes, and a killed run should not lose finished results.
        merged = new_results
        if os.path.exists(json_out):
            with open(json_out) as f:
                merged = {**json.load(f).get("results", {}), **new_results}
        with open(json_out, "w") as f:
            json.dump(
                {
                    "results": merged,
                    "ok": all(r["ok"] for r in merged.values()),
                },
                f,
            )

    for mode_arg in modes:
        if mode_arg == "bank":
            res_b = _check_bank(tpu, cpu)
            failures += 0 if res_b["ok"] else 1
            results["bank"] = res_b
            if json_out:
                _write_json(results)
            continue
        mode = int(mode_arg)
        cfg = flowgen.DataGenConfig(mode=mode, batch_size=4, seed=3)
        res = {}

        # ---- stage identical concrete inputs on host ----
        with jax.default_device(cpu):
            atlas = jnp.asarray(
                flowgen.procedural_atlas(
                    4, height=cfg.height, width=cfg.width
                ),
                jnp.float32,
            )
            quad = prepare_atlas(atlas)
            slabs = prepare_slabs(
                quad[..., :3], cfg.height, cfg.width,
                quadrant=quadrant_needed(cfg.mode_spec),
            )
            bgslabs = prepare_bg_slabs(quad[..., :3])
            warp_aux = None
            n_slots = 1
            if cfg.mode_spec.warp_p > 0.0:
                # Staged on host: impl="xla" keeps both the composition and
                # the big-field aux solve in XLA (the production "pallas"
                # dial would interpret-compose on the host here — slow, and
                # irrelevant: the same bank+aux feed both sides).
                bank, warp_aux = warpgen.make_bank_and_aux(
                    root_key(3), jnp.int32(0), cfg, impl="xla"
                )
                n_slots = warpgen.bank_size(cfg)
            scenes = sample_scene_batch(
                root_key(3), jnp.arange(4), cfg, n_warp_slots=n_slots
            )
            scenes = jax.tree.map(np.asarray, scenes)
            slabs = np.asarray(slabs)
            bgslabs = np.asarray(bgslabs)
            if warp_aux is not None:
                warp_aux = jax.tree.map(np.asarray, warp_aux)
        src_hw = (cfg.height, cfg.width)

        # ---- 1: compiled Mosaic (TPU) vs interpreter (CPU) ----
        out_tpu = _retry(lambda: _fused_outputs(
            scenes, slabs, bgslabs, src_hw, cfg, warp_aux, tpu, False
        ))
        out_cpu = _fused_outputs(
            scenes, slabs, bgslabs, src_hw, cfg, warp_aux, cpu, True
        )
        dflow = np.abs(out_tpu[2] - out_cpu[2])
        dimg = max(
            (np.abs(out_tpu[i] - out_cpu[i]) >= 1.0).mean() for i in (0, 1)
        )
        dimg2 = max(
            (np.abs(out_tpu[i] - out_cpu[i]) >= 2.0).mean() for i in (0, 1)
        )
        ok1 = (
            float(np.median(dflow)) < 1e-4
            and (dflow > 0.01).mean() < 1e-3
            and dimg < 0.01
            and dimg2 < 1e-4
        )
        res["mosaic_vs_interpret"] = {
            "flow_median": float(np.median(dflow)),
            "flow_frac_gt_0.01": float((dflow > 0.01).mean()),
            "img_frac_ge_1": float(dimg),
            "img_frac_ge_2": float(dimg2),
            "ok": bool(ok1),
        }

        # ---- 2: fused vs windowed, both on TPU ----
        outs = {}
        for up in ("never", "always"):
            c2 = flowgen.DataGenConfig(
                mode=mode, batch_size=4, seed=3, use_pallas=up
            )
            fn = flowgen.make_generate_fn(c2)
            outs[up] = _retry(lambda: {
                k: np.asarray(v)
                for k, v in fn(root_key(3), jnp.int32(1), atlas).items()
            })
        dflow2 = np.abs(outs["never"]["flow0"] - outs["always"]["flow0"])
        dmed = max(
            float(np.median(np.abs(outs["never"][k] - outs["always"][k])))
            for k in ("image0", "image1")
        )
        dbig = max(
            (np.abs(outs["never"][k] - outs["always"][k]) >= 4.0).mean()
            for k in ("image0", "image1")
        )
        warped = cfg.mode_spec.warp_p > 0.0
        if warped:
            f2 = float(np.median(dflow2))
            okf = f2 < 1e-3 and (dflow2 > 0.1).mean() < 0.02
        else:
            f2 = float(dflow2.max())
            okf = f2 == 0.0
        # Flow gates (identical exact coverage math through two code paths);
        # the image stats bound the residual distribution between the two
        # (both reflect-exact since round 4) resampling chains: the fused
        # path's two-pass shear interpolation + frame rounding vs the
        # windowed path's point-wise quad gathers. tests/test_fused.py's
        # fused-vs-ideal bounds pin the megakernel's own fidelity.
        ok2 = okf and dmed <= 1.0
        res["fused_vs_windowed"] = {
            "flow_dev": f2,
            "img_median": dmed,
            "img_frac_ge_4_informational": float(dbig),
            "ok": bool(ok2),
        }

        ok = ok1 and ok2
        failures += 0 if ok else 1
        results[str(mode)] = {**res, "ok": bool(ok)}
        print(
            f"mode {mode}: mosaic-vs-interp flow_med "
            f"{res['mosaic_vs_interpret']['flow_median']:.1e} "
            f"img>=1 {res['mosaic_vs_interpret']['img_frac_ge_1']:.2e} "
            f"{'OK' if ok1 else 'FAIL'} | fused-vs-windowed flow {f2:.1e} "
            f"img_med {dmed:.1f} img>=4 {dbig:.2e} "
            f"{'OK' if ok2 else 'FAIL'}",
            flush=True,
        )
        if json_out:
            _write_json(results)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
