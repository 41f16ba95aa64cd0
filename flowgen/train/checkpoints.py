"""Training checkpoint/resume via Orbax.

The reference has no checkpointing at all (SURVEY.md §5: Caffe snapshots the
net, the data stream cannot be resumed because RNG consumption interleaves
with thread scheduling). Here the data stream is a pure function of
``(seed, step)``, so checkpointing the full pipeline is exactly: model params
+ optimizer state + the step counter."""

from __future__ import annotations

from typing import Any, Dict, Optional


def save_checkpoint(path: str, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            f"{path}/step_{step:08d}",
            {"step": step, "params": params, "opt_state": opt_state},
            force=True,
        )


def restore_checkpoint(path: str, step: Optional[int] = None) -> Dict[str, Any]:
    """Restore the latest (or a specific) checkpoint; the returned ``step``
    both resumes the optimizer schedule and seeks the data stream
    (``Generator(start_step=...)`` / ``generate_batch(step=...)``)."""
    import os

    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(f"{path}/step_{step:08d}")
