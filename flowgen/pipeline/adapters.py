"""Framework adapters for consuming the generated stream.

The reference could only feed Caffe (blob tops wired by
src/caffe/layers/data_generation_layer.cpp:36-299 + train.prototxt). These
adapters make the stream consumable from today's input pipelines:

* :func:`as_numpy_iterator` / :func:`as_torch_iterator` — plain iterators.
* :class:`FlowStepDataSource` — a Grain-protocol random-access source
  (``__len__`` + ``__getitem__``). Because every batch is a pure function of
  ``(seed, step)`` (pipeline/generator.py docstring), random access is exact
  and free — no epoch bookkeeping, and Grain's determinism/checkpointing
  contract is satisfied by construction.
* :func:`torch_iterable_dataset` — a ``torch.utils.data.IterableDataset``
  whose multi-worker sharding strides the step counter, so
  ``DataLoader(ds, batch_size=None, num_workers=N)`` yields the same stream
  content for any N (interleaved, each step exactly once).
* :func:`as_tfdata` — ``tf.data.Dataset`` wrapper (gated on tensorflow being
  importable; it is not a dependency).

All adapters emit full device-generated *batches* (the device step is the
efficient unit); set ``batch_size=None`` in DataLoader / ``unbatch()`` in
tf.data to re-chunk.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..config import DataGenConfig
from .generator import Generator, make_generate_fn


def as_numpy_iterator(gen: Generator) -> Iterator[dict]:
    """Yield batches as host numpy dicts."""
    gen.start()
    while True:
        yield {k: np.asarray(v) for k, v in gen.retrieve_batch().items()}


def as_torch_iterator(gen: Generator, device: str = "cpu") -> Iterator[dict]:
    """Yield batches as torch tensors. Images float32 0..255 (apply your own
    normalization), flow float32 pixels, layout per cfg (nhwc/nchw)."""
    import torch

    for batch in as_numpy_iterator(gen):
        yield {k: torch.from_numpy(v).to(device) for k, v in batch.items()}


def caffe_style_tops(batch):
    """Split a batch dict into the reference layer's three tops in order:
    (first-image, second-image, optical-flow-groundtruth)
    (train.prototxt:5-7)."""
    return batch["image0"], batch["image1"], batch["flow0"]


class FlowStepDataSource:
    """Grain-style random-access data source over the deterministic stream.

    Implements the ``grain.RandomAccessDataSource`` protocol (``__len__`` /
    ``__getitem__``) without importing grain: item ``i`` is the full batch of
    step ``start_step + i`` as a numpy dict, recomputable in any order from
    ``(cfg.seed, step)`` alone. Wrap directly::

        source = FlowStepDataSource(cfg, num_steps=10_000)
        loader = grain.MapDataset.source(source)  # or grain.DataLoader(...)

    ``num_steps`` only bounds ``__len__`` (the stream itself is unbounded);
    pass what your sampler wants as an epoch.
    """

    def __init__(self, cfg: DataGenConfig, num_steps: int,
                 atlas: Optional[np.ndarray] = None, start_step: int = 0):
        if num_steps <= 0:
            raise ValueError("num_steps must be positive")
        self._cfg = cfg
        self._atlas = atlas
        self._start = start_step
        self._n = num_steps
        self._fn = None  # built lazily (and per-process under forked workers)

    def _generate(self, step: int) -> dict:
        if self._fn is None:
            import jax.numpy as jnp

            from .. import texture_io
            from ..random.streams import root_key

            atlas = self._atlas
            if atlas is None:
                atlas = texture_io.atlas_for_config(self._cfg)
            self._fn = make_generate_fn(self._cfg)
            self._root = root_key(self._cfg.seed)
            self._jnp = jnp
            self._packed_atlas = atlas
        out = self._fn(self._root, self._jnp.int32(step), self._packed_atlas)
        return {k: np.asarray(v) for k, v in out.items()}

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> dict:
        if not (-self._n <= i < self._n):
            raise IndexError(i)
        return self._generate(self._start + (i % self._n))


def _worker_steps(start_step: int, worker_id: int, num_workers: int
                  ) -> Iterator[int]:
    """Unbounded step schedule for one worker: steps are strided so the union
    over workers enumerates every step exactly once regardless of N."""
    step = start_step + worker_id
    stride = max(1, num_workers)
    while True:
        yield step
        step += stride


def torch_iterable_dataset(cfg: DataGenConfig,
                           atlas: Optional[np.ndarray] = None,
                           start_step: int = 0, device: str = "cpu"):
    """``torch.utils.data.IterableDataset`` over the stream (one item = one
    generated batch of ``cfg.batch_size``; use ``DataLoader(ds,
    batch_size=None)``). Under ``num_workers=N`` each worker generates a
    strided slice of the step counter (worker w: steps w, w+N, ...), so the
    loader's interleaved output covers each step exactly once — exactness
    comes from the pure-(seed, step) stream, not coordination.

    ``num_workers=0`` is the recommended mode when generating on an
    accelerator (the device step pipeline already prefetches; forked workers
    would each initialize their own JAX backend)."""
    import torch
    from torch.utils import data as torch_data

    class _FlowIterable(torch_data.IterableDataset):
        def __iter__(self):
            source = FlowStepDataSource(
                cfg, num_steps=1, atlas=atlas, start_step=0
            )
            info = torch_data.get_worker_info()
            wid = info.id if info is not None else 0
            nw = info.num_workers if info is not None else 1
            for step in _worker_steps(start_step, wid, nw):
                batch = source._generate(step)
                # jax->numpy views are read-only; torch wants writable memory.
                yield {
                    k: torch.from_numpy(np.array(v)).to(device)
                    for k, v in batch.items()
                }

    return _FlowIterable()


def as_tfdata(cfg: DataGenConfig, atlas: Optional[np.ndarray] = None,
              start_step: int = 0):
    """``tf.data.Dataset`` of batch dicts via ``from_generator``. Requires
    tensorflow (not a flowgen dependency); raises ImportError otherwise."""
    import tensorflow as tf  # noqa: F401 — optional consumer dependency

    source = FlowStepDataSource(cfg, num_steps=1, atlas=atlas)
    probe = source._generate(start_step)
    spec = {
        k: tf.TensorSpec(shape=v.shape, dtype=v.dtype) for k, v in probe.items()
    }

    def gen():
        step = start_step
        while True:
            yield source._generate(step)
            step += 1

    return tf.data.Dataset.from_generator(gen, output_signature=spec)
