"""Framework adapters for consuming the generated stream.

The reference could only feed Caffe (blob tops, train.prototxt). These
adapters make the stream consumable from anything: NumPy iterators for
tf.data/Grain-style input pipelines, and zero-ceremony PyTorch tensors for
torch training loops (torch is CPU-side here; batches transfer once).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .generator import Generator


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
