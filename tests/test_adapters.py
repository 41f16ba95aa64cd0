"""Input-pipeline adapter tests (flowgen/pipeline/adapters.py): Grain-style
random access matches the sequential stream, torch IterableDataset + worker
striding, caffe-style tops."""

import numpy as np
import pytest

import flowgen
from flowgen.pipeline import adapters

W, H = 128, 96


def _cfg(**kw):
    kw.setdefault("mode", 1)
    kw.setdefault("batch_size", 2)
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("seed", 5)
    return flowgen.DataGenConfig(**kw)


@pytest.fixture(scope="module")
def atlas():
    return flowgen.procedural_atlas(3, height=H, width=W)


@pytest.fixture(scope="module")
def stream_ref(atlas):
    """First three batches off the sequential Generator stream."""
    gen = flowgen.Generator(_cfg(), atlas=atlas, as_numpy=True).start()
    batches = [gen.retrieve_batch() for _ in range(3)]
    gen.stop()
    return batches


def test_datasource_random_access_matches_stream(atlas, stream_ref):
    src = adapters.FlowStepDataSource(_cfg(), num_steps=3, atlas=atlas)
    assert len(src) == 3
    # Out-of-order access returns the exact per-step batches.
    for i in (2, 0, 1):
        got = src[i]
        assert set(got) == set(stream_ref[i])
        for k in got:
            np.testing.assert_array_equal(got[k], stream_ref[i][k])
    with pytest.raises(IndexError):
        src[3]
    # Negative indexing, python-style.
    np.testing.assert_array_equal(src[-1]["flow0"], stream_ref[2]["flow0"])


def test_datasource_start_step_offset(atlas, stream_ref):
    src = adapters.FlowStepDataSource(
        _cfg(), num_steps=2, atlas=atlas, start_step=1
    )
    np.testing.assert_array_equal(src[0]["image0"], stream_ref[1]["image0"])


def test_worker_steps_partition():
    import itertools

    # Union over 3 workers enumerates each step exactly once from start_step.
    seen = sorted(
        itertools.chain.from_iterable(
            itertools.islice(adapters._worker_steps(10, w, 3), 4)
            for w in range(3)
        )
    )
    assert seen == list(range(10, 22))
    assert list(itertools.islice(adapters._worker_steps(0, 0, 1), 3)) == [0, 1, 2]


def test_torch_iterable_dataset(atlas, stream_ref):
    torch = pytest.importorskip("torch")
    from torch.utils.data import DataLoader

    ds = adapters.torch_iterable_dataset(_cfg(), atlas=atlas)
    loader = DataLoader(ds, batch_size=None, num_workers=0)
    it = iter(loader)
    first = next(it)
    assert isinstance(first["image0"], torch.Tensor)
    np.testing.assert_array_equal(first["image0"].numpy(),
                                  stream_ref[0]["image0"])
    np.testing.assert_array_equal(next(it)["flow0"].numpy(),
                                  stream_ref[1]["flow0"])


def test_caffe_style_tops(stream_ref):
    i0, i1, f0 = adapters.caffe_style_tops(stream_ref[0])
    assert i0.shape == i1.shape == (2, H, W, 3)
    assert f0.shape == (2, H, W, 2)


def test_as_tfdata_gated(atlas):
    tf = pytest.importorskip("tensorflow")
    ds = adapters.as_tfdata(_cfg(), atlas=atlas)
    batch = next(iter(ds.take(1)))
    assert batch["image0"].shape == (2, H, W, 3)
