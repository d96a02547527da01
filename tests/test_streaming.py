"""Streaming (iterable) dataset support in the loader."""

import numpy as np

from vae_channel_dynamics_tpu.data.pipeline import (
    DataLoader,
    IterableTransformedDataset,
    get_transform,
)


class _FakeStream:
    """Minimal iterable source yielding raw float arrays."""

    def __init__(self, n):
        self.n = n

    def __iter__(self):
        for i in range(self.n):
            yield {"image": np.full((8, 8, 3), (i % 3) / 3.0, np.float32)}


def test_iterable_dataset_batches():
    ds = IterableTransformedDataset(_FakeStream(7), "image", get_transform(8))
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    assert loader.is_iterable
    batches = list(loader)
    assert [b["pixel_values"].shape[0] for b in batches] == [3, 3, 1]
    assert batches[0]["pixel_values"].shape == (3, 8, 8, 3)


def test_iterable_dataset_has_no_len():
    ds = IterableTransformedDataset(_FakeStream(4), "image", get_transform(8))
    loader = DataLoader(ds, batch_size=2)
    try:
        len(loader)
        assert False, "expected TypeError"
    except TypeError:
        pass


def test_iterable_drops_bad_records():
    class BadStream:
        def __iter__(self):
            yield {"image": np.full((8, 8, 3), 0.5, np.float32)}
            yield {"wrong_key": None}
            yield {"image": np.full((8, 8, 3), 0.5, np.float32)}

    ds = IterableTransformedDataset(BadStream(), "image", get_transform(8))
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    batches = list(loader)
    total = sum(b["pixel_values"].shape[0] for b in batches)
    assert total == 2


def test_streaming_flag_wraps_every_map_style_source(tmp_path):
    """data.streaming must be honored for ALL source kinds, not only HF
    loads: synthetic://, image folders, and tar shards resolve map-style
    and get the iterable StreamingView, so a streaming config actually
    exercises streaming semantics instead of silently training map-style."""
    from PIL import Image

    from vae_channel_dynamics_tpu.data.pipeline import (
        load_and_preprocess_dataset,
    )

    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        Image.new("RGB", (16, 16), (i * 40, 0, 0)).save(
            folder / f"{i}.png"
        )

    for name in ("synthetic://shapes?num_samples=4", str(folder)):
        ds = load_and_preprocess_dataset(name, resolution=16, streaming=True)
        try:
            len(ds)
            assert False, f"{name}: streaming=True returned a sized dataset"
        except TypeError:
            pass
        items = list(ds)
        assert len(items) >= 3
        assert items[0]["pixel_values"].shape == (16, 16, 3)

    # uint8 transfer composes with streaming (quantize view outside)
    ds = load_and_preprocess_dataset(
        "synthetic://shapes?num_samples=4", resolution=16, streaming=True,
        transfer_dtype="uint8",
    )
    try:
        len(ds)
        assert False, "uint8 streaming dataset has a length"
    except TypeError:
        pass
    assert next(iter(ds))["pixel_values"].dtype == np.uint8
