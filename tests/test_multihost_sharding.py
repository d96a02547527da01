"""Process-sharded loading: disjoint coverage and batch-count uniformity."""

import numpy as np

from vae_channel_dynamics_tpu.data import SyntheticImageDataset, create_dataloader


def test_process_shards_are_disjoint_and_cover():
    ds = SyntheticImageDataset("noise", 20, 8, seed=0)
    seen = []
    for p in range(4):
        loader = create_dataloader(
            ds, batch_size=2, shuffle=True, seed=7,
            shard_index=p, num_shards=4,
        )
        order = loader._order()
        seen.append(set(order.tolist()))
        assert len(order) == 5
    union = set().union(*seen)
    assert union == set(range(20))
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (seen[i] & seen[j])


def test_shards_share_epoch_permutation():
    """All processes must derive shards from the SAME seeded permutation so
    coverage holds per epoch."""
    ds = SyntheticImageDataset("noise", 16, 8, seed=0)
    l0 = create_dataloader(ds, 2, shuffle=True, seed=3, shard_index=0, num_shards=2)
    l1 = create_dataloader(ds, 2, shuffle=True, seed=3, shard_index=1, num_shards=2)
    o0, o1 = l0._order(), l1._order()
    # interleave reconstructs the full permutation
    full = np.empty(16, np.int64)
    full[0::2], full[1::2] = o0, o1
    assert set(full.tolist()) == set(range(16))


def test_streaming_shard_strides():
    from vae_channel_dynamics_tpu.data.pipeline import (
        DataLoader,
        IterableTransformedDataset,
        get_transform,
    )

    class Stream:
        def __iter__(self):
            for i in range(10):
                yield {"image": np.full((8, 8, 3), i / 10.0, np.float32)}

    ds = IterableTransformedDataset(Stream(), "image", get_transform(8))
    l0 = DataLoader(ds, batch_size=2, shuffle=False, shard_index=0, num_shards=2)
    batches = list(l0)
    total = sum(b["pixel_values"].shape[0] for b in batches)
    assert total == 5  # every other record
