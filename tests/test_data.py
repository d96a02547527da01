"""Data pipeline: transform parity, synthetic datasets, loader collate."""

import numpy as np
import pytest
from PIL import Image

from vae_channel_dynamics_tpu.data import (
    SyntheticImageDataset,
    create_dataloader,
    get_transform,
    load_and_preprocess_dataset,
)
from vae_channel_dynamics_tpu.data.synthetic import parse_synthetic_name


def test_transform_range_and_shape():
    t = get_transform(32)
    img = Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    )
    out = t(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_transform_shorter_side_resize():
    """Resize targets the shorter side, then center crop (torchvision
    T.Resize(int) semantics, data_utils.py:25-26)."""
    t = get_transform(16)
    tall = Image.fromarray(np.full((64, 32, 3), 128, np.uint8))
    assert t(tall).shape == (16, 16, 3)
    wide = Image.fromarray(np.full((32, 64, 3), 128, np.uint8))
    assert t(wide).shape == (16, 16, 3)


def test_transform_grayscale_to_rgb():
    t = get_transform(8)
    gray = Image.fromarray(np.full((16, 16), 200, np.uint8), mode="L")
    out = t(gray)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, (200 / 255.0 - 0.5) / 0.5, atol=1e-6)


def test_transform_value_parity():
    """Pixel value mapping: uint8 v -> (v/255 - 0.5)/0.5."""
    t = get_transform(4)
    img = Image.fromarray(np.full((4, 4, 3), 255, np.uint8))
    np.testing.assert_allclose(t(img), 1.0, atol=1e-6)
    img0 = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
    np.testing.assert_allclose(t(img0), -1.0, atol=1e-6)


def test_parse_synthetic_name():
    assert parse_synthetic_name("synthetic://shapes?num_samples=64") == {
        "kind": "shapes",
        "num_samples": "64",
    }
    assert parse_synthetic_name("synthetic/noise")["kind"] == "noise"
    assert parse_synthetic_name("uoft-cs/cifar10") is None


def test_synthetic_deterministic():
    a = SyntheticImageDataset("shapes", 8, 32, seed=1)[3]["pixel_values"]
    b = SyntheticImageDataset("shapes", 8, 32, seed=1)[3]["pixel_values"]
    np.testing.assert_array_equal(a, b)
    c = SyntheticImageDataset("shapes", 8, 32, seed=2)[3]["pixel_values"]
    assert not np.array_equal(a, c)
    # splits differ
    d = SyntheticImageDataset("shapes", 8, 32, seed=1, split="test")[3]["pixel_values"]
    assert not np.array_equal(a, d)


def test_load_synthetic_dataset():
    ds = load_and_preprocess_dataset(
        "synthetic://gradients", resolution=16, max_samples=10
    )
    assert len(ds) == 10
    item = ds[0]["pixel_values"]
    assert item.shape == (16, 16, 3)
    assert item.dtype == np.float32


def test_load_image_folder(tmp_path):
    for i in range(5):
        arr = np.full((20, 20, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    ds = load_and_preprocess_dataset(str(tmp_path), resolution=8, max_samples=3)
    assert len(ds) == 3
    assert ds[0]["pixel_values"].shape == (8, 8, 3)


def test_load_unreachable_raises_without_fallback(monkeypatch):
    monkeypatch.delenv("VCD_DATA_FALLBACK", raising=False)
    with pytest.raises(Exception):
        load_and_preprocess_dataset("definitely/not-a-dataset", resolution=8)


def test_load_unreachable_synthetic_fallback(monkeypatch):
    monkeypatch.setenv("VCD_DATA_FALLBACK", "synthetic")
    ds = load_and_preprocess_dataset(
        "definitely/not-a-dataset", resolution=8, max_samples=4
    )
    assert len(ds) == 4


def test_dataloader_batching_and_shuffle():
    ds = SyntheticImageDataset("noise", 10, 8, seed=0)
    loader = create_dataloader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["pixel_values"].shape == (4, 8, 8, 3)
    assert batches[2]["pixel_values"].shape == (2, 8, 8, 3)  # remainder kept
    # epoch reshuffle changes order
    flat1 = np.concatenate([b["pixel_values"] for b in batches])
    flat2 = np.concatenate([b["pixel_values"] for b in loader])
    assert flat1.shape == flat2.shape
    assert not np.array_equal(flat1, flat2)
    # but the multiset of samples is identical
    assert np.allclose(np.sort(flat1.ravel()), np.sort(flat2.ravel()))


def test_dataloader_drops_bad_items():
    class Flaky:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i % 2 == 0:
                raise ValueError("corrupt record")
            return {"pixel_values": np.zeros((4, 4, 3), np.float32)}

    loader = create_dataloader(Flaky(), batch_size=2, shuffle=False)
    batches = list(loader)
    # indices (0,1): one good; (2,3): one good; (4,5): one good
    assert all(b is not None and b["pixel_values"].shape[0] == 1 for b in batches)


def test_dataloader_fully_bad_batch_is_none():
    class AllBad:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise ValueError("corrupt")

    loader = create_dataloader(AllBad(), batch_size=2, shuffle=False)
    assert list(loader) == [None]


def test_dataloader_iter_batches_index_skip():
    """iter_batches(start_batch=k) is the O(1) resume fast-forward: it must
    yield exactly the tail of the epoch __iter__ would produce, WITHOUT
    touching (decoding) any skipped index (training/loop.py resume path)."""

    class Counting:
        def __init__(self, n):
            self.n = n
            self.accessed = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.accessed.append(int(i))
            rng = np.random.default_rng(i)
            return {
                "pixel_values": rng.normal(size=(4, 4, 3)).astype(np.float32)
            }

    full_ds, skip_ds = Counting(22), Counting(22)
    kwargs = dict(batch_size=4, shuffle=True, seed=7)
    full = list(create_dataloader(full_ds, **kwargs))
    resumed = list(
        create_dataloader(skip_ds, **kwargs).iter_batches(start_batch=3)
    )
    assert len(full) == 6 and len(resumed) == 3
    for a, b in zip(full[3:], resumed):
        np.testing.assert_array_equal(a["pixel_values"], b["pixel_values"])
    # no skipped index was ever fetched: the skip is index-level, not decode
    assert len(skip_ds.accessed) == 22 - 3 * 4
    assert set(skip_ds.accessed) == set(full_ds.accessed[3 * 4:])
    # threaded path takes the same fast-forward
    threaded_ds = Counting(22)
    threaded = list(
        create_dataloader(threaded_ds, num_workers=2, **kwargs).iter_batches(
            start_batch=3
        )
    )
    assert len(threaded_ds.accessed) == 22 - 3 * 4
    for a, b in zip(resumed, threaded):
        np.testing.assert_array_equal(a["pixel_values"], b["pixel_values"])
    # skipping past the epoch end yields nothing (and doesn't error)
    assert list(create_dataloader(Counting(22), **kwargs).iter_batches(99)) == []


def test_dataloader_iter_batches_rejects_streaming_skip():
    def stream():
        yield {"pixel_values": np.zeros((4, 4, 3), np.float32)}

    class Stream:
        def __iter__(self):
            return stream()

    loader = create_dataloader(Stream(), batch_size=1, shuffle=False)
    with pytest.raises(TypeError):
        next(loader.iter_batches(start_batch=1))


def test_dataloader_threaded_matches_sync():
    ds = SyntheticImageDataset("gradients", 9, 8, seed=3)
    sync = list(create_dataloader(ds, batch_size=4, shuffle=False))
    threaded = list(
        create_dataloader(ds, batch_size=4, shuffle=False, num_workers=2)
    )
    assert len(sync) == len(threaded)
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["pixel_values"], b["pixel_values"])


def test_prefetcher_close_unblocks_worker_on_early_exit():
    """Breaking out of prefetched iteration (e.g. max_train_steps) must not
    leak a worker thread parked on a full queue (training/loop.py closes the
    Prefetcher on early break)."""
    import threading
    import time

    from vae_channel_dynamics_tpu.data.pipeline import Prefetcher

    source_closed = threading.Event()

    def slow_source():
        try:
            for i in range(1000):
                yield {"x": np.full((2, 2), i, dtype=np.float32)}
        finally:
            source_closed.set()

    pf = Prefetcher(slow_source(), depth=2)
    # consume a couple of items, then abandon the iterator mid-stream
    first = next(pf)
    assert first["x"].shape == (2, 2)
    next(pf)
    assert pf._thread.is_alive()  # worker is parked on the full queue
    pf.close()
    assert not pf._thread.is_alive()
    assert source_closed.wait(timeout=5.0)
    # idempotent, and iteration after close terminates cleanly
    pf.close()
    with pytest.raises(StopIteration):
        next(pf)


def test_prefetcher_normal_exhaustion_still_terminates():
    from vae_channel_dynamics_tpu.data.pipeline import Prefetcher

    pf = Prefetcher(iter([{"x": np.zeros(1)}] * 3), depth=2)
    assert len(list(pf)) == 3
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()
    pf.close()


def test_transfer_dtype_uint8_roundtrip():
    """uint8 transfer batches dequantize on device to exactly the values the
    reference pipeline produces (uint8-resize -> v/127.5 - 1)."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.data.pipeline import quantize_uint8
    from vae_channel_dynamics_tpu.training.step import dequantize_pixels

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (8, 8, 3), np.uint8)
    as_float = src.astype(np.float32) / 127.5 - 1.0  # reference normalize
    q = quantize_uint8(as_float)
    np.testing.assert_array_equal(q, src)  # exact roundtrip for uint8 sources
    deq = np.asarray(dequantize_pixels(jnp.asarray(q)))
    np.testing.assert_allclose(deq, as_float, atol=1e-6)
    # float batches pass through untouched
    passthrough = np.asarray(dequantize_pixels(jnp.asarray(as_float)))
    np.testing.assert_array_equal(passthrough, as_float)


def test_transfer_dtype_uint8_dataset_and_loader():
    from vae_channel_dynamics_tpu.data.pipeline import (
        DataLoader,
        load_and_preprocess_dataset,
    )

    ds = load_and_preprocess_dataset(
        "synthetic://shapes?num_samples=8",
        resolution=16,
        transfer_dtype="uint8",
    )
    item = ds[0]
    assert item["pixel_values"].dtype == np.uint8
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    assert batch["pixel_values"].dtype == np.uint8
    assert batch["pixel_values"].shape == (4, 16, 16, 3)

    with pytest.raises(ValueError, match="transfer_dtype"):
        load_and_preprocess_dataset(
            "synthetic://shapes?num_samples=8",
            resolution=16,
            transfer_dtype="int4",
        )


def test_uint8_train_step_matches_prequantized_float():
    """A uint8 batch must produce the same loss as the float batch holding
    the dequantized values (tight tolerance: XLA may fuse the on-device
    dequantize into downstream ops with different rounding association)."""
    import jax
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.data.pipeline import quantize_uint8
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    rng = np.random.default_rng(1)
    floats = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    q = quantize_uint8(floats)
    deq = q.astype(np.float32) / 127.5 - 1.0
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-4, warmup_steps=1, max_train_steps=10)
    mask = np.ones(2, np.float32)
    losses = {}
    for name, batch in (("uint8", q), ("float", deq)):
        state = TrainState.create(params, tx, stats_acc={})
        step = make_train_step(module, tx, 1e-6, donate=False)
        _, metrics, _ = step(
            state, {"pixel_values": batch}, mask, jax.random.PRNGKey(2)
        )
        losses[name] = float(jax.device_get(metrics["train_loss_step"]))
    np.testing.assert_allclose(losses["uint8"], losses["float"], rtol=1e-6)


def test_tar_shard_dataset(tmp_path):
    """WebDataset-style tar shards resolve as a dataset; bytes flow through
    the transform (and the native decoder when enabled), including from
    concurrent loader workers."""
    import io
    import tarfile

    from PIL import Image

    from vae_channel_dynamics_tpu.data.pipeline import (
        DataLoader,
        load_and_preprocess_dataset,
    )

    rng = np.random.default_rng(0)
    originals = {}
    for shard in range(2):
        with tarfile.open(tmp_path / f"shard-{shard}.tar", "w") as tf:
            for i in range(5):
                arr = rng.integers(0, 256, (40, 48, 3), np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"img_{shard}_{i}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                originals[f"{shard}_{i}"] = arr

    ds = load_and_preprocess_dataset(str(tmp_path), resolution=16)
    assert len(ds) == 10
    item = ds[0]
    assert item["pixel_values"].shape == (16, 16, 3)

    # multi-worker read path (per-thread tar handles)
    loader = DataLoader(ds, batch_size=4, num_workers=2, shuffle=False)
    seen = 0
    for batch in loader:
        if batch is not None:
            seen += batch["pixel_values"].shape[0]
            assert np.all(np.isfinite(batch["pixel_values"]))
    assert seen == 10

    # single .tar path + max_samples truncation
    ds_one = load_and_preprocess_dataset(
        str(tmp_path / "shard-0.tar"), resolution=16, max_samples=3
    )
    assert len(ds_one) == 3


def test_prefetcher_propagates_source_errors():
    """A crashed source iterator must surface as an error to the consumer,
    not masquerade as a clean end-of-epoch (the trainer would otherwise
    checkpoint a silently truncated run and keep going)."""
    import pytest

    from vae_channel_dynamics_tpu.data.pipeline import Prefetcher

    def broken_source():
        yield {"x": np.zeros(1)}
        raise OSError("disk vanished mid-epoch")

    pf = Prefetcher(broken_source(), depth=2)
    got = [next(pf)]
    with pytest.raises(RuntimeError, match="source iterator failed") as ei:
        while True:
            got.append(next(pf))
    assert isinstance(ei.value.__cause__, OSError)
    assert len(got) == 1
    pf.close()


def test_sharded_loader_length_and_drop_last():
    """A sharded DataLoader's __len__ counts ITS shard's batches, and
    drop_last drops the per-shard partial batch — counting the full dataset
    made sharded loaders iterate num_shards x too many batches (trailing
    ones collated to None) and leak partial batches past drop_last."""
    from vae_channel_dynamics_tpu.data.pipeline import DataLoader
    from vae_channel_dynamics_tpu.data.synthetic import SyntheticImageDataset

    ds = SyntheticImageDataset(num_samples=101, resolution=8)
    for shard in range(4):
        loader = DataLoader(
            ds, batch_size=8, shuffle=False, shard_index=shard,
            num_shards=4, drop_last=True,
        )
        # shards 0-3 hold 26/25/25/25 items -> 3 full batches of 8 each
        assert len(loader) == 3
        batches = [b for b in loader.iter_batches() if b is not None]
        assert len(batches) == 3
        assert all(b["pixel_values"].shape[0] == 8 for b in batches)
    # without drop_last the partial batch survives but nothing beyond it
    loader = DataLoader(
        ds, batch_size=8, shuffle=False, shard_index=0, num_shards=4,
        drop_last=False,
    )
    assert len(loader) == 4
    batches = [b for b in loader.iter_batches() if b is not None]
    assert len(batches) == 4
    assert batches[-1]["pixel_values"].shape[0] == 2  # 26 = 3*8 + 2


def test_resize_matches_torchvision_truncation():
    """Shorter-side resize computes the long side with int() truncation
    (torchvision T.Resize semantics, the reference transform) — round()
    shifts the center crop by 1px whenever the scaled long side has
    fraction >= 0.5 (e.g. 499x333 -> 383, not 384)."""
    from PIL import Image

    from vae_channel_dynamics_tpu.data.pipeline import get_transform

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (333, 499, 3), np.uint8)
    )
    out = get_transform(256)(img)
    assert out.shape == (256, 256, 3)
    # oracle: exactly torchvision's arithmetic, then center crop
    new_w = int(256 * 499 / 333)  # 383 (round() would give 384)
    ref = img.resize((new_w, 256), Image.BILINEAR)
    left = (new_w - 256) // 2
    ref = ref.crop((left, 0, left + 256, 256))
    ref_arr = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(out, ref_arr)


def test_synthetic_split_seed_is_process_stable():
    """Non-standard split names salt the seed with a STABLE hash (crc32),
    not Python's per-process-salted hash() — multi-host runs must generate
    identical content for the same split/index on every process."""
    import zlib

    from vae_channel_dynamics_tpu.data.synthetic import SyntheticImageDataset

    ds = SyntheticImageDataset(num_samples=4, resolution=8, split="val")
    expected = 0 + zlib.crc32(b"val") % 100003
    assert ds.seed == expected
