"""Host input-pipeline throughput: images/sec through the dataloader alone.

The device benchmark (bench.py) times device-resident synthetic batches; the
reference instead feeds training through a multiprocess pinned DataLoader
(src/data_utils.py:218-225). This tool measures what THIS framework's host
path sustains — JPEG decode + resize + center-crop + normalize at a target
resolution — for the PIL transform and the native C++ kernel
(csrc/preprocess.cpp), across worker-thread counts, so the loader's headroom
over the device's images/sec can be stated next to the device number
(PERF.md).

Usage:
    python -m vae_channel_dynamics_tpu.tools.loader_bench \
        [--resolution 256] [--num-images 256] [--src-size 512] \
        [--workers 0,2,4] [--batch-size 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def make_jpegs(root: str, n: int, size: int, quality: int = 90) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n):
        # low-frequency content so JPEG size/decode cost is photo-like
        base = rng.uniform(0, 255, (size // 8, size // 8, 3))
        img = Image.fromarray(base.astype("uint8"), "RGB").resize(
            (size, size), Image.BILINEAR
        )
        img.save(os.path.join(root, f"img_{i:05d}.jpg"), quality=quality)


def time_epoch(loader) -> tuple[float, int]:
    n_images = 0
    t0 = time.perf_counter()
    for batch in loader:
        if batch is None:
            continue
        n_images += batch["pixel_values"].shape[0]
    return time.perf_counter() - t0, n_images


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--num-images", type=int, default=256)
    parser.add_argument("--src-size", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=24)
    parser.add_argument("--workers", type=str, default="0,2,4")
    parser.add_argument("--image-dir", type=str, default=None,
                        help="existing image folder (skips JPEG generation)")
    args = parser.parse_args()

    from ..data.pipeline import DataLoader, load_and_preprocess_dataset

    tmp = None
    root = args.image_dir
    if root is None:
        tmp = tempfile.TemporaryDirectory(prefix="loader_bench_")
        root = tmp.name
        make_jpegs(root, args.num_images, args.src_size)

    results = {}
    for native in (False, True):
        label = "native" if native else "pil"
        os.environ["VCD_NATIVE_PREPROCESS"] = "1" if native else "0"
        if native:
            from ..data import native as native_mod

            if not native_mod.available():
                print(f"# {label}: native library unavailable, skipped",
                      file=sys.stderr)
                continue
        # dataset is rebuilt per variant: the transform binds the native
        # flag at construction
        dataset = load_and_preprocess_dataset(
            root, resolution=args.resolution
        )
        for workers in (int(w) for w in args.workers.split(",")):
            loader = DataLoader(
                dataset, batch_size=args.batch_size,
                num_workers=workers, shuffle=False,
            )
            time_epoch(loader)  # warm (page cache, thread pools)
            dt, n = time_epoch(loader)
            ips = n / dt
            results[f"{label}_w{workers}"] = round(ips, 1)
            print(
                f"# {label} workers={workers}: {ips:.1f} img/s "
                f"({n} images in {dt:.2f}s)",
                file=sys.stderr,
            )

    print(json.dumps({
        "metric": f"loader_images_per_sec@{args.resolution}px",
        "src_jpeg_px": args.src_size,
        "host_cores": os.cpu_count(),
        "results": results,
    }))
    if tmp is not None:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
