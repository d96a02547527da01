"""Load-test a running serving daemon: sustained closed-loop clients.

``python -m vae_channel_dynamics_tpu.tools.serving_bench
--url http://127.0.0.1:8400 [--streams 32] [--duration_s 20]
[--resolution 256] [--op reconstruct]``

Each stream issues back-to-back requests (closed loop, npy fast path) for
``duration_s``; 503 responses are counted and retried after the server's
Retry-After — the intended client behavior against the daemon's load
shedding. Prints one JSON line: ok-req/s, latency percentiles, shed
count, and the server's own /stats deltas.

The reproducible source of the serving numbers in PERF.md.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serving daemon load test.")
    p.add_argument("--url", default="http://127.0.0.1:8400")
    p.add_argument("--streams", type=int, default=32)
    p.add_argument("--duration_s", type=float, default=20.0)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--op", default="reconstruct",
                   choices=["reconstruct", "encode"])
    p.add_argument("--timeout_s", type=float, default=120.0)
    return p.parse_args(argv)


def _get_stats(url: str, timeout: float):
    with urllib.request.urlopen(f"{url}/stats", timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None) -> int:
    args = parse_args(argv)
    rng = np.random.default_rng(0)
    pixels = rng.uniform(
        -1, 1, (args.resolution, args.resolution, 3)
    ).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pixels)
    body = buf.getvalue()
    endpoint = f"{args.url}/{args.op}?format=npy"

    lock = threading.Lock()
    latencies: list[float] = []
    ok = [0]
    shed = [0]
    errors = [0]
    stop_at = time.monotonic() + args.duration_s

    def stream():
        while time.monotonic() < stop_at:
            t0 = time.perf_counter()
            req = urllib.request.Request(endpoint, data=body, method="POST")
            try:
                with urllib.request.urlopen(
                    req, timeout=args.timeout_s
                ) as resp:
                    resp.read()
                with lock:
                    ok[0] += 1
                    latencies.append(time.perf_counter() - t0)
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    with lock:
                        shed[0] += 1
                    time.sleep(float(e.headers.get("Retry-After", 1)))
                else:
                    with lock:
                        errors[0] += 1
            except Exception:  # noqa: BLE001 — counted, keep hammering
                with lock:
                    errors[0] += 1

    before = _get_stats(args.url, args.timeout_s)
    threads = [
        threading.Thread(target=stream, daemon=True)
        for _ in range(args.streams)
    ]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=args.duration_s + args.timeout_s)
    elapsed = time.monotonic() - t_start
    after = _get_stats(args.url, args.timeout_s)

    latencies.sort()

    def pct(p):
        return (
            round(latencies[min(len(latencies) - 1,
                                int(p * len(latencies)))] * 1e3, 1)
            if latencies else None
        )

    result = {
        "metric": f"serving_{args.op}_ok_req_per_sec@{args.resolution}px",
        "value": round(ok[0] / elapsed, 2),
        "unit": "req/s",
        "streams": args.streams,
        "duration_s": round(elapsed, 1),
        "ok": ok[0],
        "shed_503": shed[0],
        "errors": errors[0],
        "latency_ms_p50": pct(0.50),
        "latency_ms_p95": pct(0.95),
        "latency_ms_p99": pct(0.99),
        "server_batch_calls": after["batch_calls"] - before["batch_calls"],
        "server_batching_ratio": round(
            (after["items_batched"] - before["items_batched"])
            / max(1, after["batch_calls"] - before["batch_calls"]),
            2,
        ),
        "server_rejected_overload": (
            after.get("rejected_overload", 0)
            - before.get("rejected_overload", 0)
        ),
    }
    print(json.dumps(result))
    return 0 if errors[0] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
