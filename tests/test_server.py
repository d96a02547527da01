"""HTTP serving daemon: endpoints, micro-batching, static-shape padding."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
from vae_channel_dynamics_tpu.server import MicroBatcher, VAEServer

RES = 32


@pytest.fixture(scope="module")
def server():
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(
        wrapper, resolution=RES, max_batch=4, max_wait_ms=40.0, port=0
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _png_bytes(seed=0, size=48):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (size, size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def _post(server, path, body):
    req = urllib.request.Request(_url(server, path), data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, dict(resp.headers), resp.read()


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["resolution"] == RES


def test_reconstruct_returns_png_and_mse(server):
    status, headers, body = _post(server, "/reconstruct", _png_bytes(1))
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    img = Image.open(io.BytesIO(body))
    assert img.size == (RES, RES)
    assert float(headers["X-VCD-MSE"]) >= 0.0


def test_reconstruct_deterministic_is_repeatable(server):
    body = _png_bytes(2)
    _, _, a = _post(server, "/reconstruct?deterministic=true", body)
    _, _, b = _post(server, "/reconstruct?deterministic=true", body)
    assert a == b


def test_encode_decode_roundtrip(server):
    status, headers, latents_npy = _post(server, "/encode", _png_bytes(3))
    assert status == 200
    z = np.load(io.BytesIO(latents_npy))
    assert z.shape == (RES // 2, RES // 2, 4)  # tiny config: one downsample
    status, headers, png = _post(server, "/decode", latents_npy)
    assert status == 200
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (RES, RES, 3)


def test_bad_input_is_a_client_error(server):
    req = urllib.request.Request(
        _url(server, "/decode"), data=b"garbage bytes", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


def test_unknown_route(server):
    req = urllib.request.Request(
        _url(server, "/nope"), data=b"x", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 404


def test_concurrent_http_requests_all_succeed(server):
    n = 6
    errors = []

    def fire(i):
        try:
            status, _, _ = _post(server, "/reconstruct", _png_bytes(10 + i))
            assert status == 200
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert server.stats()["requests"] >= n


def test_concurrent_submissions_coalesce(server):
    """Simultaneous same-kind submissions become fewer device calls. Driven
    at the batcher level with a barrier so the assertion is deterministic
    (the HTTP layer above adds timing jitter on a loaded 1-core host)."""
    rng = np.random.default_rng(0)
    pixels = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
    server.batcher.submit("reconstruct", pixels)  # warm the compile
    calls_before = server.batcher.batch_calls
    items_before = server.batcher.items_served
    n = 8
    barrier = threading.Barrier(n)
    errors = []

    def fire(i):
        try:
            barrier.wait(timeout=60)
            out = server.batcher.submit("reconstruct", pixels)
            assert out.shape == (RES, RES, 3)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    new_calls = server.batcher.batch_calls - calls_before
    assert server.batcher.items_served - items_before == n
    # max_batch=4 caps a single call; 8 simultaneous items need >= 2 calls
    # and coalescing must make it fewer than 8
    assert new_calls < n, (new_calls, n)


def test_microbatcher_groups_by_kind():
    seen = []

    def runner(kind, stacked):
        seen.append((kind, stacked.shape[0]))
        return stacked * 2

    mb = MicroBatcher(runner, max_batch=4, max_wait_ms=50.0)
    results = {}

    def submit(kind, value, key):
        results[key] = mb.submit(kind, np.full((2,), value))

    threads = [
        threading.Thread(target=submit, args=("a", 1.0, "a1")),
        threading.Thread(target=submit, args=("b", 2.0, "b1")),
        threading.Thread(target=submit, args=("a", 3.0, "a2")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    np.testing.assert_array_equal(results["a1"], 2.0)
    np.testing.assert_array_equal(results["b1"], 4.0)
    np.testing.assert_array_equal(results["a2"], 6.0)
    # kinds never mixed into one runner call
    assert all(kind in ("a", "b") for kind, _ in seen)
    mb.close()


def test_microbatcher_error_propagates():
    def runner(kind, stacked):
        raise ValueError("boom")

    mb = MicroBatcher(runner, max_batch=2, max_wait_ms=1.0)
    with pytest.raises(ValueError, match="boom"):
        mb.submit("x", np.zeros((1,)))
    mb.close()


def test_npy_fast_path(server):
    rng = np.random.default_rng(7)
    pixels = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pixels)
    status, headers, body = _post(
        server, "/reconstruct?format=npy", buf.getvalue()
    )
    assert status == 200
    assert headers["Content-Type"] == "application/octet-stream"
    out = np.load(io.BytesIO(body))
    assert out.shape == (RES, RES, 3)
    assert out.dtype == np.float32

    # wrong npy shape is a client error
    bad = io.BytesIO()
    np.save(bad, np.zeros((4, 4, 3), np.float32))
    req = urllib.request.Request(
        _url(server, "/reconstruct"), data=bad.getvalue(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


def test_mesh_serving_matches_single_device(server):
    """Under the 8-device conftest mesh the server shards padded batches
    over the data axis; results must match an unsharded forward exactly."""
    import jax

    assert server.mesh is not None  # conftest provides 8 CPU devices
    assert server.batcher.max_batch % len(jax.devices()) == 0
    rng = np.random.default_rng(11)
    pixels = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
    out = server.batcher.submit("reconstruct", pixels)
    ref_wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    ref = np.asarray(
        ref_wrapper.forward(pixels[None], sample_posterior=False)[
            "reconstruction"
        ]
    )[0]
    np.testing.assert_allclose(out, ref, atol=2e-5)


# --------------------------------------------------------------------------- #
# Overload hardening (round 3): 413 body cap, 503 shedding, shape guard
# --------------------------------------------------------------------------- #
def test_oversized_body_rejected_before_read(server):
    """A hostile Content-Length above the cap gets 413 WITHOUT the server
    reading (or allocating) the declared body."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.putrequest("POST", "/reconstruct")
        declared = server.max_body_bytes + 1
        conn.putheader("Content-Length", str(declared))
        conn.endheaders()
        # body intentionally NOT sent: the server must answer from the
        # header alone (reject-before-read)
        resp = conn.getresponse()
        assert resp.status == 413
        info = json.loads(resp.read())
        assert "exceeds limit" in info["error"]
    finally:
        conn.close()


def test_negative_content_length_is_client_error(server):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.putrequest("POST", "/reconstruct")
        conn.putheader("Content-Length", "-5")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
    finally:
        conn.close()


def test_decode_rejects_unexpected_latent_shape(server):
    """/decode serves exactly one latent shape; anything else is a 400
    (a novel shape would stall the worker on a fresh XLA compile)."""
    h, w, c = server.latent_shape
    bad = io.BytesIO()
    np.save(bad, np.zeros((h * 2, w * 2, c), np.float32))
    req = urllib.request.Request(
        _url(server, "/decode"), data=bad.getvalue(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    assert "latents must be" in err.value.read().decode()

    # the advertised shape still works
    good = io.BytesIO()
    np.save(good, np.zeros((h, w, c), np.float32))
    status, headers, _ = _post(server, "/decode", good.getvalue())
    assert status == 200
    assert headers["Content-Type"] == "image/png"


def test_microbatcher_sheds_load_beyond_max_queue():
    """A burst deeper than max_queue: excess submits fail fast with
    BatcherOverloaded; every accepted item still completes."""
    from vae_channel_dynamics_tpu.server import BatcherOverloaded

    release = threading.Event()

    def runner(kind, stacked):
        release.wait(timeout=30)
        return stacked * 2

    mb = MicroBatcher(runner, max_batch=1, max_wait_ms=0.0, max_queue=2)
    # occupy the worker so subsequent submits queue up
    first_done = threading.Event()
    threading.Thread(
        target=lambda: (mb.submit("x", np.zeros((1,))), first_done.set()),
        daemon=True,
    ).start()
    deadline = time.monotonic() + 10
    while mb._queue.qsize() > 0 and time.monotonic() < deadline:
        time.sleep(0.005)  # worker picked up the first item

    outcomes = []
    lock = threading.Lock()

    def fire():
        try:
            mb.submit("x", np.zeros((1,)))
            with lock:
                outcomes.append("ok")
        except BatcherOverloaded:
            with lock:
                outcomes.append("shed")

    threads = [threading.Thread(target=fire) for _ in range(8)]
    for t in threads:
        t.start()
    time.sleep(0.2)  # let the burst land while the worker is blocked
    release.set()
    for t in threads:
        t.join(timeout=30)
    assert first_done.wait(timeout=30)
    assert outcomes.count("shed") >= 6, outcomes  # only 2 could queue
    assert outcomes.count("ok") == len(outcomes) - outcomes.count("shed")
    assert mb.rejected == outcomes.count("shed")
    mb.close()


def test_http_overload_returns_503():
    """End-to-end: a burst against a max_queue=1 server yields at least one
    503 with Retry-After, successes still succeed, and /stats counts the
    rejects."""
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(
        wrapper, resolution=RES, max_batch=1, max_wait_ms=0.0, port=0,
        max_queue=1,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        # slow the device path down so the burst actually queues
        orig = srv.batcher._runner

        def slow_runner(kind, stacked):
            time.sleep(0.3)
            return orig(kind, stacked)

        srv.batcher._runner = slow_runner
        pixels = np.zeros((RES, RES, 3), np.float32)
        buf = io.BytesIO()
        np.save(buf, pixels)
        body = buf.getvalue()

        statuses = []
        lock = threading.Lock()

        def fire():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/reconstruct?format=npy",
                data=body, method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    with lock:
                        statuses.append(resp.status)
            except urllib.error.HTTPError as e:
                with lock:
                    statuses.append(e.code)
                if e.code == 503:
                    assert e.headers.get("Retry-After") is not None

        threads = [threading.Thread(target=fire) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert 503 in statuses, statuses
        assert 200 in statuses, statuses
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["rejected_overload"] >= statuses.count(503) > 0
        assert stats["max_queue"] == 1
    finally:
        srv.shutdown()


def test_microbatcher_close_is_idempotent_and_race_safe():
    mb = MicroBatcher(lambda k, s: s, max_batch=2, max_wait_ms=1.0)
    mb.close()
    mb.close()  # second close is a no-op, not an error
    with pytest.raises(RuntimeError, match="stopped"):
        mb.submit("x", np.zeros((1,)))


def test_stalled_client_is_timed_out_and_does_not_pin_the_server():
    """A client that claims a Content-Length then stalls mid-body must be
    disconnected by the per-connection read timeout (server.py Handler
    .timeout) — the handler thread frees and the daemon keeps serving.
    This is the last untested leg of the overload spec ('stalled clients
    cannot pin handler threads')."""
    import socket

    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(
        wrapper, resolution=RES, max_batch=1, max_wait_ms=0.0, port=0,
        read_timeout_s=1.5,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        stalled = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        stalled.sendall(
            b"POST /reconstruct HTTP/1.1\r\n"
            b"Host: x\r\nContent-Length: 5000\r\n\r\n"
            + b"x" * 10  # then stall: 4990 promised bytes never arrive
        )
        # the server must drop the connection within ~read_timeout_s: the
        # stalled socket sees EOF (or a reset) rather than hanging forever
        stalled.settimeout(10.0)
        t0 = time.monotonic()
        try:
            got = stalled.recv(4096)
        except (ConnectionResetError, socket.timeout) as e:
            assert not isinstance(e, socket.timeout), (
                "server never closed the stalled connection"
            )
            got = b""
        elapsed = time.monotonic() - t0
        assert elapsed < 8.0, f"stalled connection held {elapsed:.1f}s"
        # whatever was sent back (b'' on clean close, or a 408), the
        # connection is over and the daemon still serves normal traffic
        status, _, body = _post(srv, "/reconstruct", _png_bytes(9))
        assert status == 200
        stalled.close()
        del got
    finally:
        srv.shutdown()


def test_graceful_shutdown_drains_inflight_requests():
    """SIGTERM-path drain (the serving analog of the trainer's preemption
    handling): a request already queued in the batcher when the drain
    begins is ANSWERED 200, not failed; once drained the listener is
    closed and new connections are refused. max_wait_ms is set high so the
    queued request is still waiting for its batch window when
    graceful_shutdown starts — the drain must ride it to completion."""
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(
        wrapper, resolution=RES, max_batch=8, max_wait_ms=1500.0, port=0,
        use_mesh=False,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    srv.warmup()

    pixels = np.random.default_rng(0).uniform(
        -1, 1, (RES, RES, 3)
    ).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pixels)
    body = buf.getvalue()

    outcome = {}

    def client():
        req = urllib.request.Request(
            _url(srv, "/reconstruct?format=npy"), data=body, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                outcome["status"] = resp.status
                outcome["bytes"] = len(resp.read())
        except Exception as e:  # noqa: BLE001
            outcome["error"] = repr(e)

    t = threading.Thread(target=client)
    t.start()
    # wait until the request is in flight (the worker holds it while the
    # 1.5s batch window is open), so the drain starts mid-request
    deadline = time.time() + 10
    while time.time() < deadline and srv._inflight == 0:
        time.sleep(0.01)
    assert srv._inflight == 1, "request never became in-flight"
    time.sleep(0.3)  # let it pass submit() into the worker's open batch

    srv.graceful_shutdown(timeout=30)
    t.join(60)
    assert outcome.get("status") == 200, outcome
    assert outcome["bytes"] > 0

    # the port is released: a fresh connection must fail fast
    with pytest.raises(Exception):
        urllib.request.urlopen(_url(srv, "/healthz"), timeout=2)

    # idempotent
    srv.graceful_shutdown(timeout=1)
    srv.shutdown()


def test_tiled_server_reconstruct_and_encode():
    # A tiling+slicing daemon (server.py --tile_size/--slicing): /reconstruct
    # routes encode->decode through the tiled inference helpers; every
    # endpoint keeps its shape/content contract.
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    wrapper.enable_tiling(tile_sample_min_size=32, tile_overlap_factor=0.25)
    wrapper.enable_slicing()
    srv = VAEServer(
        wrapper, resolution=64, max_batch=2, max_wait_ms=20.0, port=0
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        body = _png_bytes(11, size=64)
        status, headers, png = _post(srv, "/reconstruct?deterministic=true", body)
        assert status == 200
        img = Image.open(io.BytesIO(png))
        assert img.size == (64, 64)
        assert float(headers["X-VCD-MSE"]) >= 0.0

        status, _, latents_npy = _post(srv, "/encode", body)
        assert status == 200
        z = np.load(io.BytesIO(latents_npy))
        assert z.shape == (32, 32, 4)  # tiny config: one downsample

        status, _, png2 = _post(srv, "/decode", latents_npy)
        assert status == 200
        assert np.asarray(Image.open(io.BytesIO(png2))).shape == (64, 64, 3)
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_soak_500_mixed_requests_memory_stable():
    """500+ requests of mixed op/shape (two PNG sizes for /reconstruct, the
    npy fast path, /encode, /decode) against a live daemon: zero errors,
    zero sheds, and Python-level retained memory flat after warmup.

    Retained bytes are DIRECTLY counted with tracemalloc (numpy buffers
    included) — RSS is explicitly not asserted (unreliable under load, see
    working notes). The bound catches any per-request retention: leaking
    even one decoded 48px fp32 array per request would be ~11 MB across
    the soak vs the 2 MB budget. (The on-chip 1024px flash soak lives in
    PERF.md; this pins the daemon's code paths.)"""
    import gc
    import tracemalloc

    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(
        wrapper, resolution=RES, max_batch=4, max_wait_ms=1.0, port=0
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        png_small = _png_bytes(seed=100, size=24)
        png_big = _png_bytes(seed=101, size=48)
        pixels = np.zeros((RES, RES, 3), np.float32)
        buf = io.BytesIO()
        np.save(buf, pixels)
        npy_body = buf.getvalue()
        _, _, latents_npy = _post(srv, "/encode", png_small)

        reqs = [
            ("/reconstruct", png_small),
            ("/reconstruct", png_big),
            ("/reconstruct?format=npy", npy_body),
            ("/encode", png_big),
            ("/decode", latents_npy),
        ]

        def run_batch(n, offset):
            errors = []

            def fire(i):
                path, body = reqs[(offset + i) % len(reqs)]
                try:
                    status, _, _ = _post(srv, path, body)
                    assert status == 200
                except Exception as e:  # noqa: BLE001
                    errors.append((path, e))

            threads = [
                threading.Thread(target=fire, args=(i,)) for i in range(n)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            # a hung request (server deadlock) leaves its thread alive with
            # nothing appended to errors — the join timeout alone would pass
            hung = [t for t in threads if t.is_alive()]
            assert not hung, f"{len(hung)} request thread(s) hung past 300s"
            assert not errors, errors[:3]

        # warmup: compile every endpoint/shape, populate caches/buffers
        for start in range(0, 100, 10):
            run_batch(10, start)
        gc.collect()
        tracemalloc.start()
        base = tracemalloc.take_snapshot()
        for start in range(0, 400, 10):
            run_batch(10, start)
        gc.collect()
        grown = tracemalloc.take_snapshot()
        tracemalloc.stop()

        growth = sum(
            s.size_diff for s in grown.compare_to(base, "filename")
            if s.size_diff > 0
        )
        assert growth < 2 * 1024 * 1024, (
            f"retained {growth/1e6:.2f} MB across 400 steady-state requests"
        )
        stats = srv.stats()
        assert stats["requests"] >= 500
        assert stats["errors"] == 0
        assert stats["rejected_overload"] == 0
        # the latency buffer is bounded by construction (4096 -> 2048)
        assert len(srv._latencies) <= 4096
    finally:
        srv.shutdown()


def test_failed_init_does_not_leak_attention_shard_mesh():
    """A VAEServer whose construction fails AFTER installing the global
    attention shard mesh (e.g. EADDRINUSE on the bind) leaves the caller
    with no object to shutdown() — __init__ itself must clear the mesh so
    later traces in the process don't inherit it."""
    import socket

    from vae_channel_dynamics_tpu.ops import pallas_attention

    assert pallas_attention._SHARD_MESH is None
    blocker = socket.socket()
    blocker.bind(("127.0.0.1", 0))
    blocker.listen(1)
    port = blocker.getsockname()[1]
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    try:
        with pytest.raises(OSError):
            VAEServer(
                wrapper, resolution=RES, max_batch=8, max_wait_ms=40.0,
                port=port, use_mesh=True,
            )
        assert pallas_attention._SHARD_MESH is None
    finally:
        blocker.close()


def test_resolve_serving_attention_impl_policy():
    """Serving is always single-device, so 'auto' upgrades to the fused
    Pallas kernel from 4096 tokens up (batched forwards measure
    flash-fastest already at the 512px mid-block shape — PERF.md) when the
    mid-block shape qualifies; explicit impls and small/odd shapes pass
    through."""
    from vae_channel_dynamics_tpu.server import resolve_serving_attention_impl

    sdxl = VAEConfig.sdxl()  # /8 downsampling, 512-ch mid block
    # 1024px -> 16384 tokens: above threshold and kernel-eligible
    assert resolve_serving_attention_impl("auto", 1024, sdxl) == "flash"
    # 256px -> 1024 tokens: below threshold, stays auto (-> naive in-model)
    assert resolve_serving_attention_impl("auto", 256, sdxl) == "auto"
    # 512px / a 512px TILE of a larger image -> 4096 tokens: serving takes
    # flash AT the threshold (the training policy keeps naive there)
    assert resolve_serving_attention_impl("auto", 512, sdxl) == "flash"
    # explicit impls are never overridden
    for impl in ("naive", "chunked", "flash"):
        assert resolve_serving_attention_impl(impl, 1024, sdxl) == impl
    # tiny arch mid block (32 ch, not lane-aligned): ineligible even when
    # the token count clears the threshold
    tiny = VAEConfig.tiny()
    big = 8 * (2 ** (len(tiny.block_out_channels) - 1)) * 64
    assert resolve_serving_attention_impl("auto", big, tiny) == "auto"


def test_sampling_requests_draw_fresh_noise(server):
    """?deterministic=false must return a DIFFERENT posterior sample per
    request — the wrapper's rng=None fallback is a fixed key, which made
    every 'sample' bit-identical until the server threaded a fresh key."""
    png = _png_bytes(seed=5)
    status1, _, body1 = _post(server, "/encode?deterministic=false", png)
    status2, _, body2 = _post(server, "/encode?deterministic=false", png)
    assert status1 == status2 == 200
    z1 = np.load(io.BytesIO(body1))
    z2 = np.load(io.BytesIO(body2))
    assert not np.array_equal(z1, z2), "identical 'samples' across requests"
    # deterministic stays deterministic
    _, _, d1 = _post(server, "/encode", png)
    _, _, d2 = _post(server, "/encode", png)
    np.testing.assert_array_equal(np.load(io.BytesIO(d1)), np.load(io.BytesIO(d2)))


def test_decode_rejects_multi_latent_batch(server):
    """POST /decode with a 4-D batch of >1 latents must 400 — silently
    decoding z[0] dropped the rest of the batch while returning 200."""
    png = _png_bytes(seed=6)
    _, _, latents = _post(server, "/encode", png)
    z = np.load(io.BytesIO(latents))
    batch = np.stack([z, z])
    buf = io.BytesIO()
    np.save(buf, batch)
    req = urllib.request.Request(
        _url(server, "/decode"), data=buf.getvalue(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    assert b"ONE latent" in err.value.read()
    # a singleton 4-D batch still decodes
    buf = io.BytesIO()
    np.save(buf, z[None])
    status, _, _ = _post(server, "/decode", buf.getvalue())
    assert status == 200
