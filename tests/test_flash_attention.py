"""Fused Pallas flash-attention (ops/pallas_attention.py): numerics parity
with the naive and chunked paths, gradient parity, eligibility fallback,
policy plumbing, and per-shard execution under a data mesh.

On CPU the kernel runs in Pallas interpret mode — the same program the TPU
compiles (chip timings in PERF.md). The op replaces the mid-block attention
the reference reaches through diffusers (src/models/sdxl_vae_wrapper.py:42-77)
when ``model.attention_impl: flash`` is selected."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_channel_dynamics_tpu.models.vae import AttentionBlock
from vae_channel_dynamics_tpu.ops import pallas_attention
from vae_channel_dynamics_tpu.ops.attention import (
    chunked_attention,
    resolve_impl,
)
from vae_channel_dynamics_tpu.ops.pallas_attention import (
    eligible,
    flash_attention,
)

HIGHEST = jax.lax.Precision.HIGHEST


def _naive(q, k, v, scale, dtype, prec):
    logits = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum(
        "bqk,bkc->bqc", attn, v, preferred_element_type=dtype, precision=prec,
    )


def _qkv(b=2, n=256, c=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, c)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_flash_matches_naive_fp32():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = flash_attention(
        q, k, v, scale=scale, out_dtype=jnp.float32, precision=HIGHEST
    )
    ref = _naive(q, k, v, scale, jnp.float32, HIGHEST)
    # only block-reduction reassociation differs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_matches_chunked_bf16():
    q, k, v = _qkv(dtype=jnp.bfloat16, seed=1)
    scale = 1.0 / np.sqrt(q.shape[-1])
    prec = jax.lax.Precision.DEFAULT
    out = flash_attention(
        q, k, v, scale=scale, out_dtype=jnp.bfloat16, precision=prec
    )
    ref = chunked_attention(
        q, k, v, scale=scale, out_dtype=jnp.bfloat16, precision=prec
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_flash_gradients_match_chunked():
    """The backward is its own pair of fused Pallas kernels (FlashAttention-2:
    probability tiles rematerialized from q/k/lse, dK/dV and dQ accumulated in
    VMEM scratch) — grads must agree with differentiating the chunked scan AND
    the naive einsum path at fp32/HIGHEST."""
    q, k, v = _qkv(b=1, n=128, c=128, seed=2)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss(fn, q, k, v):
        out = fn(q, k, v, scale=scale, out_dtype=jnp.float32,
                 precision=HIGHEST)
        return jnp.sum(out * out)

    gf = jax.grad(lambda *a: loss(flash_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    gc = jax.grad(lambda *a: loss(chunked_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    gn = jax.grad(
        lambda *a: loss(
            lambda q_, k_, v_, **kw: _naive(q_, k_, v_, kw["scale"],
                                            kw["out_dtype"], kw["precision"]),
            *a,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, c_, name in zip(gf, gc, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"d{name} vs chunked",
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c_), rtol=1e-5, atol=1e-6,
            err_msg=f"d{name} vs naive",
        )


def test_flash_gradients_rectangular():
    """nq != nk exercises the two backward grids' distinct index maps
    (dK/dV iterates queries innermost, dQ iterates keys innermost)."""
    q = jax.random.normal(jax.random.PRNGKey(20), (2, 256, 128), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(21), (2, 384, 128), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(22), (2, 384, 128), jnp.float32)
    scale = 1.0 / np.sqrt(128)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v, scale=scale,
                                  out_dtype=jnp.float32, precision=HIGHEST)))

    gf = jax.grad(lambda *a: loss(flash_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    gc = jax.grad(lambda *a: loss(chunked_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    for a, b, name in zip(gf, gc, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"d{name}",
        )


def test_flash_gradients_bf16():
    """bf16 compute: the backward casts the rematerialized probability and
    ds tiles to the compute dtype before the MXU matmuls (the same policy as
    the forward's PV matmul), so grads track chunked's within bf16 noise."""
    q, k, v = _qkv(dtype=jnp.bfloat16, seed=4)
    scale = 1.0 / np.sqrt(q.shape[-1])
    prec = jax.lax.Precision.DEFAULT

    def loss(fn, q, k, v):
        out = fn(q, k, v, scale=scale, out_dtype=jnp.bfloat16, precision=prec)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(lambda *a: loss(flash_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    gc = jax.grad(lambda *a: loss(chunked_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    for a, b, name in zip(gf, gc, "qkv"):
        assert a.dtype == jnp.bfloat16, f"d{name} dtype"
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-1, atol=1e-1, err_msg=f"d{name}",
        )


def test_eligibility():
    assert eligible(256, 128)
    assert eligible(16384, 512)  # the 1024px SDXL mid block
    assert not eligible(100, 128)   # no block divides the token count
    assert not eligible(256, 64)    # channels not lane-aligned
    assert not eligible(144, 512)   # 96px: 144 tokens


def test_resolve_impl_flash():
    assert resolve_impl("flash", 64) == "flash"
    assert resolve_impl("auto", 64) == "naive"
    # channels unknown: the streaming fallback, never an unchecked kernel
    assert resolve_impl("auto", 8192) == "chunked"
    try:
        resolve_impl("bogus", 64)
    except ValueError as e:
        assert "flash" in str(e)
    else:
        raise AssertionError("unknown impl accepted")


def test_resolve_impl_auto_policy_table():
    """The measured shared policy (resolvers' docstrings / PERF.md):
    TRAINING auto = naive <= 4096 tokens; above that, naive while the
    backward's quadratic residual (B*N^2*4 bytes) fits the measured budget
    (batch 1 @1024px: naive 673.9 vs chunked 685.6 ms in-model), chunked
    otherwise (flash measures 748.6 ms in the same step despite winning at
    the op level); FORWARD-ONLY auto (serve/server/evaluate) = flash from
    4096 tokens up when the kernel's shape/mesh constraints hold (fastest
    at every measured batched forward point)."""
    from vae_channel_dynamics_tpu.ops.attention import resolve_serving_impl

    # training policy: batch-unknown traces stay byte-identical to rounds
    # 1-3 (conservatively chunked above the threshold)
    assert resolve_impl("auto", 4096, 512) == "naive"
    assert resolve_impl("auto", 16384, 512) == "chunked"
    assert resolve_impl("auto", 16384) == "chunked"
    # batch-aware: the 1024px batch-1 residual (1.07 GB) fits the budget ->
    # naive (the measured in-model winner); batch 2 (2.1 GB) does not
    assert resolve_impl("auto", 16384, 512, batch=1) == "naive"
    assert resolve_impl("auto", 16384, 512, batch=2) == "chunked"
    # below the threshold the batch never matters
    assert resolve_impl("auto", 4096, 512, batch=64) == "naive"
    # serving policy: flash at >= 4096 when eligible
    assert resolve_serving_impl("auto", 4096, 512) == "flash"
    assert resolve_serving_impl("auto", 16384, 512) == "flash"
    assert resolve_serving_impl("auto", 4096, 320) == "naive"  # unaligned
    assert resolve_serving_impl("auto", 5000, 512) == "chunked"  # no block
    assert resolve_serving_impl("auto", 1024, 512) == "naive"
    for impl in ("naive", "chunked", "flash"):  # explicit passes through
        assert resolve_impl(impl, 16384, 512) == impl
        assert resolve_serving_impl(impl, 16384, 512) == impl


def test_resolve_serving_impl_is_mesh_aware():
    """Serving auto->flash only on meshes the kernel partitions: data and
    spatial (per-shard rows block-divisible) yes; multi-slice no (the K/V
    gather would ride DCN — chunked's in-graph scan is the better
    program)."""
    from vae_channel_dynamics_tpu.ops.attention import resolve_serving_impl
    from vae_channel_dynamics_tpu.parallel import make_mesh

    try:
        pallas_attention.set_shard_mesh(make_mesh(8))
        assert resolve_serving_impl("auto", 16384, 512) == "flash"
        pallas_attention.set_shard_mesh(make_mesh(8, spatial=4))
        assert resolve_serving_impl("auto", 16384, 512) == "flash"
        pallas_attention.set_shard_mesh(make_mesh(8, slices=2))
        assert resolve_serving_impl("auto", 16384, 512) == "chunked"
    finally:
        pallas_attention.set_shard_mesh(None)


def test_evaluate_cli_resolves_serving_attention_policy(tmp_path, monkeypatch):
    """The evaluate CLI is forward-only: its wrapper must be constructed
    with the SERVING-resolved impl (flash at eligible >=4096-token shapes),
    while explicit config impls pass through."""
    from vae_channel_dynamics_tpu.ops import attention as attention_mod

    captured = {}

    class _Stop(Exception):
        pass

    def fake_resolve(attn_impl, tokens, channels=None):
        captured["args"] = (attn_impl, tokens, channels)
        raise _Stop  # don't run the actual evaluation

    monkeypatch.setattr(attention_mod, "resolve_serving_impl", fake_resolve)
    import vae_channel_dynamics_tpu.evaluate as evaluate_mod
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.models import io as model_io

    model_dir = tmp_path / "model"
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        sample_posterior=False,
    )["params"]
    model_io.save_model_dir(str(model_dir), cfg, params)
    config_path = tmp_path / "c.yaml"
    config_path.write_text(
        "data:\n  dataset_name: synthetic://plain\n  resolution: 1024\n"
    )
    try:
        evaluate_mod.main([
            "--config_path", str(config_path),
            "--checkpoint_path", str(model_dir),
            "--enable_logit_lens", "false",
        ])
    except _Stop:
        pass
    # tiny config: /2 downsampling -> (1024//2)^2 tokens, 32-ch mid block
    assert captured["args"] == ("auto", (1024 // 2) ** 2, 32)


def test_attention_block_flash_fallback_when_ineligible():
    """attn_impl='flash' on a shape the kernel can't take (c=64 channels,
    not lane-aligned) must silently take the chunked path — identical
    output to attn_impl='chunked' with the same params."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 5, 64), jnp.float32)
    blk_f = AttentionBlock(channels=64, attn_impl="flash", full_name="mid")
    blk_c = AttentionBlock(channels=64, attn_impl="chunked", full_name="mid")
    params = blk_f.init(jax.random.PRNGKey(4), x)
    out_f = blk_f.apply(params, x)
    out_c = blk_c.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_c))


def test_attention_block_flash_matches_naive_when_eligible():
    """Full module path (GN -> qkv -> flash kernel -> out proj -> residual)
    against the naive module at an eligible shape (256 tokens, 128 ch)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 128),
                          jnp.float32)
    blk_f = AttentionBlock(channels=128, attn_impl="flash", full_name="mid")
    blk_n = AttentionBlock(channels=128, attn_impl="naive", full_name="mid")
    params = blk_f.init(jax.random.PRNGKey(6), x)
    out_f = blk_f.apply(params, x)
    out_n = blk_n.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               rtol=3e-5, atol=3e-6)


def test_flash_under_data_mesh_matches_single_device():
    """With the shard mesh installed, flash_attention shard_maps itself over
    the data axis (each device computes its local batch block); softmax is
    per-sample so results must match the unmeshed kernel exactly up to
    layout-induced last-place rounding."""
    from vae_channel_dynamics_tpu.parallel import make_mesh

    q, k, v = _qkv(b=8, n=128, c=128, seed=7)
    scale = 1.0 / np.sqrt(q.shape[-1])
    kw = dict(scale=scale, out_dtype=jnp.float32, precision=HIGHEST)
    ref = flash_attention(q, k, v, **kw)

    mesh = make_mesh(8)
    assert pallas_attention.mesh_supported(mesh)
    pallas_attention.set_shard_mesh(mesh)
    try:
        out = flash_attention(q, k, v, **kw)
    finally:
        pallas_attention.set_shard_mesh(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_flash_under_indivisible_mesh_fails_clearly():
    """A mesh whose data axis does not divide the batch — the signature of a
    STALE mesh leaked by an earlier model in the same process — must raise a
    trace-time error naming set_shard_mesh, not shard_map's generic
    divisibility error (eligible() cannot catch this: it never sees the
    batch). Regression for the full-suite ordering failure where a leaked
    8-device mesh broke batch-2 kernel calls."""
    import pytest

    from vae_channel_dynamics_tpu.parallel import make_mesh

    q, k, v = _qkv(b=2, n=256, c=128, seed=3)
    kw = dict(scale=0.088, out_dtype=jnp.float32, precision=HIGHEST)
    pallas_attention.set_shard_mesh(make_mesh(8))
    try:
        with pytest.raises(ValueError, match="set_shard_mesh"):
            flash_attention(q, k, v, **kw)
    finally:
        pallas_attention.set_shard_mesh(None)


def test_flash_under_spatial_mesh_matches_single_device():
    """Spatially-sharded mesh: the token axis is split, so flash_attention
    goes sequence-parallel — each shard all-gathers K/V along ``spatial``
    and runs the kernel over its local query rows. Softmax rows are
    independent, so forward AND gradients must match the unmeshed kernel
    (the all-gather transposes to a reduce-scatter for dK/dV)."""
    from vae_channel_dynamics_tpu.parallel import make_mesh

    # batch divisible by every data-axis size below (4 and 2) — the same
    # invariant training maintains by sharding the batch over `data`
    q, k, v = _qkv(b=4, n=512, c=128, seed=8)
    scale = 1.0 / np.sqrt(q.shape[-1])
    kw = dict(scale=scale, out_dtype=jnp.float32, precision=HIGHEST)

    def loss(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, **kw)))

    ref = flash_attention(q, k, v, **kw)
    gref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for spatial in (2, 4):
        mesh = make_mesh(8, spatial=spatial)
        assert pallas_attention.mesh_supported(mesh)
        pallas_attention.set_shard_mesh(mesh)
        try:
            out = flash_attention(q, k, v, **kw)
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            pallas_attention.set_shard_mesh(None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)
        for a, b, name in zip(g, gref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"spatial={spatial} d{name}",
            )


def test_flash_attention_block_under_gspmd_spatial_mesh():
    """The composition the 1024px multi-chip recipe runs: the AttentionBlock
    traced under jit with GSPMD-sharded NHWC inputs (batch over ``data``,
    H over ``spatial``). GSPMD propagates the H sharding through the
    reshape to the token axis, shard_map reshards to its declared specs,
    and the kernel runs sequence-parallel. Value AND parameter gradients
    must match the unmeshed module. (Kept at the smallest eligible shape —
    128 ch, 32x32 — per the heavy-mesh-compile suite constraint.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_channel_dynamics_tpu.parallel import make_mesh

    x = jax.random.normal(jax.random.PRNGKey(11), (4, 32, 32, 128),
                          jnp.float32)
    blk = AttentionBlock(channels=128, attn_impl="flash", full_name="mid")
    params = blk.init(jax.random.PRNGKey(12), x)

    def loss(p, x):
        return jnp.sum(jnp.sin(blk.apply(p, x)))

    ref_val, ref_grad = jax.value_and_grad(loss)(params, x)

    mesh = make_mesh(8, spatial=2)
    pallas_attention.set_shard_mesh(mesh)
    try:
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        val, grad = jax.jit(jax.value_and_grad(loss))(ps, xs)
        val, grad = jax.device_get((val, grad))
    finally:
        pallas_attention.set_shard_mesh(None)
    # the jnp.sum reduction reassociates over shards — scalar-level noise
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    flat_a = jax.tree.leaves(grad)
    flat_b = jax.tree.leaves(jax.device_get(ref_grad))
    # param grads sum over the sharded batch/token axes (4096 O(1) terms
    # with cancellation) — the shard-wise partial sums reassociate, so
    # tolerate fp32 accumulation noise; 5e-5 is ~1e-5 of the grad scale
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_flash_eligibility_is_mesh_aware():
    """Under a spatial mesh the per-shard query rows must still be
    block-divisible; slice meshes stay unsupported (the K/V gather would
    cross DCN)."""
    from vae_channel_dynamics_tpu.parallel import make_mesh

    mesh = make_mesh(8, spatial=8)
    pallas_attention.set_shard_mesh(mesh)
    try:
        assert not eligible(512, 128)   # 64 local rows < min block
        assert eligible(1024, 128)      # 128 local rows
        assert not eligible(1000, 128)  # tokens not divisible by spatial
    finally:
        pallas_attention.set_shard_mesh(None)
    assert eligible(512, 128)  # unmeshed: global check only
    assert not pallas_attention.mesh_supported(make_mesh(8, slices=2))


def test_trainer_installs_and_clears_flash_shard_mesh(tmp_path):
    """attention_impl='flash' under the (8-device CPU) data mesh: the loop
    installs the module-global shard mesh before tracing and clears it on
    exit (training/loop.py — the same lifecycle as kernel_impl='fused').
    The tiny arch is shape-ineligible so the kernel itself falls back to
    chunked in-model; the install/cleanup path is what this pins."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "project_name": "t",
        "run_name": "flash_mesh",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"pretrained_vae_name": None, "architecture": "tiny",
                  "attention_impl": "flash"},
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 16,
            "max_samples": 16,
            "batch_size": 1,
            "num_workers": 0,
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 1,
            "stop_after_steps": 2,
            "learning_rate": "1e-4",
            "lr_warmup_steps": 1,
            "kl_weight": "1e-6",
            "mixed_precision": "no",
            # 0 must clamp to 1, not ZeroDivisionError (loop.py)
            "gradient_accumulation_steps": 0,
        },
        # interval 0 = log every step (clamped), save disabled — the
        # divide-by-zero hazards the reference inherits from train.py:358
        "logging": {"log_interval": 0, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 0},
        "tracking": {"enabled": False},
        "dead_neuron_tracking": {"enabled": False},
        "logit_lens": {"enabled": False},
        "classification": {"enabled": False},
    }
    assert pallas_attention._SHARD_MESH is None
    installs = []
    real_set = pallas_attention.set_shard_mesh

    def recording_set(mesh):
        installs.append(mesh)
        real_set(mesh)

    pallas_attention.set_shard_mesh = recording_set
    try:
        Trainer(config).train()
    finally:
        pallas_attention.set_shard_mesh = real_set
    # installed exactly once with the data mesh, then cleared on exit
    assert [m is None for m in installs] == [False, True]
    assert pallas_attention._SHARD_MESH is None
