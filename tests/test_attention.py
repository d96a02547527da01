"""Chunked (online-softmax) mid-block attention: numerics parity with the
naive path, gradient parity, padding/masking, the auto policy, and the
config plumbing. The chunked path is the 1024px memory fix (ops/attention.py):
the reference's diffusers Attention materializes the full O(N^2) logits
matrix, which at 16384 tokens is ~1 GB fp32 per image."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.ops.attention import (
    AUTO_CHUNK_THRESHOLD,
    chunked_attention,
    use_chunked,
)
from vae_channel_dynamics_tpu.training.loop import resolve_model


def _naive(q, k, v, scale, dtype, prec):
    logits = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum(
        "bqk,bkc->bqc", attn, v, preferred_element_type=dtype, precision=prec,
    )


def _qkv(dtype, b=2, n=144, c=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, c)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_fp32_parity_with_padding():
    # n=144 is not a multiple of chunk=32 -> exercises the pad+mask path.
    q, k, v = _qkv(jnp.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = _naive(q, k, v, scale, jnp.float32, jax.lax.Precision.HIGHEST)
    out = chunked_attention(
        q, k, v, scale=scale, out_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST, chunk=32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fp32_parity_exact_multiple():
    q, k, v = _qkv(jnp.float32, n=128)
    scale = 0.2
    ref = _naive(q, k, v, scale, jnp.float32, jax.lax.Precision.HIGHEST)
    out = chunked_attention(
        q, k, v, scale=scale, out_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST, chunk=64,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_bf16_parity():
    q, k, v = _qkv(jnp.bfloat16, n=100)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = _naive(q, k, v, scale, jnp.bfloat16, jax.lax.Precision.DEFAULT)
    out = chunked_attention(
        q, k, v, scale=scale, out_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT, chunk=32,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_gradient_parity():
    q, k, v = _qkv(jnp.float32, n=96)
    scale = 1.0 / np.sqrt(q.shape[-1])
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_naive(qkv):
        out = _naive(*qkv, scale, jnp.float32, jax.lax.Precision.HIGHEST)
        return jnp.sum(out * w)

    def loss_chunked(qkv):
        out = chunked_attention(
            *qkv, scale=scale, out_dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST, chunk=40,  # pad path too
        )
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_naive)((q, k, v))
    g_out = jax.grad(loss_chunked)((q, k, v))
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_single_chunk_degenerates_to_full():
    q, k, v = _qkv(jnp.float32, n=64)
    ref = _naive(q, k, v, 0.125, jnp.float32, jax.lax.Precision.HIGHEST)
    out = chunked_attention(
        q, k, v, scale=0.125, out_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST, chunk=4096,  # clamped to 64
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_use_chunked_policy():
    assert not use_chunked("auto", AUTO_CHUNK_THRESHOLD)
    assert use_chunked("auto", AUTO_CHUNK_THRESHOLD + 1)
    assert use_chunked("chunked", 4)
    assert not use_chunked("naive", 10**6)
    assert not use_chunked("flash", 4)  # flash is its own impl, not chunked
    with pytest.raises(ValueError):
        use_chunked("blocked", 4)


def test_full_model_parity_naive_vs_chunked():
    """The tiny model's mid block has few tokens, so force chunked and
    compare the whole forward against naive on identical params."""
    cfg = VAEConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    naive = AutoencoderKL(config=cfg, attn_impl="naive")
    chunked = AutoencoderKL(config=cfg, attn_impl="chunked")
    variables = naive.init(rngs, x, sample_posterior=False)
    out_n = naive.apply(variables, x, sample_posterior=False)
    out_c = chunked.apply(variables, x, sample_posterior=False)
    np.testing.assert_allclose(
        np.asarray(out_c["reconstruction"]),
        np.asarray(out_n["reconstruction"]),
        atol=1e-5,
    )


@pytest.mark.slow
def test_chunked_backward_drops_quadratic_temp():
    """Compile-only structural proof of the memory claim: the naive
    attention backward pins an O(N^2) fp32 logits temp (exactly N*N*4
    bytes = 256 MB at N=8192), the chunked+checkpointed backward does not.
    XLA's memory analysis reports the compiled temp allocation without
    executing anything."""
    n, c, b = 8192, 16, 1
    q = jnp.zeros((b, n, c))
    k = jnp.zeros((b, n, c))
    v = jnp.zeros((b, n, c))

    def naive_loss(qkv):
        out = _naive(*qkv, 0.25, jnp.float32, jax.lax.Precision.DEFAULT)
        return jnp.sum(out)

    def chunk_loss(qkv):
        out = chunked_attention(
            *qkv, scale=0.25, out_dtype=jnp.float32,
            precision=jax.lax.Precision.DEFAULT, chunk=512,
        )
        return jnp.sum(out)

    def temp_bytes(f):
        compiled = jax.jit(jax.grad(f)).lower((q, k, v)).compile()
        return compiled.memory_analysis().temp_size_in_bytes

    naive_t = temp_bytes(naive_loss)
    chunked_t = temp_bytes(chunk_loss)
    assert naive_t >= 4 * n * n  # the quadratic logits buffer is live
    assert chunked_t < naive_t / 8


def test_model_auto_policy_is_batch_aware():
    """Structural proof that the AttentionBlock threads its trace-time batch
    into resolve_impl: at 16384 tokens (the 1024px mid block) batch 1 lowers
    to the naive einsum (no scan — the measured in-model winner, 673.9 vs
    chunked 685.6 ms), while batch 2's residual exceeds the budget and
    lowers to the chunked lax.scan (a stablehlo while loop). Lowering only —
    nothing is compiled or executed at these shapes."""
    from vae_channel_dynamics_tpu.models.vae import AttentionBlock

    blk = AttentionBlock(channels=128, attn_impl="auto", full_name="mid")
    key = jax.random.PRNGKey(0)

    def lowered_text(batch):
        x = jax.ShapeDtypeStruct((batch, 128, 128, 128), jnp.float32)
        variables = jax.eval_shape(blk.init, key, x)
        return jax.jit(blk.apply).lower(variables, x).as_text()

    assert "while" not in lowered_text(1)   # naive: no online-softmax scan
    assert "while" in lowered_text(2)       # chunked: lax.scan -> while


def test_auto_policy_symbolic_batch_stays_chunked():
    """jax.export traces with a SYMBOLIC batch dim; the residual-budget rule
    (true at b=1, false at b>=2) would raise InconclusiveDimensionOperation
    if evaluated on it. resolve_impl must treat a non-int batch as unknown
    and resolve conservatively to chunked — this is what keeps
    tools/export_model.py working above 512px."""
    from jax import export as jexport

    from vae_channel_dynamics_tpu.ops.attention import resolve_impl

    (b,) = jexport.symbolic_shape("b")
    assert resolve_impl("auto", 16384, batch=b) == "chunked"
    # concrete batches keep the measured policy
    assert resolve_impl("auto", 16384, batch=1) == "naive"
    assert resolve_impl("auto", 16384, batch=2) == "chunked"
    assert resolve_impl("auto", 16384, batch=None) == "chunked"


def test_export_symbolic_batch_above_chunk_threshold():
    """End-to-end guard for the symbolic-batch crash: exporting a forward
    whose mid block exceeds AUTO_CHUNK_THRESHOLD tokens with a symbolic
    batch dim must trace (the tiny config downsamples /4, so 512px input
    puts 16384 tokens in the mid block — same count as SDXL @1024px)."""
    from jax import export as jexport

    cfg = VAEConfig.tiny()
    model = AutoencoderKL(config=cfg, attn_impl="auto")
    small = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.eval_shape(
        model.init,
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        small,
    )

    def fwd(params, x):
        return model.apply(params, x, sample_posterior=False)["reconstruction"]

    (b,) = jexport.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b, 512, 512, 3), jnp.float32)
    # lowering alone exercises resolve_impl on the symbolic batch; the
    # pre-fix code raised InconclusiveDimensionOperation here
    exported = jexport.export(jax.jit(fwd))(variables, x_spec)
    # in_avals is the flattened arg list (params leaves first, x last);
    # the image input kept its symbolic leading dim
    assert str(exported.in_avals[-1].shape[0]) == "b"


def test_resolve_model_plumbs_attention_impl():
    wrapper = resolve_model(
        {"architecture": "tiny", "pretrained_vae_name": None,
         "attention_impl": "chunked"},
        jnp.float32,
    )
    assert wrapper.attn_impl == "chunked"
    with pytest.raises(ValueError, match="attention_impl"):
        resolve_model(
            {"architecture": "tiny", "pretrained_vae_name": None,
             "attention_impl": "blocked"},
            jnp.float32,
        )
