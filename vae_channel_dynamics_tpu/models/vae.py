"""From-scratch Flax AutoencoderKL with the SDXL-VAE architecture.

The reference downloads this model from the HF Hub
(src/models/sdxl_vae_wrapper.py:31-34); here it is built natively for TPU:
NHWC layout throughout (feeds the MXU's preferred conv layout), GroupNorm via
``ops.group_norm`` (Pallas-fusable, fp32 statistics), bf16-friendly compute
dtype threading, and compile-time "taps" that emit per-channel activation
statistics as side outputs of the forward pass — the zero-copy replacement
for the reference's forward hooks (src/tracking/monitor.py:82-139,
src/models/sdxl_vae_wrapper.py:79-113).

Architecture (diffusers stabilityai/sdxl-vae config): encoder with
block_out_channels (128, 256, 512, 512) and 2 ResnetBlock2D per down block,
attention mid-block, 8-channel moments -> DiagonalGaussianDistribution with
4 latent channels; mirrored decoder with 3 resnets per up block;
GroupNorm(32, eps=1e-6) + SiLU throughout; scaling_factor 0.13025.

Module naming preserves the reference's dotted-name contract
(SURVEY.md §2c) through utils/naming.py: Flax children are named so that
``encoder.down_blocks.0.resnets.0.norm1`` maps to
``encoder/down_blocks_0/resnets_0/norm1``.

Capture taps: ``capture`` is a static tuple of
``(layer_name, capture_point, metrics)`` entries. Every conv / norm / dense
module knows its torch-style ``full_name`` and, when a spec matches, sows the
requested statistics into the ``"stats"`` collection under the key
``<layer_name>.<point>.<metric>``. An empty capture table compiles to the
bare forward — zero overhead when tracking is off.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import chunked_attention, resolve_impl
from ..ops.spatial_conv import active_spatial_mesh, halo_conv
from ..ops.group_norm import group_norm, silu
from ..ops.stats import channel_stats
from .distributions import DiagonalGaussianDistribution

# (layer_name, capture_point, metrics) — layer_name without the "vae." prefix
CaptureSpec = Tuple[str, str, Tuple[str, ...]]
CaptureTable = Tuple[CaptureSpec, ...]


def flatten_stats(stats_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten the nested ``"stats"`` collection returned by ``apply`` into
    ``{"<layer>.<point>.<metric>": array}``. Sown values are nested under the
    emitting module's scope, but each leaf key already carries the full
    identifier, so only the leaves matter."""
    flat: Dict[str, Any] = {}

    def walk(node: Any) -> None:
        if isinstance(node, dict):
            for key, child in node.items():
                if isinstance(child, dict):
                    walk(child)
                else:
                    flat[key] = child

    walk(stats_tree)
    return flat


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Static architecture hyperparameters (diffusers config equivalent)."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.13025
    sample_size: int = 1024
    mid_block_attention: bool = True

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sd(cls) -> "VAEConfig":
        """Stable Diffusion 1.x/2.x VAE: identical topology to the SDXL VAE,
        different latent scaling factor and nominal sample size."""
        return cls(scaling_factor=0.18215, sample_size=512)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        """A CPU-testable miniature with the same topology."""
        return cls(
            block_out_channels=(16, 32),
            layers_per_block=1,
            norm_num_groups=8,
            sample_size=32,
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        # diffusers spells the attention toggle mid_block_add_attention
        if "mid_block_attention" not in d and "mid_block_add_attention" in d:
            kwargs["mid_block_attention"] = bool(d["mid_block_add_attention"])
        if "block_out_channels" in kwargs:
            kwargs["block_out_channels"] = tuple(kwargs["block_out_channels"])
        return cls(**kwargs)


def _precision_for(dtype: Any) -> jax.lax.Precision:
    """fp32 compute -> HIGHEST (true fp32 MXU passes, parity with the
    reference's mixed_precision: "no"); bf16 compute -> DEFAULT."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) on fan_in, matching torch Conv2d/Linear
    defaults: bound = 1/sqrt(fan_in) for HWIO kernels."""
    fan_in = math.prod(shape[:-1])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TapModule(nn.Module):
    """Base with compile-time activation taps. Subclasses declare
    ``full_name: str`` and ``capture: CaptureTable`` fields."""

    def _specs_for(self, point: str) -> Tuple[CaptureSpec, ...]:
        return tuple(
            s for s in self.capture if s[0] == self.full_name and s[1] == point
        )

    def sow_stat(self, key: str, value: jax.Array) -> None:
        self.sow(
            "stats",
            key,
            value,
            reduce_fn=lambda old, new: new,
            init_fn=lambda: None,
        )

    def _emit_specs(
        self, specs: Tuple[CaptureSpec, ...], x: jax.Array
    ) -> None:
        """THE stat-emission path — shared by plain taps and the fused
        resnet's materialized-tensor taps so their semantics cannot drift."""
        for layer_name, pt, metrics in specs:
            for metric, value in channel_stats(x, tuple(metrics)).items():
                self.sow_stat(f"{layer_name}.{pt}.{metric}", value)

    def tap(self, x: jax.Array, point: str) -> None:
        self._emit_specs(self._specs_for(point), x)


class VConv(TapModule):
    """2-D convolution, NHWC/HWIO, with activation taps.

    ``fuse_nearest_upsample``: treat the call input as the LOW-resolution
    tensor and compute ``conv3x3(nearest_up2(x))`` as a single input-dilated
    convolution with the combined 4x4 kernel
    ``w4[a,b] = sum_{p,q in {0,1}} w[a-p, b-q]`` (nearest-2x ==
    zero-insertion then a 2x2 ones conv, so the pair collapses). Exact, and
    measured 2.33x faster on v5e than materializing the upsampled tensor —
    XLA's TPU conv exploits the dilation zeros. The stored parameter stays
    the plain (3, 3, I, O) kernel (checkpoint contract unchanged)."""

    features: int = 0
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))
    dtype: Any = jnp.float32
    fuse_nearest_upsample: bool = False
    full_name: str = ""
    capture: CaptureTable = ()

    @nn.compact
    def __call__(self, x: jax.Array, params_only: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            _torch_conv_kernel_init,
            (*self.kernel_size, in_ch, self.features),
        )
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        bias = self.param("bias", _torch_bias_init(fan_in), (self.features,))
        if params_only:
            # fused-kernel path (ResnetBlock2D): the parameters are created
            # under this module's scope exactly as in the normal path (same
            # names, shapes, init RNG streams), but the compute happens in
            # the parent's fused Pallas op; x is only a shape carrier here
            return kernel, bias
        self.tap(x, "input")
        # parallel.spatial_conv: shard_map — when the train/eval step has
        # installed a spatial-conv scope (ops/spatial_conv.py), the conv's
        # H axis is halo-exchanged manually under shard_map instead of by
        # GSPMD (whose jax-0.9.0 halo partitioner miscompiles; see the
        # module docstring). Same math, same dtype/precision rules.
        smesh = active_spatial_mesh()
        if self.fuse_nearest_upsample:
            w4 = jnp.zeros((4, 4) + kernel.shape[2:], kernel.dtype)
            for p in (0, 1):
                for q in (0, 1):
                    w4 = w4.at[p : p + 3, q : q + 3].add(kernel)
            if smesh is not None:
                y = halo_conv(
                    x.astype(self.dtype),
                    w4.astype(self.dtype),
                    strides=(1, 1),
                    padding=((2, 2), (2, 2)),
                    lhs_dilation=(2, 2),
                    mesh=smesh,
                    precision=_precision_for(self.dtype),
                )
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    w4.astype(self.dtype),
                    window_strides=(1, 1),
                    padding=((2, 2), (2, 2)),
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=_precision_for(self.dtype),
                )
        elif smesh is not None:
            y = halo_conv(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides=self.strides,
                padding=self.padding,
                mesh=smesh,
                precision=_precision_for(self.dtype),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=_precision_for(self.dtype),
            )
        y = y + bias.astype(self.dtype)
        # remat="conv" policy anchor: under save_only_these_names("conv_out")
        # these tensors are kept through backward while the GN/SiLU chains
        # between them are recomputed. A bare name_p tag otherwise — free.
        y = checkpoint_name(y, "conv_out")
        self.tap(y, "output")
        return y


class VDense(TapModule):
    """Linear layer for the attention projections (kernel stored (in, out))."""

    features: int = 0
    dtype: Any = jnp.float32
    full_name: str = ""
    capture: CaptureTable = ()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        self.tap(x, "input")
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _torch_conv_kernel_init, (in_ch, self.features))
        bias = self.param("bias", _torch_bias_init(in_ch), (self.features,))
        y = (
            jnp.dot(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=self.dtype,
                precision=_precision_for(self.dtype),
            )
            + bias.astype(self.dtype)
        )
        self.tap(y, "output")
        return y


class VGroupNorm(TapModule):
    """GroupNorm with optional trailing SiLU fusion.

    When a tap targets this module's output the fusion is split so the tapped
    tensor is the pure norm output (capture-point parity with diffusers,
    where SiLU is a separate op after norm1/norm2).
    """

    num_groups: int = 32
    eps: float = 1e-6
    fuse_silu: bool = False
    impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    @nn.compact
    def __call__(self, x: jax.Array, params_only: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if params_only:
            return scale, bias  # see VConv.__call__: fused-path param access
        self.tap(x, "input")
        out_specs = self._specs_for("output")
        if self.fuse_silu and not out_specs:
            return group_norm(
                x, scale, bias, self.num_groups, self.eps, fuse_silu=True,
                impl=self.impl,
            )
        if self._pallas_stats_ok(x, out_specs):
            # impl="pallas" + a mean_abs output tap: the normalize kernel
            # emits the per-channel |z| sums in its own write pass, so the
            # SiLU fusion survives the tap (the XLA path must split it)
            from ..ops.pallas_group_norm import group_norm_silu_with_stats

            y, mean_abs = group_norm_silu_with_stats(
                x, scale, bias, self.num_groups, self.eps,
                fuse_silu=self.fuse_silu,
            )
            self.sow_stat(
                f"{self.full_name}.output.mean_abs_activation_per_channel",
                mean_abs,
            )
            return y
        y = group_norm(
            x, scale, bias, self.num_groups, self.eps, fuse_silu=False,
            impl=self.impl,
        )
        self.tap(y, "output")
        return silu(y) if self.fuse_silu else y

    def _pallas_stats_ok(self, x: jax.Array, out_specs) -> bool:
        if self.impl != "pallas" or not out_specs:
            return False
        if any(set(m) != {"mean_abs_activation_per_channel"}
               for _, _, m in out_specs):
            return False
        from ..ops import pallas_group_norm

        return pallas_group_norm.eligible(x, self.num_groups, self.impl)


# scalar metrics the fused resnet kernel can emit for gn outputs in-kernel
_FUSED_TAP_METRICS = frozenset({"mean_abs_activation_per_channel"})


def _resnet_remat_cls(remat: Any) -> Any:
    """Resolve the ``remat`` mode to a (possibly rematerialized) block class.

    - ``False``/``"none"``: no remat — every activation lives until backward.
    - ``True``/``"full"``: classic block remat. Only each block's INPUT is
      saved; the backward pass recomputes both convolutions, costing ~2 extra
      conv forwards per block (measured ~14% end-to-end at 256px on v5e).
    - ``"conv"``: selective remat. Conv outputs (tagged ``conv_out`` in
      ``VConv``) are saved; the backward recomputes only the FLOP-free
      GroupNorm+SiLU chains between them. Frees the norm/act intermediates
      (≈2 of the ~4 large per-block tensors) for near-zero extra FLOPs —
      the right memory/compute point for conv nets on TPU, where the MXU
      convs are the expensive thing and elementwise recompute rides HBM
      bandwidth already paid for in the backward pass.

    - ``"offload"``: ``"conv"``'s saved set, moved off-chip. Conv outputs
      are offloaded to ``pinned_host`` memory at forward time and fetched
      back in the backward (``save_and_offload_only_these_names``), so HBM
      holds only the block inputs — the ``"full"`` footprint — while the
      backward pays PCIe transfers instead of conv recompute. Measured
      (PERF.md "Offload remat at 1024px"): the transfers cost more than
      the recompute at every size that runs (256px b8: 241.7 ms vs
      full's 154.9), and at the memory-wall sizes it was built for the
      offload schedule itself exhausts device memory on this backend
      (512px b8 and 1024px b1 both RESOURCE_EXHAUSTED where full/conv
      run) — keep ``"full"`` at the memory wall; this mode is for
      backends where host offload DMA is cheap and the staging is
      genuinely host-resident.

    With ``impl="fused"`` the Pallas path never materializes the norm/act
    intermediates in the first place, so ``"conv"`` degenerates to saving the
    fused op's outputs (same behavior, nothing extra to drop).
    """
    if not remat or remat == "none":
        return ResnetBlock2D
    if remat is True or remat == "full":
        return nn.remat(ResnetBlock2D)
    if remat == "conv":
        return nn.remat(
            ResnetBlock2D,
            policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
        )
    if remat == "offload":
        return nn.remat(
            ResnetBlock2D,
            policy=jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=["conv_out"],
                offload_src="device",
                offload_dst="pinned_host",
            ),
        )
    raise ValueError(
        "remat must be one of False/'none'/True/'full'/'conv'/'offload', "
        f"got {remat!r}"
    )


class ResnetBlock2D(TapModule):
    """norm1+SiLU -> conv1 -> norm2+SiLU -> conv2, residual with optional
    1x1 conv_shortcut when channel counts differ (diffusers ResnetBlock2D).

    ``impl="fused"`` computes each norm+SiLU+conv as ONE Pallas TPU kernel
    (``ops.pallas_resnet.gn_silu_conv3x3``): the normalize/affine/SiLU happens
    in the conv's input read and the residual add in its epilogue, removing
    the FLOP-free HBM passes XLA keeps between the norm and the conv. The
    ``norm*.output`` activation taps come back as in-kernel side outputs
    (per-channel |gn| sums) instead of separate reductions — the zero-cost
    replacement for the reference's forward hooks
    (src/tracking/monitor.py:82-139). Falls back to the unfused path per
    block when shapes/dtype are ineligible or a requested capture needs a
    tensor the fusion never materializes (conv1.input, conv2 output
    pre-residual, or non-|x| metrics of the gn outputs).
    """

    in_channels: int = 0
    out_channels: int = 0
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32
    impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        fn = self.full_name
        common = dict(dtype=self.dtype, capture=self.capture)
        norm_common = dict(
            num_groups=self.num_groups, eps=self.eps, fuse_silu=True,
            impl=self.impl, capture=self.capture,
        )
        self.norm1 = VGroupNorm(full_name=f"{fn}.norm1", **norm_common)
        self.conv1 = VConv(
            features=self.out_channels, full_name=f"{fn}.conv1", **common
        )
        self.norm2 = VGroupNorm(full_name=f"{fn}.norm2", **norm_common)
        self.conv2 = VConv(
            features=self.out_channels, full_name=f"{fn}.conv2", **common
        )
        if self.in_channels != self.out_channels:
            self.conv_shortcut = VConv(
                features=self.out_channels,
                kernel_size=(1, 1),
                padding=((0, 0), (0, 0)),
                full_name=f"{fn}.conv_shortcut",
                **common,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self._fused_ok(x):
            return self._forward_fused(x)
        h = self.norm1(x)
        h = self.conv1(h)
        h = self.norm2(h)
        h = self.conv2(h)
        if self.in_channels != self.out_channels:
            x = self.conv_shortcut(x)
        return x + h

    # ------------------------------------------------------------------ #
    # Fused Pallas path
    # ------------------------------------------------------------------ #
    def _sub_specs(self, sub: str, point: str) -> Tuple[CaptureSpec, ...]:
        name = f"{self.full_name}.{sub}"
        return tuple(
            s for s in self.capture if s[0] == name and s[1] == point
        )

    def _fused_captures_ok(self) -> bool:
        """Every capture under this block must target a tensor the fused
        path materializes (x, conv1 output, shortcut in/out) or a gn-output
        metric the kernel emits as a side output."""
        prefix = f"{self.full_name}."
        materialized = {
            ("norm1", "input"),
            ("norm2", "input"),
            ("conv1", "output"),
            ("conv_shortcut", "input"),
            ("conv_shortcut", "output"),
        }
        for layer, point, metrics in self.capture:
            if not layer.startswith(prefix):
                continue
            sub = layer[len(prefix):]
            if (sub, point) in materialized:
                continue
            if (
                (sub, point) in (("norm1", "output"), ("norm2", "output"))
                and set(metrics) <= _FUSED_TAP_METRICS
            ):
                continue
            return False
        return True

    # Fuse only at small spatial sizes, where the XLA op sequence is
    # latency/bandwidth-bound and the single-pass kernel wins (measured on
    # v5e, batch 8: 512ch@32px fused 72us vs XLA 177us fwd, 365 vs 440us
    # fwd+bwd). At large spatial sizes XLA's conv already runs at ~100% MFU
    # with the norm fully hidden behind it (512ch@64px: 760us vs a 784us
    # pure-conv roofline) and the fused kernel LOSES (894us) — there is no
    # elementwise time left to reclaim, so those shapes stay on XLA.
    # experiments/fused_bench.py reproduces the sweep.
    _FUSED_MAX_HW = 1024  # 32x32: the measured win/loss crossover

    def _fused_ok(self, x: jax.Array) -> bool:
        if self.impl != "fused":
            return False
        from ..ops import pallas_resnet

        if self.dtype != jnp.bfloat16:
            return False  # f32 parity requires HIGHEST-precision XLA convs
        n, h, w, _ = x.shape
        if h * w > self._FUSED_MAX_HW:
            return False
        mid = jax.ShapeDtypeStruct((n, h, w, self.out_channels), jnp.bfloat16)
        return (
            pallas_resnet.eligible(x, self.out_channels, self.num_groups)
            and pallas_resnet.eligible(mid, self.out_channels, self.num_groups)
            and self._fused_captures_ok()
        )

    def _tap_materialized(self, sub: str, point: str, x: jax.Array) -> None:
        self._emit_specs(self._sub_specs(sub, point), x)

    def _forward_fused(self, x: jax.Array) -> jax.Array:
        from ..ops.pallas_resnet import gn_silu_conv3x3

        x = x.astype(self.dtype)
        n, hh, ww, _ = x.shape
        # the kernel's tap side output is a per-sample spatial SUM (B, C);
        # weight by the installed batch-validity mask (ops/stats.tap_mask)
        # like the XLA taps do, so pad rows carry zero statistical weight
        from ..ops.stats import mask_for

        _m = mask_for(jnp.zeros((n, 1)))
        if _m is None:
            denom = float(n * hh * ww)
        else:
            denom = jnp.maximum(jnp.sum(_m), 1.0) * float(hh * ww)

        def _tap_reduce(tap):
            if _m is None:
                return jnp.sum(tap, axis=0) / denom
            return jnp.sum(tap * _m[:, None], axis=0) / denom
        g1, gb1 = self.norm1(x, params_only=True)
        k1, kb1 = self.conv1(x, params_only=True)
        self._tap_materialized("norm1", "input", x)
        emit1 = bool(self._sub_specs("norm1", "output"))
        h, tap1, _ = gn_silu_conv3x3(
            x, g1, gb1, k1, kb1,
            num_groups=self.num_groups, eps=self.eps, emit_tap=emit1,
        )
        # tag like VConv does so remat='conv' saves the fused op's outputs
        # (without the tag, save_only_these_names would save nothing inside
        # the block and backward would recompute BOTH fused kernels)
        h = checkpoint_name(h, "conv_out")
        if tap1 is not None:
            self.sow_stat(
                f"{self.full_name}.norm1.output."
                "mean_abs_activation_per_channel",
                _tap_reduce(tap1),
            )
        residual = (
            self.conv_shortcut(x)
            if self.in_channels != self.out_channels
            else x
        )
        g2, gb2 = self.norm2(h, params_only=True)
        k2, kb2 = self.conv2(h, params_only=True)
        self._tap_materialized("conv1", "output", h)
        self._tap_materialized("norm2", "input", h)
        emit2 = bool(self._sub_specs("norm2", "output"))
        y, tap2, _ = gn_silu_conv3x3(
            h, g2, gb2, k2, kb2,
            num_groups=self.num_groups, eps=self.eps,
            residual=residual.astype(self.dtype), emit_tap=emit2,
        )
        y = checkpoint_name(y, "conv_out")
        if tap2 is not None:
            self.sow_stat(
                f"{self.full_name}.norm2.output."
                "mean_abs_activation_per_channel",
                _tap_reduce(tap2),
            )
        return y


class AttentionBlock(TapModule):
    """Single-head self-attention over spatial positions (diffusers
    Attention as used in the VAE mid block: group_norm -> q/k/v -> softmax
    (fp32) -> out projection -> residual).

    ``attn_impl`` selects the softmax materialization: ``naive`` builds the
    full (tokens x tokens) logits matrix; ``chunked`` streams key chunks with
    online softmax (ops/attention.py) — O(N*chunk) memory instead of O(N^2),
    the 1024px enabler; ``flash`` runs the fused Pallas kernel
    (ops/pallas_attention.py) — chunked's memory at naive-or-better speed
    (falls back to chunked when its shape constraints don't hold);
    ``auto`` (default) picks naive up to 4096 tokens (<=512px mid block)
    and chunked above, EXCEPT that naive is kept above the threshold while
    the backward's quadratic residual still fits (batch 1 @1024px — the
    measured in-model winner) — the TRAINING policy; forward-only CLIs
    resolve ``auto`` through ``ops.attention.resolve_serving_impl``, which
    takes flash from 4096 tokens up. Both measured tables live on the
    resolvers' docstrings."""

    channels: int = 0
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32
    impl: str = "auto"
    attn_impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        fn = self.full_name
        self.group_norm = VGroupNorm(
            num_groups=self.num_groups,
            eps=self.eps,
            impl=self.impl,
            full_name=f"{fn}.group_norm",
            capture=self.capture,
        )
        common = dict(features=self.channels, dtype=self.dtype, capture=self.capture)
        self.to_q = VDense(full_name=f"{fn}.to_q", **common)
        self.to_k = VDense(full_name=f"{fn}.to_k", **common)
        self.to_v = VDense(full_name=f"{fn}.to_v", **common)
        self.to_out = [VDense(full_name=f"{fn}.to_out.0", **common)]

    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = self.group_norm(x)
        h = h.reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        scale = 1.0 / math.sqrt(c)
        prec = _precision_for(self.dtype)
        impl = resolve_impl(self.attn_impl, hh * ww, c, batch=b)
        if impl == "flash":
            from ..ops import pallas_attention

            # explicit flash (training auto never resolves to it — see the
            # resolver's measured table): fall back to the memory-equal
            # streaming impl when the kernel's shape/mesh constraints
            # don't hold
            if not pallas_attention.eligible(hh * ww, c):
                impl = "chunked"
        if impl == "flash":
            from ..ops.pallas_attention import flash_attention

            h = flash_attention(
                q, k, v, scale=scale, out_dtype=self.dtype, precision=prec,
            )
        elif impl == "chunked":
            h = chunked_attention(
                q, k, v, scale=scale, out_dtype=self.dtype, precision=prec,
            )
        else:
            logits = jnp.einsum(
                "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32,
                precision=prec,
            ) * scale
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            h = jnp.einsum(
                "bqk,bkc->bqc", attn, v, preferred_element_type=self.dtype,
                precision=prec,
            )
        h = self.to_out[0](h)
        return x + h.reshape(b, hh, ww, c)


class Downsample2D(TapModule):
    """Stride-2 conv with asymmetric (0,1) padding (diffusers Downsample2D
    with use_conv=True, padding=0 + F.pad (0,1,0,1))."""

    channels: int = 0
    dtype: Any = jnp.float32
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        self.conv = VConv(
            features=self.channels,
            strides=(2, 2),
            padding=((0, 1), (0, 1)),
            dtype=self.dtype,
            full_name=f"{self.full_name}.conv",
            capture=self.capture,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv(x)


class Upsample2D(TapModule):
    """Nearest-neighbor 2x upsample followed by 3x3 conv (diffusers
    Upsample2D with use_conv=True).

    Computed as ONE input-dilated convolution with the 4x4 combined kernel
    ``w4[a,b] = sum_{p,q in {0,1}} w[a-p, b-q]``: nearest-2x equals
    zero-insertion followed by a 2x2 ones-kernel conv, so the pair collapses
    into ``conv(x, w4, lhs_dilation=2, padding=2)``. Mathematically exact;
    measured 2.33x faster on v5e than materializing the upsampled tensor
    (XLA's TPU conv exploits the dilation zeros), and it skips one full
    read+write of the 4x-sized activation. The parameter stays the plain
    (3, 3, I, O) kernel under ``conv/`` (checkpoint contract unchanged).
    Falls back to the materialized form only when a capture tap needs the
    upsampled conv input."""

    channels: int = 0
    dtype: Any = jnp.float32
    full_name: str = ""
    capture: CaptureTable = ()

    def _input_tapped(self) -> bool:
        # a tap on the conv INPUT needs the materialized upsampled tensor
        name = f"{self.full_name}.conv"
        return any(s[0] == name and s[1] == "input" for s in self.capture)

    def setup(self):
        self.conv = VConv(
            features=self.channels,
            dtype=self.dtype,
            fuse_nearest_upsample=not self._input_tapped(),
            full_name=f"{self.full_name}.conv",
            capture=self.capture,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self._input_tapped():
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


class DownEncoderBlock2D(TapModule):
    in_channels: int = 0
    out_channels: int = 0
    remat: Any = False
    num_layers: int = 2
    add_downsample: bool = True
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32
    impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        fn = self.full_name
        resnet_cls = _resnet_remat_cls(self.remat)
        self.resnets = [
            resnet_cls(
                in_channels=self.in_channels if j == 0 else self.out_channels,
                out_channels=self.out_channels,
                num_groups=self.num_groups,
                eps=self.eps,
                dtype=self.dtype,
                impl=self.impl,
                full_name=f"{fn}.resnets.{j}",
                capture=self.capture,
            )
            for j in range(self.num_layers)
        ]
        if self.add_downsample:
            self.downsamplers = [
                Downsample2D(
                    channels=self.out_channels,
                    dtype=self.dtype,
                    full_name=f"{fn}.downsamplers.0",
                    capture=self.capture,
                )
            ]

    def __call__(self, x: jax.Array) -> jax.Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.add_downsample:
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock2D(TapModule):
    in_channels: int = 0
    out_channels: int = 0
    remat: Any = False
    num_layers: int = 3
    add_upsample: bool = True
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32
    impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        fn = self.full_name
        resnet_cls = _resnet_remat_cls(self.remat)
        self.resnets = [
            resnet_cls(
                in_channels=self.in_channels if j == 0 else self.out_channels,
                out_channels=self.out_channels,
                num_groups=self.num_groups,
                eps=self.eps,
                dtype=self.dtype,
                impl=self.impl,
                full_name=f"{fn}.resnets.{j}",
                capture=self.capture,
            )
            for j in range(self.num_layers)
        ]
        if self.add_upsample:
            self.upsamplers = [
                Upsample2D(
                    channels=self.out_channels,
                    dtype=self.dtype,
                    full_name=f"{fn}.upsamplers.0",
                    capture=self.capture,
                )
            ]

    def __call__(self, x: jax.Array) -> jax.Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.add_upsample:
            x = self.upsamplers[0](x)
        return x


class UNetMidBlock2D(TapModule):
    channels: int = 0
    remat: Any = False
    num_groups: int = 32
    eps: float = 1e-6
    use_attention: bool = True
    dtype: Any = jnp.float32
    impl: str = "auto"
    attn_impl: str = "auto"
    full_name: str = ""
    capture: CaptureTable = ()

    def setup(self):
        fn = self.full_name
        resnet_cls = _resnet_remat_cls(self.remat)
        common = dict(
            num_groups=self.num_groups, eps=self.eps, dtype=self.dtype,
            impl=self.impl, capture=self.capture,
        )
        self.resnets = [
            resnet_cls(
                in_channels=self.channels,
                out_channels=self.channels,
                full_name=f"{fn}.resnets.{j}",
                **common,
            )
            for j in range(2)
        ]
        if self.use_attention:
            self.attentions = [
                AttentionBlock(
                    channels=self.channels,
                    attn_impl=self.attn_impl,
                    full_name=f"{fn}.attentions.0",
                    **common,
                )
            ]

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.resnets[0](x)
        if self.use_attention:
            x = self.attentions[0](x)
        x = self.resnets[1](x)
        return x


class Encoder(TapModule):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32
    impl: str = "auto"
    attn_impl: str = "auto"
    remat: Any = False
    full_name: str = "encoder"
    capture: CaptureTable = ()

    def setup(self):
        cfg = self.config
        fn = self.full_name
        boc = cfg.block_out_channels
        self.conv_in = VConv(
            features=boc[0], dtype=self.dtype,
            full_name=f"{fn}.conv_in", capture=self.capture,
        )
        blocks = []
        for i, out_ch in enumerate(boc):
            in_ch = boc[i - 1] if i > 0 else boc[0]
            blocks.append(
                DownEncoderBlock2D(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    remat=self.remat,
                    num_layers=cfg.layers_per_block,
                    add_downsample=i < len(boc) - 1,
                    num_groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps,
                    dtype=self.dtype,
                    impl=self.impl,
                    full_name=f"{fn}.down_blocks.{i}",
                    capture=self.capture,
                )
            )
        self.down_blocks = blocks
        self.mid_block = UNetMidBlock2D(
            channels=boc[-1],
            remat=self.remat,
            num_groups=cfg.norm_num_groups,
            eps=cfg.norm_eps,
            use_attention=cfg.mid_block_attention,
            dtype=self.dtype,
            impl=self.impl,
            attn_impl=self.attn_impl,
            full_name=f"{fn}.mid_block",
            capture=self.capture,
        )
        self.conv_norm_out = VGroupNorm(
            num_groups=cfg.norm_num_groups,
            eps=cfg.norm_eps,
            fuse_silu=True,
            impl=self.impl,
            full_name=f"{fn}.conv_norm_out",
            capture=self.capture,
        )
        self.conv_out = VConv(
            features=2 * cfg.latent_channels,
            dtype=self.dtype,
            full_name=f"{fn}.conv_out",
            capture=self.capture,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        x = self.conv_norm_out(x)
        return self.conv_out(x)


class Decoder(TapModule):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32
    impl: str = "auto"
    attn_impl: str = "auto"
    remat: Any = False
    full_name: str = "decoder"
    capture: CaptureTable = ()

    def setup(self):
        cfg = self.config
        fn = self.full_name
        reversed_boc = tuple(reversed(cfg.block_out_channels))
        self.conv_in = VConv(
            features=reversed_boc[0], dtype=self.dtype,
            full_name=f"{fn}.conv_in", capture=self.capture,
        )
        self.mid_block = UNetMidBlock2D(
            channels=reversed_boc[0],
            remat=self.remat,
            num_groups=cfg.norm_num_groups,
            eps=cfg.norm_eps,
            use_attention=cfg.mid_block_attention,
            dtype=self.dtype,
            impl=self.impl,
            attn_impl=self.attn_impl,
            full_name=f"{fn}.mid_block",
            capture=self.capture,
        )
        blocks = []
        for i, out_ch in enumerate(reversed_boc):
            in_ch = reversed_boc[i - 1] if i > 0 else reversed_boc[0]
            blocks.append(
                UpDecoderBlock2D(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    remat=self.remat,
                    num_layers=cfg.layers_per_block + 1,
                    add_upsample=i < len(reversed_boc) - 1,
                    num_groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps,
                    dtype=self.dtype,
                    impl=self.impl,
                    full_name=f"{fn}.up_blocks.{i}",
                    capture=self.capture,
                )
            )
        self.up_blocks = blocks
        self.conv_norm_out = VGroupNorm(
            num_groups=cfg.norm_num_groups,
            eps=cfg.norm_eps,
            fuse_silu=True,
            impl=self.impl,
            full_name=f"{fn}.conv_norm_out",
            capture=self.capture,
        )
        self.conv_out = VConv(
            features=cfg.out_channels,
            dtype=self.dtype,
            full_name=f"{fn}.conv_out",
            capture=self.capture,
        )

    def __call__(self, z: jax.Array) -> jax.Array:
        z = self.conv_in(z)
        z = self.mid_block(z)
        for block in self.up_blocks:
            z = block(z)
        z = self.conv_norm_out(z)
        return self.conv_out(z)


class AutoencoderKL(nn.Module):
    """The full VAE. ``__call__(pixel_values, sample_posterior, rng)`` returns
    the reference wrapper's output contract (src/models/sdxl_vae_wrapper.py:42-77):
    reconstruction, latent_dist, latents_sampled (no scaling_factor applied)."""

    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32
    impl: str = "auto"
    attn_impl: str = "auto"
    remat: Any = False
    capture: CaptureTable = ()

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            config=cfg, dtype=self.dtype, impl=self.impl,
            attn_impl=self.attn_impl, remat=self.remat,
            full_name="encoder", capture=self.capture,
        )
        self.decoder = Decoder(
            config=cfg, dtype=self.dtype, impl=self.impl,
            attn_impl=self.attn_impl, remat=self.remat,
            full_name="decoder", capture=self.capture,
        )
        self.quant_conv = VConv(
            features=2 * cfg.latent_channels,
            kernel_size=(1, 1),
            padding=((0, 0), (0, 0)),
            dtype=self.dtype,
            full_name="quant_conv",
            capture=self.capture,
        )
        self.post_quant_conv = VConv(
            features=cfg.latent_channels,
            kernel_size=(1, 1),
            padding=((0, 0), (0, 0)),
            dtype=self.dtype,
            full_name="post_quant_conv",
            capture=self.capture,
        )

    def encode(self, x: jax.Array) -> DiagonalGaussianDistribution:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussianDistribution.from_moments(moments)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(
        self,
        pixel_values: jax.Array,
        sample_posterior: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        latent_dist = self.encode(pixel_values)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("sample")
            latents = latent_dist.sample(rng)
        else:
            latents = latent_dist.mode()
        reconstruction = self.decode(latents.astype(self.dtype))
        return {
            "reconstruction": reconstruction,
            "latent_dist": latent_dist,
            "latents_sampled": latents,
        }
