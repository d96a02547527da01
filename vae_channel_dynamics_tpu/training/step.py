"""Jitted train/eval steps: the SPMD replacement for the reference's
forward/backward/step hot loop (src/train.py:283-306).

One compiled program runs on every device; the batch is sharded over the
mesh's ``data`` axis and parameters are replicated, so XLA derives the
gradient all-reduce (the ``accelerator.backward`` NCCL all-reduce analog)
and global metric means (the ``accelerator.gather(...).mean()`` analog,
src/train.py:292-294) from sharding propagation — no explicit collectives.

Loss contract (src/train.py:289-291): per-element-mean MSE on float32 casts
+ kl_weight * mean per-sample KL. Padded remainder batches are handled with
a validity mask so static shapes hold without skewing metrics.

Validation contract (src/train.py:53-97): SUM-reduction MSE and summed KL,
both divided by the global sample count on the host side.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.vae import flatten_stats
from ..ops.spatial_conv import spatial_conv_scope
from ..ops.stats import tap_mask
from ..parallel.mesh import (
    SPATIAL_AXIS,
    batch_sharding,
    replicated_sharding,
    vector_sharding,
)
from .state import TrainState

logger = logging.getLogger(__name__)


def linear_warmup_decay_schedule(
    base_lr: float, warmup_steps: int, max_train_steps: int
) -> Callable[[jax.Array], jax.Array]:
    """Linear warmup then linear decay to zero — the reference's LambdaLR
    (src/train.py:197-202). Note: the reference reads ``lr_scheduler_type``
    into config but always uses this schedule (quirk SURVEY.md §5a-1);
    this remains the default via :func:`make_lr_schedule`."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, float(warmup_steps))
        progress = (count - warmup_steps) / jnp.maximum(
            1.0, float(max_train_steps - warmup_steps)
        )
        decay = jnp.maximum(0.0, 1.0 - jnp.minimum(1.0, progress))
        return base_lr * jnp.where(count < warmup_steps, warm, decay)

    return schedule


def make_lr_schedule(
    lr_scheduler_type: str,
    base_lr: float,
    warmup_steps: int,
    max_train_steps: int,
) -> Callable[[jax.Array], jax.Array]:
    """Resolve ``training.lr_scheduler_type`` to a schedule.

    The reference reads this key into config but ALWAYS runs the linear
    LambdaLR (quirk SURVEY.md §5a-1: src/train.py:197-202 vs the key's own
    comment at configs/base_config.yaml:36, which advertises "linear",
    "cosine", "constant"). Deliberate deviation [documented]: we honor the
    advertised values — behavior-identical for every shipped reference
    YAML (all set "linear" or omit the key), but a user asking for cosine
    actually gets cosine instead of a silent linear. Conventions follow HF
    diffusers ``get_scheduler`` (the library the reference's comment
    refers to): ``cosine`` = linear warmup then half-cosine decay to zero;
    ``constant`` = flat base_lr, no warmup; ``constant_with_warmup`` =
    linear warmup then flat. Unknown names warn once and fall back to
    linear (the reference's effective behavior), never crash a run.
    """
    name = (lr_scheduler_type or "linear").strip().lower()
    if name == "linear":
        return linear_warmup_decay_schedule(
            base_lr, warmup_steps, max_train_steps
        )
    if name == "constant":

        def constant(count):
            return jnp.full((), base_lr, jnp.float32)

        return constant
    if name == "constant_with_warmup":

        def constant_warmup(count):
            # HF get_constant_schedule_with_warmup: base_lr whenever
            # current_step >= num_warmup_steps — including warmup_steps=0,
            # which must degenerate to the plain constant schedule (lr at
            # step 0 is base_lr, not 0).
            count = jnp.asarray(count, jnp.float32)
            warm = count / jnp.maximum(1.0, float(warmup_steps))
            return base_lr * jnp.where(count < warmup_steps, warm, 1.0)

        return constant_warmup
    if name == "cosine":

        def cosine(count):
            count = jnp.asarray(count, jnp.float32)
            warm = count / jnp.maximum(1.0, float(warmup_steps))
            progress = (count - warmup_steps) / jnp.maximum(
                1.0, float(max_train_steps - warmup_steps)
            )
            progress = jnp.clip(progress, 0.0, 1.0)
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
            return base_lr * jnp.where(count < warmup_steps, warm, decay)

        return cosine
    logger.warning(
        "Unknown training.lr_scheduler_type %r — falling back to the "
        "linear warmup/decay schedule (the reference's behavior for every "
        "value of this key, src/train.py:197-202)",
        lr_scheduler_type,
    )
    return linear_warmup_decay_schedule(base_lr, warmup_steps, max_train_steps)


def build_optimizer(
    learning_rate: float,
    warmup_steps: int,
    max_train_steps: int,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    max_grad_norm: float = 1.0,
    gradient_accumulation_steps: int = 1,
    optimizer: str = "adamw",
    lr_scheduler_type: str = "linear",
) -> Tuple[optax.GradientTransformation, Callable]:
    """Optimizer + global-norm clipping + linear warmup/decay, with optional
    gradient accumulation (optax.MultiSteps replaces the reference's
    ``accelerator.accumulate`` context, src/train.py:286).

    ``optimizer`` [new]: ``adamw`` (default — torch-AdamW parity, pinned by
    tests/test_train_trajectory_torch_parity.py) or ``adafactor`` —
    factored second moments store O(rows+cols) per matrix instead of
    O(rows*cols), cutting optimizer-state HBM ~2x vs AdamW's two full
    moments (the standard TPU memory-efficient choice; composes with
    parallel.shard_optimizer, which shards whatever state the optimizer
    keeps). Momentum stays off (adafactor's default) so the memory saving
    is real; ``adam_weight_decay`` maps to adafactor's decoupled
    ``weight_decay_rate`` and the Adam betas/eps are ignored.

    ``lr_scheduler_type`` honors the reference's advertised-but-ignored
    config key (see :func:`make_lr_schedule`); default ``linear`` is the
    reference's actual schedule."""
    schedule = make_lr_schedule(
        lr_scheduler_type, learning_rate, warmup_steps, max_train_steps
    )
    components = []
    if max_grad_norm and max_grad_norm > 0:
        components.append(optax.clip_by_global_norm(max_grad_norm))
    if optimizer == "adafactor":
        components.append(
            optax.adafactor(
                learning_rate=schedule,
                weight_decay_rate=adam_weight_decay or None,
            )
        )
    elif optimizer == "adamw":
        components.append(
            optax.adamw(
                learning_rate=schedule,
                b1=adam_beta1,
                b2=adam_beta2,
                eps=adam_epsilon,
                weight_decay=adam_weight_decay,
            )
        )
    else:
        raise ValueError(
            f"Unknown training.optimizer '{optimizer}' "
            "(expected 'adamw' or 'adafactor')"
        )
    tx = optax.chain(*components)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx, schedule


def _masked_mean(per_sample: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def dequantize_pixels(pixel_values: jax.Array) -> jax.Array:
    """uint8 batches (data.transfer_dtype: uint8 — 4x smaller host->device
    transfers) dequantize to [-1, 1] float ON DEVICE; float batches pass
    through. The uint8 path reproduces the reference pipeline exactly: PIL
    resize yields uint8 images and ToTensor/Normalize maps v -> v/127.5 - 1
    (src/data_utils.py:24-30)."""
    if pixel_values.dtype == jnp.uint8:
        return pixel_values.astype(jnp.float32) / 127.5 - 1.0
    return pixel_values


def _params_compute_sharding(mesh, params_sharding, spatial_conv="gspmd"):
    """The params' compute-time sharding, or None when no re-constraint is
    needed: on a mesh WITH a ``spatial`` axis, sharded parameter leaves
    must be re-replicated before the model runs.

    jax 0.9.0 GSPMD miscompiles the BACKWARD of the model whenever
    parameter leaves are sharded while activations are spatially sharded
    (halo exchange over H): the forward loss is exact, but the parameter
    gradients come back wrong by large factors (discovered round 5 —
    ZeRO-3 under a spatial mesh trained silently wrong; the kernel-grad
    convs of O-sharded kernels on the tensor axis are wrong in the
    FORWARD too). tests/test_spatial_tensor_guard.py pins the repros as
    strict-xfail canaries. The workaround: the step constrains the params
    to fully-replicated at the top of the forward
    (``jax.lax.with_sharding_constraint``) — XLA all-gathers each weight
    at use (exactly the collective ZeRO-3 would schedule anyway), every
    conv runs the known-good replicated-kernel halo program, and the
    constraint's transpose reduce-scatters the gradients back onto the
    at-rest layout for the sharded optimizer update. Asserted
    grad-bit-identical to the replicated-params spatial program in
    tests/test_spatial_tensor_guard.py; at-rest memory relief (1/N
    params/moments/EMA) is unchanged. Data-only (non-spatial) meshes
    return None — their ZeRO/TP compute paths are correct raw and keep
    their measured schedules.

    ``spatial_conv="shard_map"`` also returns None: with every conv's
    spatial axis handled manually under shard_map (ops/spatial_conv.py)
    there is no GSPMD halo program left to miscompile, and sharded params
    take the standard (correct) non-spatial gather-at-use path — asserted
    against the replicated oracle in tests/test_spatial_conv.py."""
    if (
        mesh is None
        or params_sharding is None
        or SPATIAL_AXIS not in mesh.axis_names
        or spatial_conv == "shard_map"
    ):
        return None
    sharded = any(
        not getattr(s, "is_fully_replicated", True)
        for s in jax.tree.leaves(params_sharding)
    )
    return replicated_sharding(mesh) if sharded else None


def _forward_with_stats(module, params, pixel_values, rng, sample_posterior):
    out, mutated = module.apply(
        {"params": params},
        pixel_values,
        sample_posterior=sample_posterior,
        rng=rng,
        mutable=["stats"],
    )
    return out, flatten_stats(mutated.get("stats", {}))


def _losses(out, pixel_values, mask):
    recon = out["reconstruction"].astype(jnp.float32)
    pixels = pixel_values.astype(jnp.float32)
    # per-sample mean squared error over pixel dims
    sq = jnp.mean(jnp.square(recon - pixels), axis=tuple(range(1, recon.ndim)))
    rec_loss = _masked_mean(sq, mask)
    kl_loss = _masked_mean(out["latent_dist"].kl(), mask)
    return rec_loss, kl_loss


def default_stats_accumulate(
    acc: Dict[str, jax.Array], stats: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Running-sum accumulation of per-forward statistics; the interval mean
    (sum / count) reproduces the reference's mean-of-stacked-values
    aggregation (src/tracking/monitor.py:179-186)."""
    return {k: acc[k] + stats[k] for k in acc} if acc else {}


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    kl_weight: float,
    mesh=None,
    stats_accumulate: Optional[Callable] = None,
    map_keys: Tuple[str, ...] = (),
    donate: bool = True,
    ema_decay: float = 0.0,
    state_sharding=None,
    spatial_conv: str = "gspmd",
):
    """Build the jitted train step.

    Returns ``step_fn(state, batch, mask, rng) -> (state, metrics, maps)``.
    ``maps`` carries full activation maps for ``map_keys`` (captured by the
    module's capture table) — only materialized when the monitor's track
    interval is due; the plain step variant is built with a capture table
    that omits them.

    ``state_sharding`` (optional, requires ``mesh``): a sharding pytree
    matching the TrainState, used for the state's in/out shardings instead
    of full replication — this is how ``parallel.shard_optimizer`` (ZeRO-1)
    plugs in: with the optimizer moments sharded over the data axis, XLA
    rewrites the gradient all-reduce into reduce-scatter + sharded update +
    param all-gather purely from these annotations (see parallel/zero.py).
    """
    accumulate = stats_accumulate or default_stats_accumulate
    compute_sharding = _params_compute_sharding(
        mesh,
        getattr(state_sharding, "params", None)
        if state_sharding is not None
        else None,
        spatial_conv,
    )
    # parallel.spatial_conv="shard_map": convs halo-exchange manually
    # under shard_map (ops/spatial_conv.py) instead of via GSPMD's
    # (jax-0.9.0-miscompiled) halo partitioner; the scope is consulted by
    # VConv at trace time. Inactive (scope installs nothing) off spatial
    # meshes.
    conv_mesh = mesh if spatial_conv == "shard_map" else None

    def step_fn(state: TrainState, batch, mask, rng):
        rng_step = jax.random.fold_in(rng, state.step)
        pixel_values = dequantize_pixels(batch["pixel_values"])

        def loss_fn(params):
            if compute_sharding is not None:
                # sharded params under a spatial mesh: re-replicate at use
                # (GSPMD backward miscompile workaround — see
                # _params_compute_sharding)
                params = jax.lax.with_sharding_constraint(
                    params, compute_sharding
                )
            out, stats = _forward_with_stats(
                module, params, pixel_values, rng_step, True
            )
            rec_loss, kl_loss = _losses(out, pixel_values, mask)
            loss = rec_loss + kl_weight * kl_loss
            return loss, (rec_loss, kl_loss, stats)

        # tap_mask: the activation-stat taps weight per-sample contributions
        # by the batch validity mask, so remainder-batch pad rows (duplicates
        # of the last sample, parallel/mesh.pad_batch_to_multiple) carry zero
        # weight — reference hook semantics, which never pad. Trace-time
        # context: the mask tracer and the tap tracers share this trace.
        with tap_mask(mask), spatial_conv_scope(conv_mesh):
            (loss, (rec_loss, kl_loss, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        maps = {k: stats[k] for k in map_keys if k in stats}
        scalar_stats = {k: v for k, v in stats.items() if k not in maps}
        new_acc = accumulate(state.stats_acc, scalar_stats)

        ema_params = state.ema_params
        if ema_decay > 0.0 and ema_params is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            blended = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema_params, params,
            )
            if hasattr(opt_state, "mini_step"):
                # gradient accumulation (optax.MultiSteps): blend only on
                # micro-steps where the optimizer actually applied an
                # update (mini_step wrapped to 0) — otherwise k-step
                # accumulation would decay the EMA k times per update
                # (effective decay d^k, shrinking the averaging horizon)
                did_update = opt_state.mini_step == 0
                ema_params = jax.tree.map(
                    lambda b, e: jnp.where(did_update, b, e),
                    blended, ema_params,
                )
            else:
                ema_params = blended

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            stats_acc=new_acc,
            stats_count=state.stats_count + 1.0,
            ema_params=ema_params,
        )
        metrics = {
            "train_loss_step": loss,
            "rec_loss": rec_loss,
            "kl_loss": kl_loss,
            "grad_norm": grad_norm,
        }
        return new_state, metrics, maps

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    img = batch_sharding(mesh)
    vec = vector_sharding(mesh)
    state_spec = state_sharding if state_sharding is not None else repl
    return jax.jit(
        step_fn,
        in_shardings=(state_spec, {"pixel_values": img}, vec, repl),
        out_shardings=(state_spec, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(module, mesh=None, params_sharding=None, spatial_conv="gspmd"):
    """Deterministic (mode) forward returning SUM-convention losses for
    validation (src/train.py:77-78) plus the per-element-mean MSE used by
    evaluate.py (src/evaluate.py:231-240).

    ``params_sharding`` (optional, requires ``mesh``): the params' sharding
    pytree when the live params are ZeRO-3-sharded (parallel.shard_params)
    — jit rejects committed arrays whose sharding differs from
    in_shardings, so validation must declare the layout it is given.

    ``spatial_conv`` mirrors the train step (shard_map convs need no
    re-replication; see _params_compute_sharding)."""
    compute_sharding = _params_compute_sharding(mesh, params_sharding, spatial_conv)
    conv_mesh = mesh if spatial_conv == "shard_map" else None

    def eval_fn(params, batch, mask):
        if compute_sharding is not None:
            # sharded params under a spatial mesh: same re-replicated
            # compute layout as the train step (the forward alone measures
            # exact raw, but uniform semantics cost one already-needed
            # gather — see _params_compute_sharding)
            params = jax.lax.with_sharding_constraint(params, compute_sharding)
        pixel_values = dequantize_pixels(batch["pixel_values"])
        with spatial_conv_scope(conv_mesh):
            out, _ = _forward_with_stats(module, params, pixel_values, None, False)
        recon = out["reconstruction"].astype(jnp.float32)
        pixels = pixel_values.astype(jnp.float32)
        per_sample_sq_sum = jnp.sum(
            jnp.square(recon - pixels), axis=tuple(range(1, recon.ndim))
        )
        kl = out["latent_dist"].kl()
        n_pixel_dims = recon.size // recon.shape[0]
        return {
            "rec_loss_sum": jnp.sum(per_sample_sq_sum * mask),
            "kl_sum": jnp.sum(kl * mask),
            "mse_mean_weighted": jnp.sum(per_sample_sq_sum * mask) / n_pixel_dims,
            "num_samples": jnp.sum(mask),
            "reconstruction": out["reconstruction"],
        }

    if mesh is None:
        return jax.jit(eval_fn)
    repl = replicated_sharding(mesh)
    img = batch_sharding(mesh)
    vec = vector_sharding(mesh)
    return jax.jit(
        eval_fn,
        in_shardings=(
            params_sharding if params_sharding is not None else repl,
            {"pixel_values": img},
            vec,
        ),
        out_shardings={
            "rec_loss_sum": repl,
            "kl_sum": repl,
            "mse_mean_weighted": repl,
            "num_samples": repl,
            "reconstruction": img,
        },
    )
