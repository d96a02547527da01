"""Training orchestration: the reference's ``train.main()`` loop
(src/train.py:100-464) rebuilt around a jitted SPMD step.

Differences from the reference, by design:
- one process drives all local devices (SPMD) instead of process-per-GPU;
  gradient/metric reductions come from sharding propagation
- activation statistics accumulate on device in the train state; host only
  sees them at track intervals (no per-step syncs)
- interventions are pure functional parameter updates applied identically on
  every shard (fixes the reference's main-process-only desync,
  SURVEY.md §5a-11)
- metrics are fetched lazily (log/epoch boundaries) to keep dispatch async
- checkpoints can be resumed (the reference writes but never reads them)

Documented deviations from reference quirks (SURVEY.md §5a):
- §5a-5: when tracking is disabled the reference's sentinel interval -1 makes
  ``global_step % -1 == 0`` always true, so its classifier runs EVERY step on
  empty data. Here classification only runs inside the monitor-interval block
  (tracking enabled, interval hit) — a deliberate fix: classifying nothing
  every step is pure overhead and its only observable effect is log noise.
- §5a-12: validation forwards do NOT leak into training-step stat aggregates;
  validation uses a separate eval step with no capture taps.
"""

from __future__ import annotations

import logging
import math
import os
import signal
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..analysis import VAELogitLens
from ..classification import RegionClassifier
from ..data import create_dataloader, load_and_preprocess_dataset
from ..data.pipeline import Prefetcher
from ..intervention import InterventionHandler
from ..models import SDXLVAEWrapper, VAEConfig
from ..models import io as model_io
from ..models.vae import AutoencoderKL
from ..parallel import make_mesh, replicated_sharding
from ..parallel.mesh import initialize_distributed, pad_batch_to_multiple
from ..tracking import ActivityMonitor, DeadNeuronTracker
from ..utils.config_utils import as_float, as_int
from ..utils.plotting import ActivityPlotter, DeadNeuronPlotter, plot_dead_vs_nudge
from ..utils.profiling import TraceCapture
from ..utils.reporting import build_reporter
from .checkpoint import (
    AsyncSaver,
    prune_checkpoints,
    read_resume_meta,
    restore_train_state,
    save_train_state,
)
from .state import TrainState
from .step import build_optimizer, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def resolve_model(model_config: Dict[str, Any], dtype) -> SDXLVAEWrapper:
    """Resolve ``model.pretrained_vae_name``: a local model dir is loaded
    (the evaluate-CLI artifact or a converted diffusers checkpoint); an
    unreachable HF Hub id falls back to seeded from-scratch init with a
    warning (this environment has no network egress).

    ``model.kernel_impl`` selects the compute-kernel path: ``auto`` (XLA,
    with fused Pallas resnets on TPU), ``xla``, ``pallas`` (standalone GN
    kernels), or ``fused`` (Pallas gn+silu+conv resnet kernels).

    ``model.attention_impl`` selects the mid-block attention: ``auto``
    (naive <=4096 tokens, chunked above — the 1024px memory fix),
    ``naive``, ``chunked`` (ops/attention.py), or ``flash`` (the fused
    Pallas kernel, ops/pallas_attention.py)."""
    impl = str(model_config.get("kernel_impl", "auto"))
    attn_impl = str(model_config.get("attention_impl", "auto"))
    if attn_impl not in ("auto", "naive", "chunked", "flash"):
        raise ValueError(
            f"Unknown model.attention_impl {attn_impl!r}; expected "
            "'auto', 'naive', 'chunked' or 'flash'."
        )
    # model.remat: "none" (default) | "full" (block remat, ~14% slower,
    # minimum memory) | "conv" (save conv outputs, recompute elementwise
    # only — near-free memory saver for high resolutions)
    remat = model_config.get("remat", False)
    name = model_config.get("pretrained_vae_name", "stabilityai/sdxl-vae")
    arch = model_config.get("architecture", "sdxl")
    if name and os.path.isdir(name) and os.path.exists(
        os.path.join(name, "config.json")
    ):
        cfg, params = model_io.load_model_dir(name)
        logger.info("Loaded VAE weights from local dir: %s", name)
        return SDXLVAEWrapper(
            config=cfg, params=params, dtype=dtype, impl=impl,
            attn_impl=attn_impl, remat=remat,
        )
    presets = {"sdxl": VAEConfig.sdxl, "sd": VAEConfig.sd, "tiny": VAEConfig.tiny}
    if arch not in presets:
        raise ValueError(
            f"Unknown model.architecture {arch!r}; expected one of "
            f"{sorted(presets)} (or point model.pretrained_vae_name at a "
            "local model dir)."
        )
    cfg = presets[arch]()
    if name and not os.path.isdir(name):
        logger.warning(
            "Pretrained VAE '%s' is not a local directory and the HF Hub is "
            "unreachable here; initializing the %s architecture from scratch.",
            name, arch,
        )
    return SDXLVAEWrapper(
        config=cfg, dtype=dtype, seed=int(model_config.get("init_seed", 0)),
        impl=impl, attn_impl=attn_impl, remat=remat,
    )


class Trainer:
    def __init__(self, config: Dict[str, Any], resume_from: Optional[str] = None):
        self.config = config
        self.resume_from = resume_from

        self.run_name = config.get("run_name", "vae_run")
        self.output_dir = os.path.join(
            config.get("output_dir", "./results"), self.run_name
        )
        self.logging_dir = os.path.join(self.output_dir, "logs")

        self.data_config = config.get("data", {})
        self.training_config = config.get("training", {})
        self.logging_config = config.get("logging", {})
        self.saving_config = config.get("saving", {})

        # dead-weight knobs live at the TOP level (quirk SURVEY.md §5a-2)
        self.threshold_dn = as_float(config.get("threshold"), 1e-8)
        self.mean_percentage_dn = as_float(config.get("mean_percentage"), 0.01)
        self.dead_type_dn = config.get("dead_type", "threshold")

        self.kl_weight = as_float(self.training_config.get("kl_weight"), 1e-6)
        self.mixed_precision = self.training_config.get("mixed_precision", "no")

    # ------------------------------------------------------------------ #
    def train(self) -> Dict[str, Any]:
        self._installed_shard_mesh = False
        self._installed_attn_shard_mesh = False
        try:
            return self._train_impl()
        finally:
            # kernel_impl='fused' on a mesh installs a module-global shard
            # mesh for the Pallas kernels (see below); clear it so a model
            # built later in the same process (embedded use, tests) doesn't
            # get shard_map-wrapped over this run's stale mesh. Scoped to
            # THIS trainer's install — a run that never set the global must
            # not reset one installed by the embedding application.
            if self._installed_shard_mesh:
                from ..ops import pallas_resnet

                pallas_resnet.set_shard_mesh(None)
            if self._installed_attn_shard_mesh:
                from ..ops import pallas_attention

                pallas_attention.set_shard_mesh(None)

    def _train_impl(self) -> Dict[str, Any]:
        config = self.config
        initialize_distributed()
        is_main = jax.process_index() == 0
        parallel_config = config.get("parallel", {})
        spatial = as_int(parallel_config.get("spatial"), 1)
        # parallel.slices: multi-slice pods (slices joined by DCN) — the
        # batch shards over (slice, data) jointly and gradient all-reduces
        # decompose hierarchically (ICI within a slice, DCN once per slice).
        slices = as_int(parallel_config.get("slices"), 1)
        # parallel.tensor [new]: tensor (channel) parallelism — parameters
        # shard their channel axes over an innermost ICI axis; GSPMD derives
        # the per-conv activation gathers. An HBM-relief axis beyond
        # ZeRO-3 + spatial (see SCALING.md for when each axis pays).
        tensor = as_int(parallel_config.get("tensor"), 1)
        # parallel.spatial_conv [new]: how convs partition over a spatial
        # axis. "gspmd" (default) leaves the halo exchange to XLA;
        # "shard_map" exchanges halos manually per conv
        # (ops/spatial_conv.py), which sidesteps the jax-0.9.0 GSPMD halo
        # miscompiles — enabling spatial x tensor meshes and sharded
        # params without the compute-time re-replication.
        spatial_conv = str(
            parallel_config.get("spatial_conv", "gspmd")
        ).strip().lower()
        mesh = make_mesh(
            spatial=spatial, slices=slices, tensor=tensor,
            spatial_conv=spatial_conv,
        )
        if spatial_conv == "shard_map" and spatial > 1:
            logger.info(
                "parallel.spatial_conv: shard_map — convs halo-exchange "
                "manually over the %d-way spatial axis (GSPMD halo "
                "partitioner bypassed).", spatial,
            )
        from ..parallel.mesh import data_axis_size

        n_shards = data_axis_size(mesh)
        logger.info(
            "Running experiment: %s on %d device(s) [%s]",
            self.run_name, n_shards, jax.devices()[0].platform,
        )

        if is_main:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(os.path.join(self.output_dir, "config.yaml"), "w") as f:
                yaml.dump(config, f, default_flow_style=False)

        seed = as_int(config.get("seed"), 0)
        base_rng = jax.random.PRNGKey(seed)

        report_to = self.logging_config.get("report_to", "tensorboard")
        reporter = build_reporter(
            report_to, self.output_dir, self.logging_dir,
            config.get("project_name", "vae_project"), self.run_name,
            config=config, entity=self.logging_config.get("entity"),
            is_main_process=is_main,
        )

        # ---------------- model ---------------- #
        if self.mixed_precision == "bf16":
            dtype = jnp.bfloat16
        elif self.mixed_precision == "fp16":
            logger.warning("fp16 is not native on TPU; using bfloat16 compute.")
            dtype = jnp.bfloat16
        else:
            dtype = jnp.float32
        wrapper = resolve_model(config.get("model", {}), dtype)
        if wrapper.impl == "fused" and mesh.size > 1:
            from ..ops import pallas_resnet

            if pallas_resnet.mesh_supported(mesh):
                # the batch axis is embarrassingly parallel: install the
                # mesh so the fused kernels run per-shard via shard_map on
                # each device's local batch block (params replicated)
                pallas_resnet.set_shard_mesh(mesh)
                self._installed_shard_mesh = True
                logger.info(
                    "model.kernel_impl='fused' on a %d-device data mesh: "
                    "kernels run per-shard via shard_map.", mesh.size,
                )
            else:
                # a sharded H axis would need conv halo exchange the fused
                # kernel does not implement, and multi-slice meshes add a
                # non-data axis the shard_map wrapper doesn't partition —
                # both fall back
                logger.warning(
                    "model.kernel_impl='fused' only supports pure "
                    "data-parallel meshes, not %s — falling back to "
                    "kernel_impl='auto'.", dict(mesh.shape),
                )
                wrapper.impl = "auto"
        if wrapper.attn_impl == "flash" and mesh.size > 1:
            # Only the explicit-flash path ever consults the installed mesh
            # (training 'auto' resolves to naive/chunked, never flash — see
            # ops.attention.resolve_impl), so installing it for 'auto' runs
            # would just widen the stale-global exposure for nothing.
            from ..ops import pallas_attention

            if pallas_attention.mesh_supported(mesh):
                logger.info(
                    "model.attention_impl='flash' on a %d-device mesh "
                    "%s: the kernel runs per-shard via shard_map "
                    "(sequence-parallel over a sharded spatial axis).",
                    mesh.size, dict(mesh.shape),
                )
                # the kernel must see the mesh BEFORE tracing: eligible()
                # accepts or rejects based on it, and the accepted kernel
                # shard_maps itself instead of leaving GSPMD an
                # unpartitionable custom call
                pallas_attention.set_shard_mesh(mesh)
                self._installed_attn_shard_mesh = True
            else:
                # multi-slice meshes would route the K/V all-gather
                # over DCN, where chunked's in-graph scan is the better
                # program
                logger.warning(
                    "model.attention_impl='flash' supports data/spatial "
                    "meshes, not %s — falling back to "
                    "attention_impl='auto'.", dict(mesh.shape),
                )
                wrapper.attn_impl = "auto"
        vae_config = wrapper.config
        params = wrapper.params

        # ---------------- data ---------------- #
        dc = self.data_config
        resolution = as_int(dc.get("resolution"), 256)
        per_device_batch = as_int(dc.get("batch_size"), 4)
        global_batch = per_device_batch * n_shards
        train_dataset = load_and_preprocess_dataset(
            dataset_name=dc.get("dataset_name"),
            dataset_config_name=dc.get("dataset_config_name"),
            image_column=dc.get("image_column", "image"),
            resolution=resolution,
            max_samples=dc.get("max_samples"),
            split=dc.get("train_split_name", "train"),
            streaming=bool(dc.get("streaming", False)),
            seed=seed,
            transfer_dtype=dc.get("transfer_dtype", "float32"),
        )
        # multi-host: each process loads a disjoint 1/process_count slice of
        # the global batch; arrays are stitched globally at device_put time
        process_count = jax.process_count()
        process_index = jax.process_index()
        if global_batch % max(process_count, 1) != 0:
            raise ValueError(
                f"Global batch {global_batch} must be divisible by the "
                f"process count {process_count}"
            )
        per_process_batch = global_batch // process_count
        # Multi-host: every process must emit the SAME number of batches per
        # epoch (one SPMD program). drop_last + a uniform cap derived from
        # the smallest process shard guarantees it.
        train_loader = create_dataloader(
            train_dataset, batch_size=per_process_batch,
            num_workers=as_int(dc.get("num_workers"), 0), shuffle=True,
            seed=seed, shard_index=process_index, num_shards=process_count,
            drop_last=process_count > 1,
        )
        val_loader = None
        do_validation = bool(dc.get("do_validation", False))
        if do_validation:
            try:
                val_dataset = load_and_preprocess_dataset(
                    dataset_name=dc.get(
                        "validation_dataset_name", dc.get("dataset_name")
                    ),
                    dataset_config_name=dc.get(
                        "validation_dataset_config_name",
                        dc.get("dataset_config_name"),
                    ),
                    image_column=dc.get("image_column", "image"),
                    resolution=resolution,
                    max_samples=dc.get("validation_max_samples"),
                    transfer_dtype=dc.get("transfer_dtype", "float32"),
                    split=dc.get("validation_split_name", "validation"),
                    seed=seed,
                )
                val_loader = create_dataloader(
                    val_dataset,
                    batch_size=as_int(
                        dc.get("validation_batch_size"), per_device_batch
                    ) * n_shards // process_count,
                    num_workers=as_int(dc.get("num_workers"), 0),
                    shuffle=False,
                    seed=seed,
                    shard_index=process_index,
                    num_shards=process_count,
                    drop_last=process_count > 1,
                )
            except Exception as e:  # noqa: BLE001 — parity: disable on failure
                logger.error(
                    "Failed to load validation data: %s. Disabling validation.", e
                )
                do_validation = False

        # ---------------- schedule / optimizer ---------------- #
        tc = self.training_config
        accum = max(1, as_int(tc.get("gradient_accumulation_steps"), 1))
        try:
            num_samples = len(train_dataset)
            steps_per_epoch = max(
                1, math.ceil(num_samples / global_batch / accum)
            )
        except TypeError:  # streaming dataset (train.py:188-192 semantics)
            steps_per_epoch = as_int(
                tc.get("max_steps_per_epoch_iterable"), 10000
            )
        num_train_epochs = as_int(tc.get("num_train_epochs"), 1)
        max_train_steps = num_train_epochs * steps_per_epoch
        tx, schedule = build_optimizer(
            learning_rate=as_float(tc.get("learning_rate"), 1e-5),
            warmup_steps=as_int(tc.get("lr_warmup_steps"), 100),
            max_train_steps=max_train_steps,
            adam_beta1=as_float(tc.get("adam_beta1"), 0.9),
            adam_beta2=as_float(tc.get("adam_beta2"), 0.999),
            adam_weight_decay=as_float(tc.get("adam_weight_decay"), 1e-2),
            adam_epsilon=as_float(tc.get("adam_epsilon"), 1e-8),
            max_grad_norm=as_float(tc.get("max_grad_norm"), 1.0),
            gradient_accumulation_steps=accum,
            # training.optimizer [new]: adamw (reference parity) | adafactor
            # (factored moments — ~2x less optimizer-state HBM)
            optimizer=str(tc.get("optimizer", "adamw")).lower(),
            # Honored (reference reads-and-ignores it, quirk §5a-1; every
            # shipped reference YAML says linear so behavior is unchanged)
            lr_scheduler_type=str(tc.get("lr_scheduler_type", "linear")),
        )

        # ---------------- instrumentation ---------------- #
        monitor = ActivityMonitor(config.get("tracking", {}))
        track_interval = monitor.track_interval if monitor.enabled else 0

        dnt_config = config.get("dead_neuron_tracking", {})
        dead_tracker = None
        dnt_interval = 0
        if dnt_config.get("enabled", False):
            dead_tracker = DeadNeuronTracker(
                target_layer_names_for_raw_weights=dnt_config.get(
                    "target_layer_names_for_raw_weights", []
                ),
                threshold=self.threshold_dn,
                mean_percentage=self.mean_percentage_dn,
                dead_type=self.dead_type_dn,
            )
            dnt_interval = as_int(dnt_config.get("track_interval"), 100)

        classifier_config = config.get("classification", {})
        classifier = (
            RegionClassifier(params, classifier_config)
            if classifier_config.get("enabled", False)
            else None
        )

        intervention_config = config.get("intervention", {})
        handler = (
            InterventionHandler(intervention_config)
            if intervention_config.get("enabled", False)
            else None
        )
        intervention_interval = as_int(
            intervention_config.get("intervention_interval"), 200
        )

        ll_config = config.get("logit_lens", {})
        logit_lens = None
        ll_interval = 0
        if ll_config.get("enabled", False) and is_main:
            logit_lens = VAELogitLens(
                logit_lens_config=ll_config,
                main_experiment_output_dir=self.output_dir,
                seed=seed,
            )
            ll_interval = as_int(ll_config.get("visualization_interval"), 1000)

        tracer = TraceCapture(config.get("profiling", {}), self.output_dir)

        # ---------------- jitted steps ---------------- #
        module_plain = AutoencoderKL(
            config=vae_config, dtype=dtype, impl=wrapper.impl,
            attn_impl=wrapper.attn_impl, remat=wrapper.remat,
            capture=monitor.scalar_capture_table,
        )
        batch_shape = (global_batch, resolution, resolution, vae_config.in_channels)
        stats_acc = monitor.init_acc(module_plain, params, batch_shape)

        # training.ema_decay [new]: exponential moving average of params,
        # updated in-graph each step; exported as final_model/vae_ema
        ema_decay = as_float(tc.get("ema_decay"), 0.0)
        state = TrainState.create(
            params, tx, stats_acc=stats_acc, ema=ema_decay > 0.0
        )
        if self.resume_from:
            state = restore_train_state(self.resume_from, state)
            logger.info("Resumed from %s at step %d", self.resume_from, int(state.step))
        repl = replicated_sharding(mesh)
        # parallel.shard_optimizer [new]: ZeRO-1 — shard the AdamW moments
        # over the data axis instead of replicating them (the reference
        # replicates the full torch AdamW state per GPU, src/train.py:184-211).
        # Single-process meshes only: main-process checkpointing fetches the
        # full state with device_get, which needs fully-addressable arrays.
        shard_opt = bool(parallel_config.get("shard_optimizer", False))
        # parallel.shard_ema [new]: shard the EMA parameter copy the same
        # way (elementwise blend — no extra in-step collectives; gathered
        # once at export). No-op unless training.ema_decay > 0.
        shard_ema = bool(parallel_config.get("shard_ema", False))
        # parallel.shard_params [new]: ZeRO-3 — shard the persistent param
        # buffers themselves; XLA gathers each weight at its point of use.
        shard_par = bool(parallel_config.get("shard_params", False))
        if shard_par and wrapper.impl == "fused" and mesh.size > 1:
            # the fused Pallas kernels run per-shard via shard_map with
            # replicated params (pallas_resnet.set_shard_mesh above);
            # ZeRO-3-sharded params would violate those in_specs
            logger.warning(
                "parallel.shard_params is incompatible with "
                "model.kernel_impl=fused under a mesh; keeping the params "
                "replicated."
            )
            shard_par = False
        gather_for_save = None
        replicate_leaf = None
        params_sharding = None
        params_sharded = shard_par or tensor > 1
        if shard_opt or shard_ema or params_sharded:
            from ..parallel.zero import (
                make_gather_fn,
                make_replicate_leaf_fn,
                state_shardings,
            )

            state_sharding = state_shardings(
                mesh, state, shard_optimizer=shard_opt, shard_ema=shard_ema,
                shard_params=shard_par,
            )
            if params_sharded:
                params_sharding = state_sharding.params
            if jax.process_count() > 1:
                # multi-host: sharded leaves are not fully addressable, so
                # checkpoint fetches must first re-replicate via a jitted
                # all-gather that EVERY process runs (it's a collective) —
                # each save site below calls _for_save outside any is_main
                # gate for exactly this reason
                gather_for_save = make_gather_fn(mesh, state)
                if params_sharded:
                    # ditto for the nudger's γ fetch and the dead tracker's
                    # raw-weight snapshots: both call sites run un-gated on
                    # every process, so the gather is safe there
                    replicate_leaf = make_replicate_leaf_fn(mesh)
            if shard_opt:
                logger.info(
                    "parallel.shard_optimizer: AdamW moments sharded over "
                    "the %d-way data axis (ZeRO-1).", n_shards,
                )
            if shard_ema and state.ema_params is not None:
                logger.info(
                    "parallel.shard_ema: EMA params sharded over the %d-way "
                    "data axis.", n_shards,
                )
            if shard_par:
                logger.info(
                    "parallel.shard_params: parameter buffers sharded over "
                    "the %d-way data axis (ZeRO-3).", n_shards,
                )
                if spatial > 1 and spatial_conv != "shard_map":
                    logger.info(
                        "shard_params + spatial: the train/eval steps "
                        "re-replicate the sharded params at compute time "
                        "(jax 0.9.0 GSPMD computes wrong parameter "
                        "gradients for sharded params under a halo-"
                        "exchanged mesh — see SCALING.md; at-rest 1/N "
                        "memory relief is unchanged). "
                        "parallel.spatial_conv: shard_map avoids the "
                        "re-replication entirely."
                    )
            if tensor > 1:
                logger.info(
                    "parallel.tensor: params/moments/EMA channel axes "
                    "sharded over the %d-way tensor axis.", tensor,
                )
        else:
            state_sharding = None

        def _for_save(live_state):
            """A fully-addressable view of the state for checkpointing.

            Single-process: the state itself (device_get can read sharded
            addressable arrays directly). Multi-host with ZeRO shardings:
            the all-gathered replicated snapshot — MUST be called by all
            processes (SPMD collective), so call sites sit outside is_main
            gates."""
            if gather_for_save is None:
                return live_state
            return gather_for_save(live_state)
        if state_sharding is not None and jax.process_count() > 1:
            # hostify first: device_put from host values lets each process
            # slice its shards locally; committed device arrays would be
            # resharded cross-process leaf-by-leaf (one Gloo/transfer
            # context per leaf), which times out on large pytrees
            state = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                state,
            )
        state = jax.device_put(
            state, state_sharding if state_sharding is not None else repl
        )

        step_plain = make_train_step(
            module_plain, tx, self.kl_weight, mesh=mesh,
            stats_accumulate=ActivityMonitor.accumulate, ema_decay=ema_decay,
            state_sharding=state_sharding, spatial_conv=spatial_conv,
        )
        step_maps = None
        if monitor.enabled and monitor.map_keys:
            module_maps = AutoencoderKL(
                config=vae_config, dtype=dtype, impl=wrapper.impl,
                attn_impl=wrapper.attn_impl, remat=wrapper.remat,
                capture=monitor.map_capture_table,
            )
            step_maps = make_train_step(
                module_maps, tx, self.kl_weight, mesh=mesh,
                stats_accumulate=ActivityMonitor.accumulate,
                map_keys=monitor.map_keys, ema_decay=ema_decay,
                state_sharding=state_sharding, spatial_conv=spatial_conv,
            )
        eval_step = (
            make_eval_step(
                module_plain, mesh=mesh, params_sharding=params_sharding,
                spatial_conv=spatial_conv,
            )
            if do_validation
            else None
        )

        # ---------------- intervals ---------------- #
        # clamped to >=1 (log every step), never disabled: the non-finite
        # loss failure detection rides the logging interval
        log_interval = max(1, as_int(self.logging_config.get("log_interval"), 10))
        save_interval_steps = as_int(
            self.saving_config.get("save_interval_steps"), 500
        )
        checkpoint_prefix = self.saving_config.get("checkpoint_dir_prefix", "chkpt")
        validation_epochs = as_int(tc.get("validation_epochs"), 0)
        validation_steps = as_int(tc.get("validation_steps"), 0)

        # saving.async_save (default on): periodic checkpoints snapshot the
        # state on device and write from a background thread, so the step
        # loop never stalls on the device->host fetch or the filesystem.
        ckpt_saver = (
            AsyncSaver()
            if self.saving_config.get("async_save", True) and is_main
            else None
        )

        # ---------------- preemption handling ---------------- #
        # No reference equivalent (SURVEY.md §5: no failure recovery at all).
        # Preemptible TPU VMs get SIGTERM with a short grace period; catching
        # it, checkpointing at the next step boundary, and exiting cleanly
        # makes `--resume_from auto` pick the run back up losslessly.
        preempt_flag = {"hit": False}
        # training.stop_after_steps (0 = off): deterministic early stop after
        # N global steps, exiting through the same checkpoint-and-quit path
        # as SIGTERM. For bounded-duration runs and for testing that a
        # resumed run equals an uninterrupted one.
        stop_after_steps = as_int(tc.get("stop_after_steps"), 0)

        def _on_term(signum, _frame):
            preempt_flag["hit"] = True
            logger.warning(
                "Received signal %d — will checkpoint and exit at the next "
                "step boundary.", signum,
            )

        try:
            _prev_sigterm = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread (embedded use): no handler
            _prev_sigterm = None
        preempted = False
        # True when the stop came from training.stop_after_steps (a
        # deterministic bounded run, identical on every process) rather than
        # a SIGTERM kill timer — the former keeps the full finalize
        stop_was_deterministic = False

        # ---------------- loop ---------------- #
        logger.info(
            "***** Running training: %d epochs, %d steps/epoch, "
            "global batch %d *****",
            num_train_epochs, steps_per_epoch, global_batch,
        )
        global_step = int(jax.device_get(state.step)) // max(accum, 1)
        micro_step = int(jax.device_get(state.step))
        t_start = time.time()
        images_seen = 0
        classification_output: Dict[str, Any] = {}

        from ..parallel.mesh import (
            batch_sharding,
            make_global_array,
            vector_sharding,
        )

        image_sharding = batch_sharding(mesh)
        mask_sharding = vector_sharding(mesh)

        def _pad_multiple(loader) -> int:
            """Single-host: pad to the device multiple (cheap). Multi-host:
            pad every local batch to the loader's FULL per-process batch so
            all processes always present identical shapes to
            make_array_from_process_local_data even when collate drops bad
            records unevenly across processes."""
            if process_count > 1:
                return loader.batch_size
            return max(1, n_shards)

        def _uniform_cap(loader):
            """Uniform per-process batch count for multi-host epochs (every
            process must dispatch the same SPMD program count) — the ONE
            implementation, shared by the train loader (also feeding the
            resume arithmetic below) and the validation loader."""
            if process_count == 1:
                return None
            try:
                return (len(loader.dataset) // process_count) // loader.batch_size
            except TypeError:
                return as_int(
                    self.training_config.get("max_steps_per_epoch_iterable"),
                    10000,
                )

        batches_per_epoch_cap = _uniform_cap(train_loader)

        def _prepared_batches(loader, skip=0):
            """Pad + shard-place batches ahead of consumption in a background
            thread, overlapping H2D transfer with device compute (the
            pin_memory/prefetch analog of data_utils.py:218-225).

            ``skip`` skips the first N batches — the resume fast-forward: a
            resumed run re-enters its epoch mid-stream and sees exactly the
            batches an uninterrupted run would (the per-epoch shuffle is
            seeded by epoch number, so the order is reproducible). Map-style
            datasets skip at the INDEX level (O(1) — no decode of consumed
            data, which on a long run would cost minutes of re-decoding);
            streaming datasets consume-skip linearly, the same cost as any
            restarted stream. The two differ only if a skipped batch was
            fully bad (every item undecodable — collate yields ``None``,
            which the uninterrupted run did not count as a step): index
            skipping cannot see decode failures, so such batches shift the
            resume point by one. Accepted: it matches what torch/accelerate's
            ``skip_first_batches`` does, and a dataset where whole batches
            vanish mid-training has no stable step<->data mapping anyway."""
            batch_cap = _uniform_cap(loader)
            pad_to = _pad_multiple(loader)
            index_skip = 0
            if skip and not loader.is_iterable:
                index_skip, skip = skip, 0

            def gen():
                emitted = index_skip
                for batch in loader.iter_batches(start_batch=index_skip):
                    if batch_cap is not None and emitted >= batch_cap:
                        break
                    if batch is None:
                        continue
                    pixels = batch["pixel_values"]
                    if pixels.ndim != 4 or pixels.shape[0] == 0:
                        continue
                    emitted += 1
                    if emitted <= skip:
                        continue
                    padded, mask = pad_batch_to_multiple(
                        {"pixel_values": pixels}, pad_to
                    )
                    n_valid = int(mask.sum())
                    yield (
                        {
                            "pixel_values": make_global_array(
                                padded["pixel_values"], image_sharding
                            )
                        },
                        make_global_array(mask, mask_sharding),
                        n_valid,
                    )

            return Prefetcher(gen(), depth=2)

        metric_keys = ("train_loss_step", "rec_loss", "kl_loss")

        # Resume fast-forward: place the data stream where the checkpoint
        # left off (the reference has no resume at all; restarting at epoch 0
        # would replay early-epoch data and break run-equivalence). The
        # checkpoint's resume_meta.json sidecar records the exact stream
        # position (epoch, in-epoch batch count); the arithmetic fallback
        # below covers sidecar-less checkpoints, and is exact only when
        # every epoch has a knowable constant length — for single-host
        # STREAMING datasets the epoch length is whatever the stream
        # yielded, which no derivation from micro_step can recover (the
        # sidecar exists precisely for that case). Exact for map-style
        # datasets (per-epoch seeded shuffle); streaming datasets
        # consume-skip linearly, same as any restarted stream.
        resume_meta = (
            read_resume_meta(self.resume_from) if self.resume_from else None
        )
        if (
            resume_meta is not None
            and int(resume_meta.get("micro_step", -1)) == micro_step
        ):
            start_epoch = min(int(resume_meta["epoch"]), num_train_epochs)
            resume_skip_batches = int(resume_meta["in_epoch_batches"])
        else:
            if micro_step > 0 and self.resume_from:
                logger.warning(
                    "Checkpoint has no (matching) resume_meta.json sidecar; "
                    "deriving the stream position from micro_step — exact "
                    "for map-style datasets, approximate for streaming ones."
                )
            # Micro-batches per epoch come from the loader's real length
            # when it has one — `steps_per_epoch * accum` rounds up and
            # would misplace the stream whenever accum doesn't divide the
            # epoch's batch count.
            try:
                micro_per_epoch = len(train_loader)
            except TypeError:
                micro_per_epoch = steps_per_epoch * accum
            if batches_per_epoch_cap is not None:
                micro_per_epoch = min(micro_per_epoch, batches_per_epoch_cap)
            micro_per_epoch = max(1, micro_per_epoch)
            start_epoch = min(micro_step // micro_per_epoch, num_train_epochs)
            resume_skip_batches = micro_step % micro_per_epoch
        if micro_step > 0:
            logger.info(
                "Resume fast-forward: starting at epoch %d, skipping %d "
                "already-consumed batches.", start_epoch, resume_skip_batches,
            )

        # Stream position for checkpoint sidecars. Initialized here so the
        # final checkpoint has a valid position even when the epoch loop
        # body never runs (e.g. resuming a completed run unchanged); the
        # closure reads the loop's live values at save time.
        epoch = start_epoch
        in_epoch_micro = resume_skip_batches

        def _resume_meta():
            return {
                "micro_step": micro_step,
                "global_step": global_step,
                "epoch": epoch,
                "in_epoch_batches": in_epoch_micro,
            }

        try:
            for epoch in range(start_epoch, num_train_epochs):
                # Epoch averages accumulate as host floats, drained from a small
                # on-device buffer at log intervals (the fetch there is already a
                # sync point) — long epochs must not retain thousands of device
                # scalars until epoch end.
                epoch_sums = dict.fromkeys(metric_keys, 0.0)
                epoch_count = 0
                pending_metrics: list = []

                def _drain_epoch_metrics():
                    """Fetch buffered step metrics; returns the newest host dict."""
                    nonlocal epoch_count
                    if not pending_metrics:
                        return None
                    host = jax.device_get(pending_metrics)
                    pending_metrics.clear()
                    for m in host:
                        for k in metric_keys:
                            epoch_sums[k] += float(m[k])
                    epoch_count += len(host)
                    return host[-1]

                train_loader.set_epoch(epoch)
                # in-epoch micro-batch position, persisted in every checkpoint's
                # resume_meta.json so resume re-places the stream exactly (the
                # count includes batches consumed by the fast-forward skip)
                in_epoch_micro = (
                    resume_skip_batches if epoch == start_epoch else 0
                )

                train_batches = _prepared_batches(
                    train_loader,
                    skip=resume_skip_batches if epoch == start_epoch else 0,
                )
                for padded, mask, n_valid in train_batches:
                    # n_valid counts THIS process's shard of the global
                    # batch; multi-host loaders run drop_last (every local
                    # batch full and identical across processes), so the
                    # global count is exactly n_valid x process_count
                    images_seen += n_valid * process_count

                    micro_step += 1
                    in_epoch_micro += 1
                    is_update = micro_step % accum == 0
                    next_global = global_step + 1 if is_update else global_step
                    want_maps = (
                        step_maps is not None
                        and is_update
                        and track_interval > 0
                        and next_global % track_interval == 0
                    )
                    tracer.maybe_start(next_global)
                    fn = step_maps if want_maps else step_plain
                    state, metrics, maps = fn(state, padded, mask, base_rng)
                    tracer.maybe_stop(next_global)
                    pending_metrics.append(metrics)

                    if not is_update:
                        continue
                    global_step = next_global
                    # reference parity (src/train.py:310): classification results
                    # do not persist across steps — an intervention only fires
                    # when its interval lands on a step with a fresh classification
                    classification_output = {}

                    # --- monitor aggregation (train.py:308-309 analog) ---
                    activity_metrics: Dict[str, float] = {}
                    if monitor.enabled and track_interval > 0 and (
                        global_step % track_interval == 0
                    ):
                        activity_metrics = monitor.step(
                            global_step, state.stats_acc, state.stats_count, maps
                        )
                        state = state.reset_stats()

                        # --- classification (train.py:311-314) ---
                        if classifier is not None:
                            tracked = monitor.get_data_for_step(global_step)
                            classification_output = (
                                classifier.classify(tracked, global_step)
                                if tracked else {}
                            )
                            if not classification_output:
                                logger.info(
                                    "Step %d: Classifier found no inactive channels.",
                                    global_step,
                                )

                    # --- intervention (train.py:315-328) ---
                    if (
                        handler is not None
                        and intervention_interval > 0
                        and global_step % intervention_interval == 0
                    ):
                        if classification_output:
                            new_params = handler.intervene(
                                state.params, classification_output, global_step,
                                replicate_leaf=replicate_leaf,
                            )
                            if handler.num_nudges_applied > 0:
                                state = state.replace(params=new_params)
                            inactive_total = sum(
                                len(v["inactive_channel_indices"])
                                for v in classification_output.values()
                            )
                            reporter.log(
                                {
                                    "inactive_channels": inactive_total,
                                    "nudged_scales": handler.num_nudges_applied,
                                },
                                global_step,
                            )
                            if is_main:
                                with open(
                                    os.path.join(
                                        self.output_dir, "intervention_history.csv"
                                    ),
                                    "a",
                                ) as fh:
                                    fh.write(
                                        f"{global_step},{inactive_total},"
                                        f"{handler.num_nudges_applied}\n"
                                    )
                        else:
                            logger.info(
                                "Step %d: Intervention due, but no regions classified.",
                                global_step,
                            )

                    # --- logging (train.py:331-338) ---
                    if global_step % log_interval == 0:
                        host_metrics = _drain_epoch_metrics()
                        # failure detection (absent in the reference, SURVEY §5):
                        # a non-finite loss means divergence — stop before
                        # burning the rest of the run, unless configured off.
                        # Checked on EVERY process (the loss is replicated):
                        # a main-only abort would leave the other processes
                        # blocked in their next collective until the
                        # distributed-runtime heartbeat timeout.
                        if not np.isfinite(float(host_metrics["train_loss_step"])):
                            msg = (
                                f"Non-finite loss at step {global_step}: "
                                f"{host_metrics}"
                            )
                            if bool(tc.get("abort_on_nonfinite", True)):
                                raise FloatingPointError(msg)
                            logger.error(msg)
                    if global_step % log_interval == 0 and is_main:
                        logs = {
                            "train_loss_step": float(host_metrics["train_loss_step"]),
                            "rec_loss": float(host_metrics["rec_loss"]),
                            "kl_loss": float(host_metrics["kl_loss"]),
                            "grad_norm": float(host_metrics["grad_norm"]),
                            # schedule(global_step) is one step AHEAD of the
                            # lr the update just applied (optax evaluates at
                            # the pre-increment count) — deliberate parity:
                            # the reference logs get_last_lr() AFTER
                            # sched.step() (train.py:305,334), the same
                            # off-by-one
                            "lr": float(schedule(global_step)),
                            "epoch_current": epoch,
                            **activity_metrics,
                        }
                        reporter.log(logs, global_step)
                        logger.info(
                            "step %d loss %.4e lr %.3e (%.1f img/s)",
                            global_step, logs["train_loss_step"], logs["lr"],
                            images_seen / max(time.time() - t_start, 1e-6),
                        )

                    # --- logit lens (train.py:339-353) ---
                    if logit_lens is not None and ll_interval > 0 and (
                        global_step % ll_interval == 0
                    ):
                        current = monitor.get_data_for_step(global_step)
                        if current:
                            logit_lens.run_logit_lens_with_activations(
                                global_step=global_step,
                                activations_to_process=current,
                                # empty layers_to_analyze_direct falls through to
                                # target_tracked_metrics (the reference treats []
                                # as present and silently does nothing — §5a-6)
                                layers_to_analyze=(
                                    ll_config.get("layers_to_analyze_direct")
                                    or ll_config.get("target_tracked_metrics", [])
                                ),
                                num_batch_samples_to_viz=ll_config.get(
                                    "num_batch_samples_to_viz", 1
                                ),
                                projection_type=ll_config.get(
                                    "projection_type", "mini_decoder_single_channel"
                                ),
                            )
                        else:
                            logger.warning(
                                "LogitLens: No activation data for step %d.", global_step
                            )

                    # --- dead-weight tracking (train.py:355-356) ---
                    if dead_tracker is not None and dnt_interval > 0 and (
                        global_step % dnt_interval == 0
                    ):
                        dead_tracker.track_dead_neurons(
                            state.params, global_step,
                            replicate_leaf=replicate_leaf,
                        )

                    # --- periodic checkpoint (train.py:358-362) ---
                    # the save predicate is deterministic and identical on all
                    # processes, so _for_save (a collective under multi-host
                    # ZeRO) runs on every process; only the write is main-only
                    # deviation from the reference (train.py:358 divides by the
                    # raw config value): interval 0/negative = periodic saving
                    # disabled instead of ZeroDivisionError mid-run
                    if save_interval_steps > 0 and (
                        global_step % save_interval_steps == 0
                    ):
                        save_state = _for_save(state)
                        if is_main:
                            ckpt_path = os.path.join(
                                self.output_dir,
                                f"{checkpoint_prefix}-{global_step}",
                            )
                            keep_last_n = as_int(
                                self.saving_config.get("keep_last_n"), 0
                            )

                            def _prune(
                                out=self.output_dir, pfx=checkpoint_prefix,
                                n=keep_last_n,
                            ):
                                prune_checkpoints(out, pfx, n)

                            if ckpt_saver is not None:
                                # prune inside the writer AFTER the save lands;
                                # pruning here would list the dir before the new
                                # checkpoint exists (keep_last_n would
                                # transiently hold n+1 and lag one save behind)
                                ckpt_saver.save(
                                    ckpt_path, save_state, on_complete=_prune,
                                    meta=_resume_meta(),
                                )
                            else:
                                save_train_state(
                                    ckpt_path, save_state, meta=_resume_meta()
                                )
                                _prune()

                    # --- preemption-safe exit (no reference equivalent) ---
                    # Multi-host runs must agree on stopping (the step is a
                    # collective). The SIGTERM flag is asynchronous — it may hit
                    # only some processes — so it is consulted at log-interval
                    # boundaries there and OR-reduced across processes; a single
                    # host checks every step for the fastest reaction.
                    # stop_after_steps is DETERMINISTIC (every process computes
                    # the same predicate at the same step), so it stops exactly
                    # at step N with no collective agreement needed — gating it
                    # on log_interval would overshoot to the next multiple.
                    deterministic_stop = (
                        stop_after_steps > 0 and global_step >= stop_after_steps
                    )
                    if deterministic_stop:
                        preempt_flag["hit"] = True
                    if (
                        process_count == 1
                        or deterministic_stop
                        or global_step % log_interval == 0
                    ):
                        stop_now = preempt_flag["hit"]
                        if process_count > 1 and not deterministic_stop:
                            from jax.experimental import multihost_utils

                            stop_now = bool(
                                multihost_utils.process_allgather(
                                    np.array([stop_now])
                                ).any()
                            )
                        if stop_now:
                            # all processes agreed on stop_now, so all reach
                            # the _for_save collective together
                            save_state = _for_save(state)
                            if is_main:
                                if ckpt_saver is not None:
                                    ckpt_saver.wait()
                                save_train_state(
                                    os.path.join(
                                        self.output_dir,
                                        f"{checkpoint_prefix}-{global_step}",
                                    ),
                                    save_state,
                                    meta=_resume_meta(),
                                )
                            logger.warning(
                                "Preemption checkpoint written at step %d; "
                                "exiting the training loop.", global_step,
                            )
                            preempted = True
                            stop_was_deterministic = deterministic_stop
                            break

                    # --- step-interval validation (train.py:366-369) ---
                    if (
                        do_validation
                        and val_loader is not None
                        and validation_steps > 0
                        and global_step % validation_steps == 0
                    ):
                        self._run_validation(
                            eval_step, state,
                            _prepared_batches(val_loader),
                            global_step, reporter,
                        )

                    if global_step >= max_train_steps:
                        break
                # early break (max_train_steps) leaves the prefetch worker parked
                # on a full queue; close() unblocks it and releases the loader
                train_batches.close()

                # --- epoch summary (train.py:371-381) ---
                _drain_epoch_metrics()
                if epoch_count and is_main:
                    reporter.log(
                        {
                            "train/epoch_avg_loss":
                                epoch_sums["train_loss_step"] / epoch_count,
                            "train/epoch_avg_rec_loss":
                                epoch_sums["rec_loss"] / epoch_count,
                            "train/epoch_avg_kl_loss":
                                epoch_sums["kl_loss"] / epoch_count,
                            "epoch_completed": epoch,
                        },
                        global_step,
                    )
                logger.info("Epoch %d completed.", epoch)

                # --- epoch-interval validation (train.py:382-385) ---
                # (skipped when preempted: the grace window is for the
                # checkpoint, not a validation pass)
                if (
                    not preempted
                    and do_validation
                    and val_loader is not None
                    and validation_epochs > 0
                    and (epoch + 1) % validation_epochs == 0
                    and validation_steps <= 0
                ):
                    self._run_validation(
                        eval_step, state,
                        _prepared_batches(val_loader),
                        global_step, reporter,
                    )
                if preempted:
                    break
                if global_step >= max_train_steps:
                    logger.info("Reached max_train_steps.")
                    break

        finally:
            # an abort out of the loop (e.g. the non-finite-loss
            # FloatingPointError) must not leave the SIGTERM handler
            # installed pointing at a dead flag, the profiler open, or the
            # checkpoint writer unjoined — embedded callers outlive train()
            if _prev_sigterm is not None:
                signal.signal(signal.SIGTERM, _prev_sigterm)
            if ckpt_saver is not None:
                # join the writer without raising: a writer error here would
                # mask the in-flight loop exception; the normal path
                # re-raises it via the wait() below
                ckpt_saver.wait(reraise=False)
            try:
                tracer.close()
            except Exception:  # noqa: BLE001 — teardown must not mask
                logger.exception("Profiler trace close failed")
        if ckpt_saver is not None:
            ckpt_saver.wait()
        elapsed = time.time() - t_start
        logger.info(
            "Training finished: %d steps, %d images in %.1fs (%.1f img/s)",
            global_step, images_seen, elapsed, images_seen / max(elapsed, 1e-6),
        )

        if preempted and not stop_was_deterministic:
            # Real SIGTERM preemption: the grace window is for the
            # preemption checkpoint (already written), not for the
            # multi-minute finalize (final_model rewrite + StableHLO export
            # + CSV/plots) — a SIGKILL mid-finalize would corrupt a
            # final_model that a previous completed run may have left.
            # `--resume_from auto` continues from the checkpoint and the
            # resumed run writes the final artifacts. stop_after_steps exits
            # through the same checkpoint path but is deterministic, not
            # under a kill timer, so it keeps the full finalize.
            logger.warning(
                "Preempted: skipping final-model export/plots (the "
                "preemption checkpoint at step %d is the resume artifact).",
                global_step,
            )
            return dict(
                final_model_dir=None,
                global_step=global_step,
                images_per_sec=images_seen / max(elapsed, 1e-6),
                images_seen=images_seen,
                preempted=True,
            )

        # _for_save is a collective under multi-host ZeRO — every process
        # gathers; _finalize's early return then only skips host-side writes
        summary = self._finalize(
            _for_save(state), vae_config, monitor, dead_tracker, handler,
            is_main, reporter, final_meta=_resume_meta(),
        )
        summary.update(
            global_step=global_step,
            images_per_sec=images_seen / max(elapsed, 1e-6),
            images_seen=images_seen,
            preempted=preempted,
        )
        return summary

    # ------------------------------------------------------------------ #
    def _run_validation(
        self, eval_step, state, prepared_batches, global_step, reporter
    ) -> Dict[str, float]:
        """SUM-convention validation (src/train.py:53-97). Consumes
        pre-sharded batches from the same prefetch path as training (so the
        multi-host assembly applies identically)."""
        logger.info("--- Running Validation for Global Step: %d ---", global_step)
        rec_sum = kl_sum = n = 0.0
        try:
            for padded, mask, _n_valid in prepared_batches:
                out = eval_step(state.params, padded, mask)
                host = jax.device_get(
                    {k: out[k] for k in ("rec_loss_sum", "kl_sum", "num_samples")}
                )
                rec_sum += float(host["rec_loss_sum"])
                kl_sum += float(host["kl_sum"])
                n += float(host["num_samples"])
        finally:
            close = getattr(prepared_batches, "close", None)
            if close is not None:
                close()
        avg_rec = rec_sum / n if n else 0.0
        avg_kl = kl_sum / n if n else 0.0
        avg_total = avg_rec + self.kl_weight * avg_kl
        metrics = {
            "validation/avg_total_loss": avg_total,
            "validation/avg_reconstruction_loss": avg_rec,
            "validation/avg_kl_divergence": avg_kl,
        }
        reporter.log(metrics, global_step)
        logger.info(
            "Validation: total %.4e rec %.4e kl %.4e (%d samples)",
            avg_total, avg_rec, avg_kl, int(n),
        )
        return metrics

    # ------------------------------------------------------------------ #
    def _finalize(
        self, state, vae_config, monitor, dead_tracker, handler,
        is_main, reporter, final_meta=None,
    ) -> Dict[str, Any]:
        """Final artifacts (src/train.py:392-461): final_model/ (resumable
        state) + final_model/vae/ (the dir evaluate loads), activation-stats
        CSV, dead-weight plots, activity plots, dead-vs-nudge plot.

        ``final_meta`` is the stream-position sidecar for final_model —
        without it, continuing a STREAMING run from final_model (e.g. with
        num_train_epochs raised) would fall back to the arithmetic stream
        placement, which is wrong for streaming data."""
        summary: Dict[str, Any] = {}
        if not is_main:
            return summary
        final_dir = os.path.join(self.output_dir, "final_model")
        os.makedirs(final_dir, exist_ok=True)
        save_train_state(final_dir, state, meta=final_meta)
        vae_dir = os.path.join(final_dir, "vae")
        model_io.save_model_dir(
            vae_dir, vae_config, jax.device_get(state.params)
        )
        logger.info("Final VAE saved to %s", vae_dir)
        summary["final_model_dir"] = final_dir
        if state.ema_params is not None:
            ema_dir = os.path.join(final_dir, "vae_ema")
            model_io.save_model_dir(
                ema_dir, vae_config, jax.device_get(state.ema_params)
            )
            logger.info("EMA VAE saved to %s", ema_dir)
            summary["ema_model_dir"] = ema_dir

        if self.config.get("saving", {}).get("export_stablehlo", False):
            # deployment artifacts next to the model dir: serialized
            # encode/decode/reconstruct (symbolic batch, cpu+tpu) — see
            # tools/export_model.py. EMA weights share the same program,
            # so one export serves both parameter sets.
            from ..tools.export_model import export_model_dir

            export_dir = os.path.join(final_dir, "exported")
            export_model_dir(
                vae_dir,
                export_dir,
                resolution=int(
                    self.config.get("data", {}).get("resolution", 256)
                ),
                dtype_name=(
                    "bf16"
                    if self.config.get("training", {}).get(
                        "mixed_precision", "no"
                    ) in ("bf16", "fp16")
                    else "fp32"
                ),
            )
            logger.info("StableHLO deployment artifacts in %s", export_dir)
            summary["export_dir"] = export_dir

        activity_csv = None
        if monitor.enabled:
            records = monitor.export_all_processed_data_to_records()
            if records:
                import pandas as pd

                activity_csv = os.path.join(
                    self.output_dir, "tracked_activation_stats.csv"
                )
                pd.DataFrame(records).to_csv(activity_csv, index=False)
                logger.info("Saved activation stats to %s", activity_csv)
                summary["activity_csv"] = activity_csv
                # reference artifact contract (src/train.py:427-432):
                # sanitized "{run_name}_activations", type 'dataset'
                art_name = "".join(
                    c if c.isalnum() or c in ("-", "_", ".") else "_"
                    for c in f"{self.run_name}_activations"
                )
                reporter.log_artifact(
                    activity_csv, art_name, artifact_type="dataset"
                )

        if dead_tracker is not None:
            DeadNeuronPlotter(
                threshold=self.threshold_dn, output_dir=self.output_dir
            ).plot_all(
                percent_history=dead_tracker.percent_history,
                weights_history=dead_tracker.weights_history,
            )

        if activity_csv and os.path.exists(activity_csv):
            ActivityPlotter(
                output_dir=os.path.join(self.output_dir, "activity_plots")
            ).plot_activation_stats_evolution(
                csv_path=activity_csv,
                target_metric_substring="mean_abs_activation_per_channel",
                target_metric_type="per_channel_overall_mean",
            )

        if handler is not None and handler.num_nudges_applied > 0:
            plot_dead_vs_nudge(
                csv_path=os.path.join(self.output_dir, "intervention_history.csv"),
                out_png=os.path.join(self.output_dir, "dead_vs_nudge.png"),
                nudge_factor=handler.nudge_factor,
            )
        reporter.finish()
        return summary
