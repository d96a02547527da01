"""Torch-oracle TRAINING-TRAJECTORY parity (VERDICT round-2 item 1).

Forward parity (test_full_model_torch_parity.py) proves one loss value
matches; this proves the *optimizer trajectory* matches: N steps of
AdamW + LambdaLR(linear warmup->decay) + global-norm grad clipping on the
loss ``mse + kl_weight*kl`` — exactly the reference's training recipe
(src/train.py:184-202 optimizer/scheduler, :289-306 loss/clip/step order)
— run in the torch replica (float64 oracle) and through the REAL jitted
``make_train_step`` at fp32, asserting per-step loss, grad-norm, learning
rate, and end-of-run parameter-delta agreement.

Any of the classic optax-vs-torch deviations fails here while every
forward-parity test stays green: weight-decay coupling (L2-in-gradient vs
decoupled), eps placement (inside vs outside the bias-corrected sqrt),
clip-before vs clip-after, schedule off-by-one (LambdaLR applies
lambda(0) to the FIRST step). A negative-control test proves the
assertions have the power to catch exactly that class of bug.

Posterior sampling is made bit-identical across frameworks by recovering
the per-step gaussian noise eps = (z - mean)/std from the JAX forward
(same params, same folded rng as the jitted step) and re-parameterizing
torch's latents as z = mean + std*eps — the gradient path through
mean/std is preserved on both sides.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_full_model_torch_parity import (
    SDXL_SHAPED,
    TAutoencoderKL,
    _flax_to_torch_state_dict,
)
from vae_channel_dynamics_tpu.models import SDXLVAEWrapper
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)
from vae_channel_dynamics_tpu.utils.naming import (
    iter_torch_named_params,
    to_torch_layout,
)

N_STEPS = 10
LR = 2e-3
WARMUP = 3
MAX_STEPS = 12  # schedule horizon > N_STEPS so decay is mid-flight
WD = 0.1  # large enough that a coupling bug moves the trajectory
EPS = 1e-8
KL_WEIGHT = 1e-6
CLIP = None  # resolved from the step-0 grad norm so clipping DOES trigger
BATCH, RES = 2, 32


def _batches(n_steps, seed=5):
    rng = np.random.default_rng(seed)
    return [
        rng.uniform(-1, 1, (BATCH, RES, RES, 3)).astype(np.float32)
        for _ in range(n_steps)
    ]


def _probe_grad_norm(tmodel, x):
    """One throwaway torch backward to size max_grad_norm below the typical
    gradient norm, guaranteeing the clip path is exercised."""
    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    moments = tmodel.encode_moments(xt)
    mean, logvar = torch.chunk(moments, 2, dim=1)
    logvar = torch.clamp(logvar, -30.0, 20.0)
    recon = tmodel.decode(mean)
    loss = F.mse_loss(recon, xt)
    tmodel.zero_grad()
    loss.backward()
    norm = torch.sqrt(
        sum(p.grad.pow(2).sum() for p in tmodel.parameters())
    ).item()
    tmodel.zero_grad(set_to_none=True)
    return norm


def _torch_trajectory(tmodel, batches, noises, max_grad_norm,
                      decoupled_wd=True):
    """The reference recipe verbatim: AdamW (or Adam+L2 for the negative
    control), LambdaLR stepped AFTER optimizer.step (src/train.py:301-306),
    clip_grad_norm_ before the step."""
    opt_cls = torch.optim.AdamW if decoupled_wd else torch.optim.Adam
    optimizer = opt_cls(
        tmodel.parameters(), lr=LR, betas=(0.9, 0.999),
        weight_decay=WD, eps=EPS,
    )

    def lr_lambda_fn(current_step):
        if current_step < WARMUP:
            return float(current_step) / float(max(1, WARMUP))
        progress = float(current_step - WARMUP) / float(
            max(1, MAX_STEPS - WARMUP)
        )
        return max(0.0, 1.0 - min(1.0, progress))

    scheduler = torch.optim.lr_scheduler.LambdaLR(optimizer, lr_lambda_fn)
    losses, grad_norms, lrs = [], [], []
    max_abs_grad = {n: 0.0 for n, _ in tmodel.named_parameters()}
    for x, eps in zip(batches, noises):
        xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
        moments = tmodel.encode_moments(xt)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        std = torch.exp(0.5 * logvar)
        z = mean + std * torch.tensor(
            eps.transpose(0, 3, 1, 2), dtype=torch.float64
        )
        recon = tmodel.decode(z)
        rec_loss = F.mse_loss(recon, xt, reduction="mean")
        kl = 0.5 * torch.sum(
            mean.pow(2) + logvar.exp() - 1.0 - logvar, dim=[1, 2, 3]
        ).mean()
        loss = rec_loss + KL_WEIGHT * kl
        optimizer.zero_grad(set_to_none=True)
        loss.backward()
        for n, p in tmodel.named_parameters():
            max_abs_grad[n] = max(
                max_abs_grad[n], float(p.grad.abs().max())
            )
        lrs.append(optimizer.param_groups[0]["lr"])
        total_norm = torch.nn.utils.clip_grad_norm_(
            tmodel.parameters(), max_grad_norm
        )
        grad_norms.append(float(total_norm))
        optimizer.step()
        scheduler.step()
        losses.append(float(loss.detach()))
    return losses, grad_norms, lrs, max_abs_grad


def _jax_trajectory(wrapper, batches, max_grad_norm):
    """The production jitted step, exactly as the Trainer builds it."""
    module = wrapper._module()
    tx, sched = build_optimizer(
        LR, warmup_steps=WARMUP, max_train_steps=MAX_STEPS,
        adam_weight_decay=WD, adam_epsilon=EPS,
        max_grad_norm=max_grad_norm,
    )
    state = TrainState.create(wrapper.params, tx)
    step = make_train_step(module, tx, KL_WEIGHT, donate=False)
    base_rng = jax.random.PRNGKey(123)
    mask = np.ones(BATCH, np.float32)

    losses, grad_norms, lrs, noises = [], [], [], []
    for t, x in enumerate(batches):
        # recover the exact noise this step will draw (same params, same
        # folded rng as inside step_fn) so torch can replay it
        rng_step = jax.random.fold_in(base_rng, t)
        out, _ = module.apply(
            {"params": state.params},
            jnp.asarray(x),
            sample_posterior=True,
            rng=rng_step,
            mutable=["stats"],
        )
        mean = np.asarray(out["latent_dist"].mean, np.float64)
        std = np.asarray(out["latent_dist"].std, np.float64)
        z = np.asarray(out["latents_sampled"], np.float64)
        noises.append(((z - mean) / std).astype(np.float32))

        lrs.append(float(sched(t)))
        state, metrics, _ = step(
            state, {"pixel_values": x}, mask, base_rng
        )
        losses.append(float(metrics["train_loss_step"]))
        grad_norms.append(float(metrics["grad_norm"]))
    return losses, grad_norms, lrs, noises, state


def _param_deltas(initial_sd, final_named):
    return {
        name: np.asarray(leaf, np.float64) - initial_sd[name]
        for name, leaf in final_named.items()
    }


@pytest.fixture(scope="module")
def trajectories():
    wrapper = SDXLVAEWrapper(config=SDXL_SHAPED, dtype=jnp.float32, seed=0)
    tmodel = TAutoencoderKL(SDXL_SHAPED).double()
    sd = {
        k: v.double()
        for k, v in _flax_to_torch_state_dict(wrapper.params).items()
    }
    tmodel.load_state_dict(sd, strict=True)
    initial = {k: v.numpy().copy() for k, v in sd.items()}

    batches = _batches(N_STEPS)
    # clip below the typical grad norm so the clip path actually executes
    max_grad_norm = 0.5 * _probe_grad_norm(tmodel, batches[0])

    j_losses, j_norms, j_lrs, noises, j_state = _jax_trajectory(
        wrapper, batches, max_grad_norm
    )
    t_losses, t_norms, t_lrs, max_abs_grad = _torch_trajectory(
        tmodel, batches, noises, max_grad_norm
    )
    j_final = {
        name: to_torch_layout(name, leaf)
        for name, leaf in iter_torch_named_params(j_state.params)
    }
    t_final = {
        k: v.detach().numpy() for k, v in tmodel.state_dict().items()
    }
    return {
        "initial": initial,
        "max_grad_norm": max_grad_norm,
        "jax": (j_losses, j_norms, j_lrs, j_final),
        "torch": (t_losses, t_norms, t_lrs, t_final),
        "max_abs_grad": max_abs_grad,
        "wrapper_cfg": SDXL_SHAPED,
        "batches": batches,
        "noises": noises,
    }


def test_per_step_losses_match(trajectories):
    j_losses = trajectories["jax"][0]
    t_losses = trajectories["torch"][0]
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4)
    # the trajectory is actually moving (not comparing constants)
    assert max(t_losses) - min(t_losses) > 1e-4


def test_per_step_grad_norms_and_clip_trigger(trajectories):
    j_norms = trajectories["jax"][1]
    t_norms = trajectories["torch"][1]
    np.testing.assert_allclose(j_norms, t_norms, rtol=5e-4)
    # discriminating power: clipping really fired on some steps
    assert any(n > trajectories["max_grad_norm"] for n in t_norms)


def test_learning_rate_schedule_matches_lambda_lr(trajectories):
    """Including the off-by-one: LambdaLR applies lambda(0)=0 to the first
    optimizer.step during warmup."""
    j_lrs = trajectories["jax"][2]
    t_lrs = trajectories["torch"][2]
    np.testing.assert_allclose(j_lrs, t_lrs, rtol=1e-6)
    assert j_lrs[0] == 0.0  # warmup starts at zero
    assert max(j_lrs) == pytest.approx(LR)  # peak at end of warmup


def test_parameter_deltas_match(trajectories):
    """After N optimizer steps every parameter moved the same way: the
    AdamW moments, decoupled weight decay, clip scaling, and schedule all
    composed identically."""
    initial = trajectories["initial"]
    j_deltas = _param_deltas(initial, trajectories["jax"][3])
    t_deltas = _param_deltas(initial, trajectories["torch"][3])
    assert j_deltas.keys() == t_deltas.keys()
    moved, zero_grad_skipped = 0, []
    for name in j_deltas:
        if trajectories["max_abs_grad"][name] < 1e-9:
            # mathematically-zero gradient (attention to_k.bias: softmax is
            # invariant to the per-row constant shift q·b, so d(loss)/db ≡ 0
            # — its float64 grad here is pure roundoff). Adam then amplifies
            # that roundoff by 1/eps into lr-scale noise steps no two
            # frameworks can match; excluded by measured grad, not by name.
            zero_grad_skipped.append(name)
            continue
        jd, td = j_deltas[name], t_deltas[name]
        scale = np.abs(td).max()
        if scale < 1e-12:
            continue
        moved += 1
        err = np.abs(jd - td).max()
        assert err < 2e-3 * scale + 1e-9, (
            f"{name}: max|Δjax-Δtorch|={err:.3e} vs scale {scale:.3e}"
        )
    assert moved > 50  # essentially every tensor trained
    # the exclusion can't hide real bugs: only the two to_k biases qualify
    assert len(zero_grad_skipped) <= 2, zero_grad_skipped
    assert all("to_k.bias" in n for n in zero_grad_skipped)


def test_negative_control_coupled_weight_decay_diverges(trajectories):
    """Sensitivity proof: running torch with COUPLED weight decay
    (Adam + L2, the classic optax-vs-torch footgun) must violate the same
    parameter-delta tolerance the real comparison passes."""
    wrapper_cfg = trajectories["wrapper_cfg"]
    initial = trajectories["initial"]
    tmodel = TAutoencoderKL(wrapper_cfg).double()
    tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in initial.items()}, strict=True
    )
    _torch_trajectory(
        tmodel,
        trajectories["batches"],
        trajectories["noises"],
        trajectories["max_grad_norm"],
        decoupled_wd=False,
    )
    bad_deltas = _param_deltas(
        initial, {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )
    j_deltas = _param_deltas(initial, trajectories["jax"][3])
    violations = 0
    for name in j_deltas:
        if trajectories["max_abs_grad"][name] < 1e-9:
            continue  # same zero-gradient exclusion as the real comparison
        jd, td = j_deltas[name], bad_deltas[name]
        scale = np.abs(td).max()
        if scale < 1e-12:
            continue
        if np.abs(jd - td).max() >= 2e-3 * scale + 1e-9:
            violations += 1
    assert violations > 10, (
        f"coupled-decay control only violated {violations} tensors — "
        "the parity tolerance has no discriminating power"
    )
