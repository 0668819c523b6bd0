"""ScaledAdam optimizer + Eden/Noam schedules as optax transformations.

JAX analogs of the reference's training machinery (modules/optim.py,
modules/scheduler.py — vestigial there, functional here):

- scaled_adam: Adam whose parameter update is proportional to the
  parameter's RMS norm (per tensor), with RMS-clipped gradients — the core
  behavior of icefall's ScaledAdam (modules/optim.py:129-662); learning the
  per-tensor scale is folded into the rms term instead of a separate scalar
  parameter (the torch version batches same-shape params for speed, which a
  jit over a pytree already gives for free on TPU).
- eden_schedule / noam_schedule: LR curves (modules/optim.py:759-807,
  modules/scheduler.py:24-55).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def eden_schedule(
    base_lr: float = 0.05,
    lr_batches: float = 5000.0,
    lr_epochs: float = 4.0,
    steps_per_epoch: float = 10000.0,
    warmup: float = 500.0,
):
    """Eden: lr = base · ((t²+B²)/B²)^-¼ · ((e²+E²)/E²)^-¼ · warmup."""

    def fn(step):
        t = step.astype(jnp.float32)
        e = t / steps_per_epoch
        decay_b = ((t**2 + lr_batches**2) / lr_batches**2) ** -0.25
        decay_e = ((e**2 + lr_epochs**2) / lr_epochs**2) ** -0.25
        ramp = jnp.minimum(1.0, 0.5 + 0.5 * t / warmup)
        return base_lr * decay_b * decay_e * ramp

    return fn


def noam_schedule(base_lr: float, d_model: int = 1024, warmup: float = 4000.0):
    """NoamScheduler curve (reference: modules/scheduler.py:24-27)."""

    def fn(step):
        t = jnp.maximum(step.astype(jnp.float32), 1.0)
        return (
            base_lr
            * d_model**-0.5
            * jnp.minimum(t**-0.5, t * warmup**-1.5)
        )

    return fn


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scaled_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    clipping_scale: float = 2.0,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
) -> optax.GradientTransformation:
    """Adam with parameter-RMS-proportional step size + RMS grad clipping."""

    def init(params):
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        assert params is not None, "scaled_adam requires params"
        count = state.count + 1
        lr = (
            learning_rate(count)
            if callable(learning_rate)
            else jnp.asarray(learning_rate)
        )

        # global RMS clipping (reference clips grad·scale batches)
        gnorm = optax.global_norm(grads)
        clip = jnp.minimum(1.0, clipping_scale / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * clip, grads)

        mu = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads
        )
        mu_hat = jax.tree.map(lambda m: m / (1 - b1**count), mu)
        nu_hat = jax.tree.map(lambda v: v / (1 - b2**count), nu)

        def step(p, m, v):
            rms = jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2))
            scale = jnp.clip(rms, param_min_rms, param_max_rms)
            return (-lr * scale * m / (jnp.sqrt(v) + eps)).astype(p.dtype)

        updates = jax.tree.map(step, params, mu_hat, nu_hat)
        return updates, ScaledAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def eve(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    weight_decay: float = 1e-3,
    target_rms: float = 0.1,
) -> optax.GradientTransformation:
    """Eve: AdamW whose weight decay only applies to tensors above a target
    RMS (reference: modules/optim.py:836+)."""
    base = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init(params):
        return base.init(params)

    def update(grads, state, params):
        updates, state = base.update(grads, state, params)

        def apply(u, p):
            if p.ndim <= 1:
                return u  # no decay on biases/scales
            rms = jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2))
            decay = weight_decay * jnp.clip(rms / target_rms, 0.0, 2.0)
            # + : the whole update is scaled by -lr below, so adding the
            # decay term here yields p -= lr*decay*p (true decay); the
            # opposite sign would GROW weights every step
            return u + decay * p

        updates = jax.tree.map(apply, updates, params)
        # state is base's ScaleByAdamState (not a chain tuple)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        return jax.tree.map(lambda u: -lr * u, updates), state

    return optax.GradientTransformation(init, update)

def grad_diagnostics(grads) -> dict:
    """Gradient-norm distribution diagnostics.

    JAX analog of ScaledAdam's training-health reports: the grad-norm
    quartile log it prints when clipping engages (modules/optim.py:370-390)
    and the "dominant parameter" report naming the tensor with the largest
    share of the squared update (modules/optim.py:412-420+).

    jit-safe — returns device scalars/arrays plus the static leaf-name
    list; render on host with `format_grad_diagnostics`.
    """
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    names = [jax.tree_util.keystr(path) for path, _ in flat]
    norms = jnp.stack(
        [
            jnp.linalg.norm(v.astype(jnp.float32).ravel())
            for _, v in flat
        ]
    )
    total = jnp.sqrt(jnp.sum(norms**2))
    quart = jnp.quantile(
        norms, jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    )
    dom = jnp.argmax(norms)
    return {
        "names": names,
        "norms": norms,
        "total_norm": total,
        "quartiles": quart,
        "dominant_idx": dom,
        "dominant_frac": (norms[dom] / jnp.maximum(total, 1e-12)) ** 2,
    }


def format_grad_diagnostics(diag: dict) -> str:
    """Host-side renderer for grad_diagnostics output."""
    import numpy as np

    q = np.asarray(diag["quartiles"])
    i = int(diag["dominant_idx"])
    return (
        f"grad-norm quartiles [min/25/50/75/max] = "
        f"{q[0]:.3e}/{q[1]:.3e}/{q[2]:.3e}/{q[3]:.3e}/{q[4]:.3e}, "
        f"total={float(diag['total_norm']):.3e}; dominant param "
        f"{diag['names'][i]} ({100 * float(diag['dominant_frac']):.1f}% "
        f"of squared grad norm)"
    )
