"""Sharded training step: optax optimizer + pjit over a ("dp","tp") mesh.

Provides the trainable path the reference lacks (its optimizer/scheduler
modules are vestigial — SURVEY.md §2.1 rows 11-12). The optimizer is AdamW
under an Eden-style schedule (the lr shape used by the reference's inert
modules/scheduler.py + modules/optim.py Eden: warmup × step-decay ×
epoch-decay collapsed to the step term), and the whole update is one jit
whose inputs carry NamedShardings: batch over "dp", params TP-sharded per
parallel/mesh.py, optimizer state following the params.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from .loss import total_loss

Params = Dict[str, Any]


def eden_schedule(
    base_lr: float = 0.05, lr_batches: float = 5000.0, warmup: float = 500.0
):
    """Eden LR curve (reference: modules/optim.py:759-807, step term):
    lr = base · ((step² + B²)/B²)^-0.25 · warmup_ramp."""

    def fn(step):
        step = step.astype(jnp.float32)
        decay = ((step**2 + lr_batches**2) / lr_batches**2) ** -0.25
        ramp = jnp.minimum(1.0, 0.5 + 0.5 * step / warmup)
        return base_lr * decay * ramp

    return fn


def make_optimizer(
    base_lr: float = 0.05,
    weight_decay: float = 1e-4,
    clip_norm: float = 1.0,
    warmup: float = 500.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            learning_rate=eden_schedule(base_lr, warmup=warmup),
            b1=0.9,
            b2=0.95,
            weight_decay=weight_decay,
        ),
    )


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params: Params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "optimizer", "dtype", "prefix_mode", "use_flash", "remat",
        "packed",
    ),
)
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    dtype: str = "bfloat16",
    prefix_mode: int = 1,
    use_flash: bool = False,
    remat: bool = True,
    packed: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. Shardings flow in from the arguments (GSPMD).
    packed=True consumes a collate_packed batch through
    total_loss_packed (sequence packing; flash kernels required)."""

    def loss_fn(params):
        if packed:
            from .loss import total_loss_packed

            return total_loss_packed(
                params, cfg, batch, rng, jnp.dtype(dtype), prefix_mode,
                remat,
            )
        return total_loss(
            params, cfg, batch, rng, jnp.dtype(dtype), prefix_mode,
            use_flash, remat,
        )

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics
