"""Training-stability toolkit: JAX analogs of the icefall "scaling" modules.

The reference vendors icefall's scaling toolkit (modules/scaling.py, 1401
LoC) for its training-era modules. These are the functional JAX equivalents
of the pieces the VALL-E/Transformer stacks can be configured with
(modules/transformer.py imports BalancedDoubleSwish and BasicNorm):

- double_swish:        x·σ(x−1)  (reference: modules/scaling.py:1156-1222,
                       implemented there as a memory-saving autograd Function;
                       XLA fuses the plain expression, so no custom VJP is
                       needed for memory here)
- BasicNorm:           x·(mean(x²)+exp(eps_log))^−½ with a learnable log-eps
                       (reference: modules/scaling.py:360-424)
- BalancedBasicNorm / IdentityNorm (reference: modules/transformer.py:133-175)
- ScaledLinear:        Linear with learnable log-scale on weight/bias
                       (reference: modules/scaling.py:427-449)
- activation_balancer: identity in the forward pass; the backward pass nudges
                       gradients so channel activations keep a positive
                       fraction and magnitude inside configured bounds
                       (reference: modules/scaling.py:639-761)

All are pure functions over param pytrees, consistent with models/layers.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def double_swish(x: jnp.ndarray) -> jnp.ndarray:
    """DoubleSwish(x) = x · sigmoid(x − 1)."""
    return x * jax.nn.sigmoid(x - 1.0)


# ---------------------------------------------------------------------------
# BasicNorm family
# ---------------------------------------------------------------------------

def init_basic_norm(eps: float = 0.25) -> Params:
    return {"eps_log": jnp.asarray(math.log(eps), jnp.float32)}


def basic_norm_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    scale = jax.lax.rsqrt(
        jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        + jnp.exp(p["eps_log"])
    )
    return (x.astype(jnp.float32) * scale).astype(x.dtype)


def init_identity_norm() -> Params:
    return {}


def identity_norm_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x


def init_balanced_basic_norm(eps: float = 0.25) -> Params:
    # balancer is stateless (gradient-only); the norm carries the params
    return init_basic_norm(eps)


def balanced_basic_norm_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = activation_balancer(x)
    return basic_norm_apply(p, x)


# ---------------------------------------------------------------------------
# ScaledLinear
# ---------------------------------------------------------------------------

def init_scaled_linear(
    key, d_in: int, d_out: int, initial_scale: float = 1.0
) -> Params:
    from . import layers as L

    p = L.init_linear(key, d_in, d_out)
    return {
        "w": p["w"],
        "b": p["b"],
        "w_scale_log": jnp.asarray(math.log(initial_scale), jnp.float32),
        "b_scale_log": jnp.asarray(math.log(initial_scale), jnp.float32),
    }


def scaled_linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = p["w"] * jnp.exp(p["w_scale_log"])
    b = p["b"] * jnp.exp(p["b_scale_log"])
    return jnp.dot(x, w.astype(x.dtype)) + b.astype(x.dtype)


def scaled_linear_effective_weight(p: Params) -> jnp.ndarray:
    return p["w"] * jnp.exp(p["w_scale_log"])


# ---------------------------------------------------------------------------
# ActivationBalancer (gradient shaping, identity forward)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def activation_balancer(
    x: jnp.ndarray,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    max_factor: float = 0.01,
    min_abs: float = 0.2,
    max_abs: float = 100.0,
):
    return x


def _balancer_fwd(x, min_positive, max_positive, max_factor, min_abs, max_abs):
    return x, (x, min_positive, max_positive, max_factor, min_abs, max_abs)


def _balancer_bwd(res, g):
    x, min_positive, max_positive, max_factor, min_abs, max_abs = res
    xf = x.astype(jnp.float32)
    reduce_dims = tuple(i for i in range(x.ndim - 1))
    # sign constraint: fraction of positive activations per channel
    frac_pos = jnp.mean((xf > 0).astype(jnp.float32), axis=reduce_dims,
                        keepdims=True)
    factor_sign = jnp.where(
        frac_pos < min_positive, -max_factor,
        jnp.where(frac_pos > max_positive, max_factor, 0.0),
    )
    # magnitude constraint: mean |x| per channel
    mean_abs = jnp.mean(jnp.abs(xf), axis=reduce_dims, keepdims=True)
    below = (mean_abs < min_abs).astype(jnp.float32)
    above = (mean_abs > max_abs).astype(jnp.float32)
    factor_mag = (above - below) * max_factor

    gf = g.astype(jnp.float32)
    # push grads in the direction that fixes the violation (the icefall
    # balancer adds |grad|-scaled nudges; reference: scaling.py:712-760)
    nudge = jnp.abs(gf) * (factor_sign * jnp.sign(xf) + factor_mag * jnp.sign(xf))
    return ((gf + nudge).astype(g.dtype), None, None, None, None, None)


activation_balancer.defvjp(_balancer_fwd, _balancer_bwd)


def balanced_double_swish(x: jnp.ndarray) -> jnp.ndarray:
    """ActivationBalancer + DoubleSwish
    (reference: modules/scaling.py:1225-1237)."""
    return double_swish(activation_balancer(x))


# ---------------------------------------------------------------------------
# Whiten / MaxEig (gradient-only regularizers; reference: scaling.py:882+,
# 1002+). Identity forward; backward adds a penalty gradient that pushes the
# activation covariance toward whiteness / shrinks a dominant eigendirection.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def whiten(x: jnp.ndarray, whitening_limit: float = 5.0, grad_scale: float = 0.01):
    return x


def _whiten_fwd(x, whitening_limit, grad_scale):
    return x, (x, whitening_limit, grad_scale)


def _whiten_bwd(res, g):
    x, limit, scale = res
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    cov = xf.T @ xf / max(xf.shape[0], 1)
    diag_mean = jnp.mean(jnp.diag(cov))
    # whiteness metric: sum(cov²)/mean(diag)² == dim when cov is white;
    # above `limit × dim` the penalty gradient activates
    metric = jnp.sum(cov**2) / jnp.maximum(diag_mean**2, 1e-20)
    penalty_grad = (xf @ cov).reshape(x.shape) * (
        4.0 * scale / jnp.maximum(jnp.sum(cov**2), 1e-20)
    )
    active = (metric > limit * x.shape[-1]).astype(jnp.float32)
    return ((g.astype(jnp.float32) + active * penalty_grad).astype(g.dtype),
            None, None)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


@jax.custom_vjp
def max_eig(x: jnp.ndarray, max_var_per_eig: float = 0.2, grad_scale: float = 0.01):
    return x


def _max_eig_fwd(x, max_var_per_eig, grad_scale):
    return x, (x, max_var_per_eig, grad_scale)


def _max_eig_bwd(res, g):
    x, max_var, scale = res
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    xf = xf - jnp.mean(xf, 0, keepdims=True)
    # one power-iteration step for the dominant direction
    v = jnp.sum(xf, 0)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)
    proj = xf @ v  # [N]
    var_frac = jnp.sum(proj**2) / jnp.maximum(jnp.sum(xf**2), 1e-20)
    active = (var_frac > max_var).astype(jnp.float32)
    penalty_grad = (proj[:, None] * v[None, :]).reshape(x.shape) * (
        2.0 * scale / jnp.maximum(jnp.sum(proj**2), 1e-20)
    )
    return ((g.astype(jnp.float32) + active * penalty_grad).astype(g.dtype),
            None, None)


max_eig.defvjp(_max_eig_fwd, _max_eig_bwd)
