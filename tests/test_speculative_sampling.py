"""Distribution-exactness of speculative sampling's accept/resample math
(ops/sampling.py::speculative_accept).

The Leviathan guarantee: accepting draft token x ~ q with probability
min(1, p(x)/q(x)) and resampling rejections from normalize(max(p-q, 0))
emits tokens distributed EXACTLY as p — for any proposal q. Checked by
Monte-Carlo: the marginal of the first emitted token must match p_0 even
when q_0 is badly mismatched.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vallex_tpu.ops.sampling import speculative_accept

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier


V = 8
K = 4
N_TRIALS = 40000


def _marginal(p_logits, q_logits, temp=1.0):
    t = jnp.asarray(temp, jnp.float32)

    def one(key):
        kd, ka = jax.random.split(key)
        draft = jax.random.categorical(
            kd, q_logits / jnp.maximum(t, 1e-6), axis=-1
        )  # [K-1]
        emit, logp, m = speculative_accept(
            ka, draft, q_logits, p_logits, t
        )
        return emit[0], m

    keys = jax.random.split(jax.random.PRNGKey(0), N_TRIALS)
    emits, ms = jax.jit(jax.vmap(one))(keys)
    counts = np.bincount(np.asarray(emits), minlength=V)
    return counts / N_TRIALS, float(np.mean(np.asarray(ms)))


def test_emitted_marginal_matches_target():
    rng = np.random.RandomState(0)
    p_logits = jnp.asarray(rng.randn(K, V) * 1.5, jnp.float32)
    # mismatched proposal: different random logits
    q_logits = jnp.asarray(rng.randn(K - 1, V) * 1.5, jnp.float32)
    emp, _ = _marginal(p_logits, q_logits)
    target = np.asarray(jax.nn.softmax(p_logits[0]))
    np.testing.assert_allclose(emp, target, atol=0.015)


def test_perfect_proposal_accepts_everything():
    rng = np.random.RandomState(1)
    p_logits = jnp.asarray(rng.randn(K, V), jnp.float32)
    q_logits = p_logits[: K - 1]  # q == p → always accept
    emp, mean_m = _marginal(p_logits, q_logits)
    target = np.asarray(jax.nn.softmax(p_logits[0]))
    np.testing.assert_allclose(emp, target, atol=0.015)
    assert mean_m > K - 1 - 0.01, mean_m  # ~all drafts accepted


def test_temperature_respected():
    rng = np.random.RandomState(2)
    p_logits = jnp.asarray(rng.randn(K, V) * 2.0, jnp.float32)
    q_logits = jnp.asarray(rng.randn(K - 1, V), jnp.float32)
    emp, _ = _marginal(p_logits, q_logits, temp=0.5)
    target = np.asarray(jax.nn.softmax(p_logits[0] / 0.5))
    np.testing.assert_allclose(emp, target, atol=0.015)
