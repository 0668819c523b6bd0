"""Bisection keep-masks vs the sort-based reference filters.

The fused decode kernels can't sort, so filtered sampling inside them uses
exact 32-step integer bisection over IEEE-754 sortable keys
(ops/sampling.py::{topk,topp,filtered}_keep_mask). These tests pin the
bisection kept-sets to the sort-based filters (top_k_filter/top_p_filter,
themselves pinned to /root/reference/models/vallex.py:791-853 semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vallex_tpu.ops import sampling as S


def _rand_logits(rng, b, v, scale=4.0):
    return jnp.asarray(rng.standard_normal((b, v)).astype(np.float32) * scale)


@pytest.mark.parametrize("k", [1, 2, 7, 50, 1024, 1025])
def test_topk_mask_matches_sort_filter(k):
    rng = np.random.default_rng(k)
    logits = _rand_logits(rng, 5, 1025)
    kept_sort = S.top_k_filter(logits, jnp.int32(k)) > S.NEG_INF / 2
    kept_mask = S.topk_keep_mask(logits, jnp.int32(k))
    np.testing.assert_array_equal(np.asarray(kept_mask), np.asarray(kept_sort))


def test_topk_disabled():
    rng = np.random.default_rng(0)
    logits = _rand_logits(rng, 3, 257)
    assert bool(jnp.all(S.topk_keep_mask(logits, jnp.int32(-100))))
    assert bool(jnp.all(S.topk_keep_mask(logits, jnp.int32(0))))


def test_topk_mask_with_ties():
    # ties at the threshold: both implementations keep ALL tied tokens
    logits = jnp.asarray(
        [[3.0, 2.0, 2.0, 2.0, 1.0, 0.0, -1.0, -2.0]], jnp.float32
    )
    for k in (2, 3, 4):
        kept_sort = S.top_k_filter(logits, jnp.int32(k)) > S.NEG_INF / 2
        kept_mask = S.topk_keep_mask(logits, jnp.int32(k))
        np.testing.assert_array_equal(
            np.asarray(kept_mask), np.asarray(kept_sort)
        )


@pytest.mark.parametrize("p", [0.05, 0.3, 0.5, 0.9, 0.99])
def test_topp_mask_matches_sort_filter(p):
    rng = np.random.default_rng(int(p * 100))
    logits = _rand_logits(rng, 5, 1025)
    kept_sort = S.top_p_filter(logits, jnp.float32(p)) > S.NEG_INF / 2
    kept_mask = S.topp_keep_mask(logits, jnp.float32(p))
    np.testing.assert_array_equal(np.asarray(kept_mask), np.asarray(kept_sort))


def test_topp_disabled():
    rng = np.random.default_rng(1)
    logits = _rand_logits(rng, 3, 257)
    assert bool(jnp.all(S.topp_keep_mask(logits, jnp.float32(1.0))))


@pytest.mark.parametrize(
    "k,p", [(50, 0.9), (100, 0.5), (2, 0.99), (1024, 0.3), (-100, 0.9)]
)
def test_combined_mask_matches_filter_chain(k, p):
    rng = np.random.default_rng(abs(k) + int(p * 10))
    logits = _rand_logits(rng, 4, 1025)
    chained = S.top_p_filter(
        S.top_k_filter(logits, jnp.int32(k)), jnp.float32(p)
    )
    kept_sort = chained > S.NEG_INF / 2
    kept_mask = S.filtered_keep_mask(logits, jnp.int32(k), jnp.float32(p))
    np.testing.assert_array_equal(np.asarray(kept_mask), np.asarray(kept_sort))


def test_masked_sampling_distribution_equivalence():
    """Sampling from where(keep, logits, NEG_INF) must equal sampling from
    the sort-filtered logits: identical kept sets + identical kept logits
    -> identical categorical draws under the same key."""
    rng = np.random.default_rng(7)
    logits = _rand_logits(rng, 2, 1025)
    k, p = jnp.int32(50), jnp.float32(0.9)
    ref = S.top_p_filter(S.top_k_filter(logits, k), p)
    keep = S.filtered_keep_mask(logits, k, p)
    via_mask = jnp.where(keep, logits, S.NEG_INF)
    key = jax.random.PRNGKey(3)
    t_ref = jax.random.categorical(key, ref, axis=-1)
    t_mask = jax.random.categorical(key, via_mask, axis=-1)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_mask))
