"""On-device sampling: top-k/top-p filtering + categorical draw + logprobs.

Mirrors the reference semantics (models/vallex.py:791-853): temperature
scaling, top-k filter (disabled when top_k <= 0), nucleus filter (disabled
when top_p >= 1), then a categorical sample with the chosen token's logprob
from the *filtered* distribution. Everything is branch-free jnp so it lives
inside the jitted decode loop — no host round-trips per step.

RNG convention: `jax.random.categorical` (Gumbel argmax). Token sequences
are reproducible under a fixed JAX seed; parity with torch.multinomial is
distributional, not bitwise (documented in SURVEY.md §6). With top_k == 1
sampling degenerates to argmax and matches the reference exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def top_k_filter(logits: jnp.ndarray, top_k: jnp.ndarray) -> jnp.ndarray:
    """Keep the top_k highest logits per row; top_k <= 0 disables.

    Branch-free: computes the k-th threshold via sort (V≈1025, negligible
    next to the transformer step).
    """
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
    k = jnp.clip(top_k, 1, v)
    thresh = jax.lax.dynamic_slice_in_dim(sorted_logits, k - 1, 1, axis=-1)
    filtered = jnp.where(logits < thresh, NEG_INF, logits)
    return jnp.where(top_k > 0, filtered, logits)


def top_p_filter(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering; top_p >= 1 disables.

    Matches the reference's shift-right semantics: the first token whose
    cumulative probability crosses top_p is kept
    (models/vallex.py:811-832).
    """
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum > top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    # scatter back to vocabulary order
    inv = jnp.argsort(sort_idx, axis=-1)
    remove_vocab = jnp.take_along_axis(remove, inv, axis=-1)
    filtered = jnp.where(remove_vocab, NEG_INF, logits)
    return jnp.where(top_p < 1.0, filtered, logits)


def _sortable_key(logits: jnp.ndarray) -> jnp.ndarray:
    """f32 → SIGNED int32 keys with the same total order (IEEE-754 trick:
    non-negative floats keep their bit pattern; negative floats XOR the
    magnitude bits, mapping bigger magnitudes to smaller keys). Lets the
    filter thresholds run as EXACT integer bisection — no sorts, and
    signed-only arithmetic, so the same code runs inside the Pallas decode
    kernels (Mosaic has no unsigned compares)."""
    b = jax.lax.bitcast_convert_type(logits.astype(jnp.float32), jnp.int32)
    return b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))


def _bisect_min_key(count_gt, B: int, pred_limit) -> jnp.ndarray:
    """Find, per row, the minimum int32 key v such that
    count_gt(v) <= pred_limit, by 32-step integer bisection.
    count_gt: fn([B,1] int32 keys) → [B,1] monotone-decreasing counts.
    The overflow-safe floor midpoint (lo>>1)+(hi>>1)+(lo&hi&1) is exact
    for two's-complement ints (arithmetic shift == floor division)."""
    lo = jnp.full((B, 1), -(2**31), jnp.int32)
    hi = jnp.full((B, 1), 2**31 - 1, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & jnp.int32(1))
        too_many = count_gt(mid) > pred_limit
        lo = jnp.where(too_many, mid + jnp.int32(1), lo)
        hi = jnp.where(too_many, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return hi


def topk_keep_mask(logits: jnp.ndarray, top_k: jnp.ndarray) -> jnp.ndarray:
    """[B, V] bool: logit >= its row's k-th largest value — EXACTLY
    top_k_filter's kept set (ties at the threshold all kept), computed
    sort-free so it runs inside the Pallas decode kernels. top_k <= 0
    disables (all-keep)."""
    B, V = logits.shape
    keys = _sortable_key(logits)  # [B, V]
    k = jnp.clip(top_k.astype(jnp.int32), 1, V)

    def count_gt(v):  # [B,1] → [B,1]
        return jnp.sum((keys > v).astype(jnp.int32), axis=1, keepdims=True)

    # min v with count(key > v) < k  ⇒  v == the k-th largest key
    tau = _bisect_min_key(count_gt, B, k - 1)
    keep = keys >= tau
    return jnp.logical_or(keep, top_k.astype(jnp.int32) <= 0)


def topp_keep_mask(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """[B, V] bool: the nucleus with the reference's shift-right
    semantics — keep token i iff the probability mass of tokens STRICTLY
    ranked above it is <= top_p (the crossing token is kept). Exactly
    top_p_filter's kept set for tie-free logits (real-model f32 logits
    tie only at the mask value, where the mass test removes them anyway).
    top_p >= 1 disables (all-keep)."""
    B, V = logits.shape
    keys = _sortable_key(logits)
    lse = jax.nn.logsumexp(logits, axis=1, keepdims=True)
    probs = jnp.exp(logits - lse)  # [B, V]

    def mass_gt(v):  # [B,1] → [B,1] probability mass strictly above v
        return jnp.sum(
            jnp.where(keys > v, probs, 0.0), axis=1, keepdims=True
        )

    tau = _bisect_min_key(count_gt=mass_gt, B=B, pred_limit=top_p)
    keep = keys >= tau
    return jnp.logical_or(keep, top_p >= 1.0)


def filtered_keep_mask(
    logits: jnp.ndarray, top_k: jnp.ndarray, top_p: jnp.ndarray
) -> jnp.ndarray:
    """Combined top-k → top-p kept set (the reference's filter order:
    nucleus mass measured on the top-k-filtered distribution,
    models/vallex.py:791-853). Pure jnp (fori_loop + bit ops), runs both
    under XLA and inside Pallas kernels."""
    keep_k = topk_keep_mask(logits, top_k)
    filtered = jnp.where(keep_k, logits, NEG_INF)
    keep_p = topp_keep_mask(filtered, top_p)
    return jnp.logical_and(keep_k, keep_p)


def speculative_accept(
    rng: jax.Array,
    draft_tokens: jnp.ndarray,  # [K-1] tokens the draft model sampled
    q_logits: jnp.ndarray,  # [K-1, V] draft logits at those positions
    p_logits: jnp.ndarray,  # [K, V] target logits at positions 0..K-1
    temperature: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distribution-exact speculative sampling (Leviathan et al. 2023;
    Chen et al. 2023): accept draft token j with probability
    min(1, p_j(x)/q_j(x)); at the first rejection emit a sample from the
    residual normalize(max(p_j - q_j, 0)); if every draft is accepted
    emit a bonus sample from p_{K-1}. The emitted sequence is distributed
    EXACTLY as per-token sampling from p.

    → (emit [K], logp [K], m): emit[j] is the token emitted at position
    j assuming positions < j were all accepted (the engine commits
    m_accepted+1 of them); logp[j] = log p_j(emit[j]); m = number of
    accepted draft tokens (0..K-1)."""
    Km1, V = q_logits.shape
    t = jnp.maximum(temperature, 1e-6)
    logp_p = jax.nn.log_softmax(p_logits / t, axis=-1)  # [K, V]
    logp_q = jax.nn.log_softmax(q_logits / t, axis=-1)  # [K-1, V]
    r_accept, r_resid, r_bonus = jax.random.split(rng, 3)

    # acceptance tests u_j < p_j(x_j) / q_j(x_j)
    lp_px = jnp.take_along_axis(
        logp_p[:Km1], draft_tokens[:, None], axis=-1
    )[:, 0]
    lp_qx = jnp.take_along_axis(
        logp_q, draft_tokens[:, None], axis=-1
    )[:, 0]
    u = jax.random.uniform(r_accept, (Km1,), minval=1e-9)
    accept = jnp.log(u) < (lp_px - lp_qx)  # [K-1]
    m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))

    # residual distributions max(p - q, 0) per draft position (the
    # all-zero degenerate case — q == p exactly — falls back to p)
    resid = jnp.clip(
        jnp.exp(logp_p[:Km1]) - jnp.exp(logp_q), 0.0, None
    )
    degenerate = jnp.sum(resid, axis=-1, keepdims=True) <= 0.0
    resid = jnp.where(degenerate, jnp.exp(logp_p[:Km1]), resid)
    r_tok = jax.random.categorical(
        r_resid, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
    )  # [K-1]
    bonus = jax.random.categorical(r_bonus, p_logits[-1] / t)  # []

    emit = jnp.concatenate([
        jnp.where(accept, draft_tokens, r_tok),
        bonus[None].astype(draft_tokens.dtype),
    ])  # [K]
    logp = jnp.take_along_axis(logp_p, emit[:, None], axis=-1)[:, 0]
    return emit, logp, m


def topk_sampling(
    rng: jax.Array,
    logits: jnp.ndarray,  # [B, V] fp32
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B], logprobs [B]). top_k == 1 is exact argmax."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    greedy = jnp.argmax(logits, axis=-1)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    tokens = jnp.where(top_k == 1, greedy, sampled)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logprobs, tokens[..., None], axis=-1)[..., 0]
    return tokens, chosen
