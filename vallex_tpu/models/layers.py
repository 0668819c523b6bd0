"""Core NN building blocks as parameter pytrees + pure apply functions.

Design: parameters are plain nested dicts of jnp arrays; every module is an
`init_*` function (returns params) plus a pure `*_apply` function. Transformer
layer stacks are stored with a leading layer axis so the whole stack runs as
one `lax.scan` — one compiled layer body instead of 12 unrolled ones.

Numerical conventions match the torch reference so converted checkpoints are
bit-compatible in fp32:
- linear kernels are stored as [in, out] (transposed from torch's [out, in]);
- attention is pre-norm, fused-QKV, softmax(QKᵀ/√hd + mask)V
  (reference: modules/activation.py:142-167);
- LayerNorm eps 1e-5; AdaptiveLayerNorm projects a stage embedding to
  (scale, shift) applied to a plain LayerNorm's output
  (reference: modules/transformer.py:83-108);
- FFN is Linear→ReLU→Linear (reference: modules/transformer.py:371-373).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so random-weight scales are comparable)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    # torch nn.Linear default init (kaiming_uniform with a=√5) expressed on
    # an [in, out] kernel: uniform(±1/√fan_in) where fan_in = shape[0]
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform_linear(kw, (d_in, d_out))}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_embedding(key, vocab: int, dim: int) -> Params:
    # torch nn.Embedding default: N(0, 1)
    return {"weight": jax.random.normal(key, (vocab, dim), jnp.float32)}


def embedding_apply(p: Params, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w = p["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    return jnp.take(w, ids, axis=0)


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # fp32 statistics regardless of compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def init_adaptive_layer_norm(key, dim: int) -> Params:
    p = init_linear(key, dim, 2 * dim)
    p.update(init_layer_norm(dim))
    return p


def adaptive_layer_norm_apply(
    p: Params, x: jnp.ndarray, stage_emb: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """AdaLN: (W·e) ⊙ LN(x) + (b·e)  (reference: modules/transformer.py:94-107)."""
    wb = jnp.dot(stage_emb, p["w"]) + p["b"]  # [2D]
    dim = x.shape[-1]
    weight, bias = wb[..., :dim], wb[..., dim:]
    normed = layer_norm_apply({"scale": p["scale"], "bias": p["bias"]}, x, eps)
    return (weight.astype(x.dtype) * normed + bias.astype(x.dtype)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sinusoidal positional embedding (reference: modules/embedding.py:50-97)
# ---------------------------------------------------------------------------

def make_sine_pe(max_len: int, dim: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def sine_pe_apply(
    pe_table: jnp.ndarray,
    alpha: jnp.ndarray,
    x: jnp.ndarray,
    offset: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """x + alpha · PE[offset : offset+T]. x: [..., T, D]."""
    T = x.shape[-2]
    pe = jax.lax.dynamic_slice_in_dim(pe_table, offset, T, axis=0)
    return x + (alpha * pe).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def init_mha(key, dim: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    # torch MultiheadAttention: in_proj xavier_uniform, biases zero,
    # out_proj is a Linear (kaiming) with zero bias init via constant_
    return {
        "in_proj_w": _xavier_uniform(k1, (dim, 3 * dim)),
        "in_proj_b": jnp.zeros((3 * dim,)),
        "out_w": _kaiming_uniform_linear(k3, (dim, dim)),
        "out_b": jnp.zeros((dim,)),
    }


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, T, D] → [B, H, T, hd]"""
    B, T, D = x.shape
    return x.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, hd] → [B, T, D]"""
    B, H, T, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """softmax(qkᵀ/√hd + mask)·v with fp32 softmax accumulation.

    q,k,v: [B, H, T, hd]; mask: additive fp32, broadcastable to [B, H, Tq, Tk]
    (use -inf/-1e9 for masked positions).
    """
    hd = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(hd))
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def mha_qkv(p: Params, x: jnp.ndarray, num_heads: int):
    """Fused QKV projection → per-head q, k, v."""
    qkv = jnp.dot(x, p["in_proj_w"].astype(x.dtype)) + p["in_proj_b"].astype(
        x.dtype
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
    )


def mha_out(p: Params, attn: jnp.ndarray) -> jnp.ndarray:
    y = merge_heads(attn)
    return jnp.dot(y, p["out_w"].astype(y.dtype)) + p["out_b"].astype(y.dtype)


def attention_core_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_seg: jnp.ndarray,
    kv_seg: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Flash (blocked online-softmax) attention via the Pallas TPU kernel.

    Plain XLA attention materializes the [T, T] f32 score tensor per head —
    for the NAR's 7 full-sequence stages that is ~35 GB of HBM score traffic
    per utterance, several times the weight traffic. The flash kernel keeps
    the softmax state in VMEM. Masking is segment-based (valid=1, pad=0 —
    queries attend keys with the SAME id), optionally composed with a causal
    constraint; this covers key-padding and causal+padding masks exactly.
    For the AR training pass's prefix-causal mask (bidirectional text block
    + causal audio block) use attention_core_flash_prefix.
    q,k,v: [B, H, T, hd]; q_seg/kv_seg: [B, T] int32.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    hd = q.shape[-1]
    T = q.shape[-2]

    def _largest_block(n: int, cap: int) -> int:
        b = min(n, cap)
        while n % b:
            b -= 128
        return max(b, 128)

    # The library defaults are 128x128 blocks — at our sizes (T ~ 1280,
    # hd 64) the per-block overhead dominates. One KV pass per q block
    # (the whole [T, hd] K/V fits VMEM many times over) is ~2x faster.
    # Under causal, cap KV blocks at 512 so above-diagonal blocks are
    # actually skipped instead of computed-and-masked.
    bq = _largest_block(T, 512)
    bk = _largest_block(k.shape[-2], 512 if causal else 1536)
    out = _fa.flash_attention(
        q, k, v,
        segment_ids=_fa.SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=1.0 / math.sqrt(hd),
        causal=causal,
        block_sizes=_fa.BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            # backward blocks (needed under autodiff — training forwards)
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        ),
    )
    return out.astype(q.dtype)


def attention_core_flash_prefix(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_seg: jnp.ndarray,
    kv_seg: jnp.ndarray,
    text_len: int,
) -> jnp.ndarray:
    """Prefix-causal flash attention: a fully-bidirectional text block of
    static length `text_len` followed by a causal audio block that also sees
    the whole text block (the AR training mask; reference:
    models/vallex.py:535-549 semantics batched over padded buckets).

    Expressed as two flash calls: causal over the full sequence (correct for
    every audio row — all text indices precede them) plus a non-causal pass
    over the text block alone, whose rows replace the causal output's text
    rows. The text block is short (~10-20% of the sequence), so the rerun
    costs far less than materializing the [T, T] mask would.
    """
    out_causal = attention_core_flash(q, k, v, q_seg, kv_seg, causal=True)
    out_text = attention_core_flash(
        q[:, :, :text_len],
        k[:, :, :text_len],
        v[:, :, :text_len],
        q_seg[:, :text_len],
        kv_seg[:, :text_len],
        causal=False,
    )
    return jnp.concatenate(
        [out_text, out_causal[:, :, text_len:]], axis=2
    )


def mha_apply(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    segments=None,
    prefix_flash: Optional[int] = None,
) -> jnp.ndarray:
    q, k, v = mha_qkv(p, x, num_heads)
    if segments is not None:
        if prefix_flash is not None:
            return mha_out(
                p,
                attention_core_flash_prefix(q, k, v, *segments, prefix_flash),
            )
        return mha_out(p, attention_core_flash(q, k, v, *segments))
    return mha_out(p, attention_core(q, k, v, mask))


# ---------------------------------------------------------------------------
# Transformer encoder layer (pre-norm; reference: modules/transformer.py:295-302)
# ---------------------------------------------------------------------------

def init_encoder_layer(key, dim: int, ffn_dim: int, adaptive: bool) -> Params:
    ks = jax.random.split(key, 5)
    norm_init = (
        partial(init_adaptive_layer_norm, dim=dim)
        if adaptive
        else lambda key: init_layer_norm(dim)
    )
    return {
        "self_attn": init_mha(ks[0], dim),
        "linear1": init_linear(ks[1], dim, ffn_dim),
        "linear2": init_linear(ks[2], ffn_dim, dim),
        "norm1": norm_init(key=ks[3]) if adaptive else init_layer_norm(dim),
        "norm2": norm_init(key=ks[4]) if adaptive else init_layer_norm(dim),
    }


def _norm(p_norm, x, stage_emb):
    if stage_emb is None:
        return layer_norm_apply(p_norm, x)
    return adaptive_layer_norm_apply(p_norm, x, stage_emb)


def encoder_layer_apply(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    stage_emb: Optional[jnp.ndarray] = None,
    segments=None,
    prefix_flash: Optional[int] = None,
) -> jnp.ndarray:
    h = _norm(p["norm1"], x, stage_emb)
    x = x + mha_apply(p["self_attn"], h, num_heads, mask, segments,
                      prefix_flash)
    h = _norm(p["norm2"], x, stage_emb)
    h = linear_apply(p["linear1"], h)
    h = jax.nn.relu(h)
    h = linear_apply(p["linear2"], h)
    return x + h


def init_encoder_stack(
    key, num_layers: int, dim: int, ffn_dim: int, adaptive: bool
) -> Params:
    """Stack of layers with a leading layer axis on every leaf (for scan)."""
    keys = jax.random.split(key, num_layers + 1)
    layers = [
        init_encoder_layer(keys[i], dim, ffn_dim, adaptive)
        for i in range(num_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    final_norm = (
        init_adaptive_layer_norm(keys[-1], dim)
        if adaptive
        else init_layer_norm(dim)
    )
    return {"layers": stacked, "norm": final_norm}


def encoder_stack_apply(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    stage_emb: Optional[jnp.ndarray] = None,
    segments=None,
    remat: bool = False,
    prefix_flash: Optional[int] = None,
) -> jnp.ndarray:
    """Run the full stack via lax.scan over the layer axis + final norm.

    segments=(q_seg, kv_seg) switches attention to the flash kernel
    (attention_core_flash) — valid for key-padding-style masks; with
    prefix_flash=<static text length> it runs the prefix-causal variant
    (bidirectional text block + causal audio block) instead.

    remat=True rematerializes each layer under autodiff (training): only
    the per-layer scan inputs are saved instead of every intermediate, so
    activation memory drops ~num_layers× at one extra forward of compute.
    remat="dots" instead saves each layer's matmul outputs and recomputes
    only the cheap elementwise ops — ~5× less recompute than full remat for
    ~4× the activation memory (still ~3× under no-remat's peak).
    Forward-only callers are unaffected (jax.checkpoint is transparent
    outside differentiation)."""

    def apply(carry, layer_p):
        return encoder_layer_apply(
            layer_p, carry, num_heads, mask, stage_emb, segments,
            prefix_flash,
        )

    if remat:
        # prevent_cse=False: CSE cannot happen across scan iterations, and
        # the default's optimization barriers would inhibit XLA fusion
        # inside each layer (the jax.checkpoint docs recommend this
        # combination for scan bodies)
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat == "dots"
            else None
        )
        apply = jax.checkpoint(apply, prevent_cse=False, policy=policy)

    x, _ = jax.lax.scan(lambda c, lp: (apply(c, lp), None), x, p["layers"])
    return _norm(p["norm"], x, stage_emb)


# ---------------------------------------------------------------------------
# Attention with an externally-managed KV cache (for AR decode)
# ---------------------------------------------------------------------------

def encoder_layer_prefill(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray],
):
    """Like encoder_layer_apply but also returns this layer's K,V ([B,H,T,hd])."""
    h = layer_norm_apply(p["norm1"], x)
    q, k, v = mha_qkv(p["self_attn"], h, num_heads)
    attn = attention_core(q, k, v, mask)
    x = x + mha_out(p["self_attn"], attn)
    h = layer_norm_apply(p["norm2"], x)
    x = x + linear_apply(p["linear2"], jax.nn.relu(linear_apply(p["linear1"], h)))
    return x, k, v


def encoder_layer_decode_step(
    p: Params,
    x: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,
    num_heads: int,
    kv_mask: jnp.ndarray,
):
    """Single-query decode step against a static-size KV cache.

    x: [B, 1, D]; cache_k/v: [B, H, Tmax, hd]; pos: scalar index where this
    step's K,V are written; kv_mask: additive [B, 1, 1, Tmax] (or broadcast)
    masking positions > pos. Returns (x_out, new_cache_k, new_cache_v).
    """
    h = layer_norm_apply(p["norm1"], x)
    q, k, v = mha_qkv(p["self_attn"], h, num_heads)  # [B,H,1,hd]
    cache_k = jax.lax.dynamic_update_slice_in_dim(
        cache_k, k.astype(cache_k.dtype), pos, axis=2
    )
    cache_v = jax.lax.dynamic_update_slice_in_dim(
        cache_v, v.astype(cache_v.dtype), pos, axis=2
    )
    attn = attention_core(q, cache_k.astype(q.dtype), cache_v.astype(q.dtype), kv_mask)
    x = x + mha_out(p["self_attn"], attn)
    h = layer_norm_apply(p["norm2"], x)
    x = x + linear_apply(p["linear2"], jax.nn.relu(linear_apply(p["linear1"], h)))
    return x, cache_k, cache_v


# ---------------------------------------------------------------------------
# Transformer decoder layer (self-attn + cross-attn + FFN, pre-norm;
# reference: modules/transformer.py:476-668) — used by VALL-F and the
# seq2seq debug TTS.
# ---------------------------------------------------------------------------

def init_decoder_layer(key, dim: int, ffn_dim: int, adaptive: bool) -> Params:
    ks = jax.random.split(key, 6)
    if adaptive:
        norms = {
            f"norm{i}": init_adaptive_layer_norm(ks[i + 2], dim)
            for i in range(3)
        }
    else:
        norms = {f"norm{i}": init_layer_norm(dim) for i in range(3)}
    return {
        "self_attn": init_mha(ks[0], dim),
        "cross_attn": init_mha(ks[1], dim),
        "linear1": init_linear(ks[2], dim, ffn_dim),
        "linear2": init_linear(ks[3], ffn_dim, dim),
        **norms,
    }


def cross_mha_apply(
    p: Params,
    q_in: jnp.ndarray,  # [B, Tq, D]
    kv_in: jnp.ndarray,  # [B, Tk, D]
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross attention with the packed in-proj layout (q from W[:, :D],
    k/v from W[:, D:], matching torch's _in_projection_packed;
    reference: modules/activation.py:12-65)."""
    D = q_in.shape[-1]
    w = p["in_proj_w"].astype(q_in.dtype)
    b = p["in_proj_b"].astype(q_in.dtype)
    q = jnp.dot(q_in, w[:, :D]) + b[:D]
    kv = jnp.dot(kv_in, w[:, D:]) + b[D:]
    k, v = jnp.split(kv, 2, axis=-1)
    out = attention_core(
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
        mask,
    )
    return mha_out(p, out)


def decoder_layer_apply(
    p: Params,
    x: jnp.ndarray,  # [B, T, D] target sequence
    memory: jnp.ndarray,  # [B, S, D] encoder output
    num_heads: int,
    self_mask: Optional[jnp.ndarray] = None,
    cross_mask: Optional[jnp.ndarray] = None,
    stage_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    h = _norm(p["norm0"], x, stage_emb)
    x = x + mha_apply(p["self_attn"], h, num_heads, self_mask)
    h = _norm(p["norm1"], x, stage_emb)
    x = x + cross_mha_apply(p["cross_attn"], h, memory, num_heads, cross_mask)
    h = _norm(p["norm2"], x, stage_emb)
    h = linear_apply(p["linear1"], h)
    h = jax.nn.relu(h)
    h = linear_apply(p["linear2"], h)
    return x + h


def init_decoder_stack(
    key, num_layers: int, dim: int, ffn_dim: int, adaptive: bool
) -> Params:
    keys = jax.random.split(key, num_layers + 1)
    layers = [
        init_decoder_layer(keys[i], dim, ffn_dim, adaptive)
        for i in range(num_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    final_norm = (
        init_adaptive_layer_norm(keys[-1], dim)
        if adaptive
        else init_layer_norm(dim)
    )
    return {"layers": stacked, "norm": final_norm}


def decoder_stack_apply(
    p: Params,
    x: jnp.ndarray,
    memory: jnp.ndarray,
    num_heads: int,
    self_mask: Optional[jnp.ndarray] = None,
    cross_mask: Optional[jnp.ndarray] = None,
    stage_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    def body(carry, layer_p):
        return (
            decoder_layer_apply(
                layer_p, carry, memory, num_heads,
                self_mask, cross_mask, stage_emb,
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, p["layers"])
    return _norm(p["norm"], x, stage_emb)
