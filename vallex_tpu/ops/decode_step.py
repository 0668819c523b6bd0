"""Pallas megakernel: one AR decode step (all 12 layers) in a single call.

The per-layer pallas_call decode path still pays ~23 us of launch/fusion
overhead x 12 layers plus XLA's scheduling of ~100 small ops per step. This
kernel runs the ENTIRE transformer step in one pallas_call:

  grid = (num_layers,) — Mosaic auto-pipelines the per-layer weight blocks
  (HBM→VMEM double-buffering of Wqkv/Wout/W1/W2, ~25 MB/layer in bf16) while
  the previous layer computes, so weight streaming rides at full HBM
  bandwidth — the theoretical floor for a 150 M-param bf16 decode step.

Per grid step (= layer): pre-norm LN → fused QKV matvec → flash attention
over the layer's lane-packed KV cache (manual valid-block DMA, same scheme
as ops/decode_attention.py) → out-proj (+residual) → LN → FFN (+residual).
The hidden state lives in a VMEM scratch accumulator across grid steps.
This step's k/v for every layer are returned as outputs; the engine writes
them into the caches with one in-place dynamic_update_slice each (Mosaic
tiling forbids 1-row DMA writes along the slot axis).

Layout/masking contract matches engine/ar.py: caches are [NL, C, N] with
N = B*H*hd lanes; valid slots are c < x_len (text) and s_text <= c < slot
(audio); this step's own k/v is folded into the softmax in-kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ABLK = 512  # audio cache slots per DMA block (big: fewer sem waits)


def _kernel(
    # scalar prefetch
    x_len_ref,  # [1]
    pos_ref,  # [1]
    # inputs (per-layer blocks unless noted)
    x_ref,  # [B, D] VMEM — the step's input activation (same every layer)
    wqkv_ref,  # [1, D, 3D] VMEM block of stacked [NL, D, 3D]
    bqkv_ref,  # [1, 1, 3D]
    wout_ref,  # [1, D, D]
    bout_ref,  # [1, 1, D]
    w1_ref,  # [1, D, F]
    b1_ref,  # [1, 1, F]
    w2_ref,  # [1, F, D]
    b2_ref,  # [1, 1, D]
    ln1s_ref,  # [1, 1, D]
    ln1b_ref,  # [1, 1, D]
    ln2s_ref,  # [1, 1, D]
    ln2b_ref,  # [1, 1, D]
    fns_ref,  # [1, D] final-norm scale
    fnb_ref,  # [1, D] final-norm bias
    wpred_ref,  # [D, VP] prediction head (vocab padded to a lane multiple)
    cache_k_hbm,  # [NL, C, N] HBM
    cache_v_hbm,  # [NL, C, N] HBM
    # outputs
    logits_ref,  # [B, VP] VMEM — next-token logits (padded vocab)
    newk_ref,  # [1, B, N] VMEM block of [NL, B, N]
    newv_ref,  # [1, B, N]
    # scratch
    h_acc,  # [B, D] f32 VMEM — hidden state across layers
    kbuf,  # [2, BLK, N] VMEM
    vbuf,  # [2, BLK, N]
    sems,  # DMA sems [2, 2]
    *,
    s_text: int,
    num_heads: int,
):
    layer = pl.program_id(0)
    num_layers = pl.num_programs(0)
    B, D = x_ref.shape
    NL_C_N = cache_k_hbm.shape
    C, N = NL_C_N[1], NL_C_N[2]
    hd = D // num_heads
    G = N // hd  # B * H head groups
    x_len = x_len_ref[0]
    pos = pos_ref[0]
    slot = s_text + pos
    scale = 1.0 / math.sqrt(hd)
    eps = 1e-5

    @pl.when(layer == 0)
    def _():
        h_acc[...] = x_ref[...].astype(jnp.float32)

    def ln(x, s, b):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * s + b

    h = h_acc[...]  # [B, D] f32

    # ---- attention ---------------------------------------------------------
    h1 = ln(h, ln1s_ref[0, 0].astype(jnp.float32), ln1b_ref[0, 0].astype(jnp.float32))
    qkv = (
        jax.lax.dot(
            h1.astype(wqkv_ref.dtype), wqkv_ref[0],
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[0, 0].astype(jnp.float32)
    )  # [B, 3D]
    q = qkv[:, :D].reshape(1, N)
    k_new = qkv[:, D : 2 * D].reshape(1, N)
    v_new = qkv[:, 2 * D :].reshape(1, N)
    newk_ref[0] = qkv[:, D : 2 * D].astype(newk_ref.dtype)
    newv_ref[0] = qkv[:, 2 * D :].astype(newv_ref.dtype)

    # head selector (lane → head group)
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (N, G), 0) // hd
    group_id = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
    sel = (lane_group == group_id).astype(jnp.float32)

    # Valid cache rows form two runs: [0, x_len) text and [s_text, slot)
    # audio. The text run is ONE static DMA of s_text rows (padding rows are
    # masked); audio uses ABLK-row blocks — big blocks keep semaphore waits
    # at ~3 per layer instead of ~10.
    n_audio = pos // ABLK + 1
    total = 1 + n_audio  # ordinal 0 = text, 1.. = audio blocks

    def text_dma(buf_slot):
        return (
            pltpu.make_async_copy(
                cache_k_hbm.at[layer, pl.ds(0, s_text), :],
                kbuf.at[buf_slot, pl.ds(0, s_text), :],
                sems.at[buf_slot, 0],
            ),
            pltpu.make_async_copy(
                cache_v_hbm.at[layer, pl.ds(0, s_text), :],
                vbuf.at[buf_slot, pl.ds(0, s_text), :],
                sems.at[buf_slot, 1],
            ),
        )

    def audio_dma(i, buf_slot):
        start = s_text + pl.multiple_of((i - 1) * ABLK, ABLK)
        return (
            pltpu.make_async_copy(
                cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                kbuf.at[buf_slot], sems.at[buf_slot, 0],
            ),
            pltpu.make_async_copy(
                cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                vbuf.at[buf_slot], sems.at[buf_slot, 1],
            ),
        )

    def start_dma(i, buf_slot):
        @pl.when(i == 0)
        def _():
            a, b = text_dma(buf_slot)
            a.start()
            b.start()

        @pl.when(i != 0)
        def _():
            a, b = audio_dma(i, buf_slot)
            a.start()
            b.start()

    def wait_dma(i, buf_slot):
        @pl.when(i == 0)
        def _():
            a, b = text_dma(buf_slot)
            a.wait()
            b.wait()

        @pl.when(i != 0)
        def _():
            a, b = audio_dma(i, buf_slot)
            a.wait()
            b.wait()

    start_dma(0, 0)
    qf = q[0]  # [N] f32

    def body(i, carry):
        m_i, l_i, acc = carry
        buf_slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _():
            start_dma(i + 1, jax.lax.rem(i + 1, 2))

        wait_dma(i, buf_slot)
        # cache-row index of each buffer row (text rows beyond the copied
        # s_text hold stale data; audio rows offset by block)
        base = jnp.where(i == 0, 0, s_text + (i - 1) * ABLK)
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (ABLK, 1), 0)
        # (scalar-conditioned select over bool vectors doesn't legalize in
        # Mosaic; broadcasted logical ops do)
        is_text = i == 0
        ok = jnp.logical_or(
            jnp.logical_and(
                is_text, jnp.logical_and(rows < x_len, rows < s_text)
            ),
            jnp.logical_and(
                jnp.logical_not(is_text),
                jnp.logical_and(rows >= s_text, rows < slot),
            ),
        )
        # zero stale/invalid rows — uninitialized VMEM can hold NaN bit
        # patterns, and 0·NaN would poison the p·V accumulation
        kb = jnp.where(ok, kbuf[buf_slot].astype(jnp.float32), 0.0)
        vb = jnp.where(ok, vbuf[buf_slot].astype(jnp.float32), 0.0)

        s = jax.lax.dot(
            kb * qf[None, :], sel, preferred_element_type=jnp.float32
        ) * scale  # [ABLK, G]
        s = jnp.where(ok, s, -1e30)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)
        p_lanes = jax.lax.dot(p, sel.T, preferred_element_type=jnp.float32)
        alpha_lanes = jax.lax.dot(
            alpha, sel.T, preferred_element_type=jnp.float32
        )
        acc_new = acc * alpha_lanes + jnp.sum(
            p_lanes * vb, axis=0, keepdims=True
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((1, G), -1e30, jnp.float32)
    l0 = jnp.zeros((1, G), jnp.float32)
    a0 = jnp.zeros((1, N), jnp.float32)
    m_i, l_i, acc = jax.lax.fori_loop(0, total, body, (m0, l0, a0))

    # own k/v fold-in
    own_s = jax.lax.dot(
        (qf * k_new[0])[None, :], sel, preferred_element_type=jnp.float32
    ) * scale
    m_new = jnp.maximum(m_i, own_s)
    alpha = jnp.exp(m_i - m_new)
    p_own = jnp.exp(own_s - m_new)
    l_new = l_i * alpha + p_own
    alpha_lanes = jax.lax.dot(alpha, sel.T, preferred_element_type=jnp.float32)
    p_own_lanes = jax.lax.dot(p_own, sel.T, preferred_element_type=jnp.float32)
    acc = acc * alpha_lanes + p_own_lanes * v_new[0][None, :]
    l_lanes = jax.lax.dot(l_new, sel.T, preferred_element_type=jnp.float32)
    attn = (acc / l_lanes).reshape(B, D)  # [B, D] f32

    h = h + (
        jax.lax.dot(
            attn.astype(wout_ref.dtype), wout_ref[0],
            preferred_element_type=jnp.float32,
        )
        + bout_ref[0, 0].astype(jnp.float32)
    )

    # ---- FFN ----------------------------------------------------------------
    h2 = ln(h, ln2s_ref[0, 0].astype(jnp.float32), ln2b_ref[0, 0].astype(jnp.float32))
    f = (
        jax.lax.dot(
            h2.astype(w1_ref.dtype), w1_ref[0],
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0, 0].astype(jnp.float32)
    )
    f = jnp.maximum(f, 0.0)
    h = h + (
        jax.lax.dot(
            f.astype(w2_ref.dtype), w2_ref[0],
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0, 0].astype(jnp.float32)
    )

    h_acc[...] = h

    # final norm + prediction head fused into the last layer's step
    @pl.when(layer == num_layers - 1)
    def _():
        hf = ln(
            h,
            fns_ref[0].astype(jnp.float32),
            fnb_ref[0].astype(jnp.float32),
        )
        logits_ref[...] = jax.lax.dot(
            hf.astype(wpred_ref.dtype), wpred_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(logits_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("s_text", "num_heads")
)
def decode_step(
    x: jnp.ndarray,  # [B, D] this step's input embedding (+PE)
    layer_weights,  # dict of stacked per-layer weights (see engine)
    cache_k: jnp.ndarray,  # [NL, C, N]
    cache_v: jnp.ndarray,  # [NL, C, N]
    x_len: jnp.ndarray,
    audio_pos: jnp.ndarray,
    *,
    s_text: int,
    num_heads: int,
):
    """→ (logits [B, VP] fp32 (vocab lane-padded), cache_k', cache_v')."""
    B, D = x.shape
    NL, C, N = cache_k.shape
    F = layer_weights["w1"].shape[-1]
    VP = layer_weights["wpred"].shape[-1]
    assert s_text <= ABLK and (C - s_text) % ABLK == 0, (C, s_text)
    assert s_text % 128 == 0

    lw = layer_weights
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NL,),
        in_specs=[
            pl.BlockSpec((B, D), lambda l, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 3 * D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, 3 * D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, D, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, D, F), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, F, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, D), lambda l, *_: (0, 0)),
            pl.BlockSpec((1, D), lambda l, *_: (0, 0)),
            pl.BlockSpec((D, VP), lambda l, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(
                (B, VP), lambda l, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, B, N), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, B, N), lambda l, *_: (l, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((2, ABLK, N), cache_k.dtype),
            pltpu.VMEM((2, ABLK, N), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    logits, newk, newv = pl.pallas_call(
        functools.partial(_kernel, s_text=s_text, num_heads=num_heads),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, VP), jnp.float32),
            jax.ShapeDtypeStruct((NL, B, N), cache_k.dtype),
            jax.ShapeDtypeStruct((NL, B, N), cache_v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        x_len.astype(jnp.int32)[None],
        audio_pos.astype(jnp.int32)[None],
        x,
        lw["wqkv"], lw["bqkv"], lw["wout"], lw["bout"],
        lw["w1"], lw["b1"], lw["w2"], lw["b2"],
        lw["ln1s"], lw["ln1b"], lw["ln2s"], lw["ln2b"],
        lw["fns"], lw["fnb"], lw["wpred"],
        cache_k, cache_v,
    )
    slot = s_text + audio_pos.astype(jnp.int32)
    ck = jax.lax.dynamic_update_slice(
        cache_k, newk.astype(cache_k.dtype), (0, slot, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cache_v, newv.astype(cache_v.dtype), (0, slot, 0)
    )
    return logits, ck, cv


VOCAB_PAD = 128  # pad the prediction vocab to a lane multiple


def pack_layer_weights(
    layers: dict, dtype=jnp.bfloat16, final_norm=None, predict_w=None
) -> dict:
    """Engine param stack → the megakernel's flat stacked-weight dict.

    final_norm: {'scale','bias'} of the stack's last LayerNorm;
    predict_w: [D, V] prediction head (V lane-padded with -inf-safe zeros;
    the engine masks logits beyond the true vocab).
    """
    sa = layers["self_attn"]

    def vec(a):  # [NL, dim] → [NL, 1, dim] so blocks equal trailing dims
        return a[:, None, :].astype(dtype)

    return {
        "wqkv": sa["in_proj_w"].astype(dtype),
        "bqkv": vec(sa["in_proj_b"]),
        "wout": sa["out_w"].astype(dtype),
        "bout": vec(sa["out_b"]),
        "w1": layers["linear1"]["w"].astype(dtype),
        "b1": vec(layers["linear1"]["b"]),
        "w2": layers["linear2"]["w"].astype(dtype),
        "b2": vec(layers["linear2"]["b"]),
        "ln1s": vec(layers["norm1"]["scale"]),
        "ln1b": vec(layers["norm1"]["bias"]),
        "ln2s": vec(layers["norm2"]["scale"]),
        "ln2b": vec(layers["norm2"]["bias"]),
        "fns": final_norm["scale"][None, :].astype(dtype),
        "fnb": final_norm["bias"][None, :].astype(dtype),
        "wpred": _pad_vocab(predict_w).astype(dtype),
    }


def _pad_vocab(w):
    D, V = w.shape
    VP = -(-V // VOCAB_PAD) * VOCAB_PAD
    if VP == V:
        return w
    return jnp.concatenate([w, jnp.zeros((D, VP - V), w.dtype)], axis=1)
