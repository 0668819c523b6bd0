"""Pallas megakernel: one AR decode step (all layers) in a single call.

The per-layer pallas_call decode path pays ~23 us of launch overhead per
layer plus XLA's scheduling of ~100 small ops per step. This kernel runs the
ENTIRE transformer step in one pallas_call with a two-phase grid:

  grid = (num_layers, 2)   phase 0 = attention, phase 1 = FFN

Splitting each layer into two grid steps halves the weight chunk Mosaic
must double-buffer per step (attention ~8.3 MB, FFN ~16.8 MB in bf16), so
the HBM weight stream pipelines against compute at finer granularity — the
step approaches the weight-streaming floor of a 150 M-param bf16 decoder.
Phase-shifted index maps make each weight block arrive one grid step before
it is consumed:

  attention weights: block l fetched during (l-1, FFN) → used at (l, ATTN)
  FFN weights:       block l fetched during (l, ATTN)  → used at (l, FFN)

Phase 0: pre-norm LN → fused QKV matvec → flash attention over the layer's
lane-packed KV cache (manual valid-block DMA: one static text-region copy +
ABLK-row audio blocks, stale rows sanitized) → out-proj + residual.
Phase 1: LN → FFN + residual; on the last layer it also applies the final
LayerNorm and the lane-padded prediction head, so next-token logits come
straight out of the kernel. The hidden state lives in VMEM scratch across
grid steps.

This step's own k/v is folded into the softmax in-kernel; per-layer k/v
columns are returned as outputs and written into the caches by one in-place
XLA dynamic_update_slice each (Mosaic tiling forbids 1-row DMA writes along
the slot axis).

Masking contract (engine/ar.py layout): cache row c is valid iff c < x_len
(text) or s_text <= c < s_text + pos (audio). Constraints: s_text <= ABLK,
s_text % 128 == 0, (C - s_text) % ABLK == 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ABLK = 512  # audio cache rows per DMA block

ATTN, FFN = 0, 1


def _kernel(
    # scalar prefetch
    x_len_ref,  # [1]
    pos_ref,  # [1]
    tok_ref,  # [B] this step's input tokens (fused mode; else ignored)
    seed_ref,  # [1] per-step PRNG seed (fused mode)
    greedy_ref,  # [1] 1 ⇒ argmax sampling (fused mode)
    # inputs
    x_ref,  # [B, D] VMEM — the step's input activation (non-fused mode)
    wqkv_ref,  # [1, D, 3D] block of [NL, D, 3D]
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
    wpred_ref,  # [D, VP] prediction head (vocab lane-padded)
    sqkv_ref,  # [1, 1, 3D] per-output-channel int8 scales (quant mode)
    sout_ref,  # [1, 1, D]
    s1_ref,  # [1, 1, F]
    s2_ref,  # [1, 1, D]
    spred_ref,  # [1, VP]
    emb_ref,  # [VB, D] audio-token embedding table (fused mode)
    alpha_temp_ref,  # [1, 2] SMEM: (pe alpha, sampling temperature)
    cache_k_hbm,  # [NL, C, N] HBM (read-only)
    cache_v_hbm,  # [NL, C, N]
    # outputs
    logits_ref,  # [B, VP] VMEM
    tok_out_ref,  # [B, 1] i32 — next sampled token (fused mode)
    logp_out_ref,  # [B, 1] f32 — its logprob (fused mode)
    newk_ref,  # [1, 1, N] block of [NL, 1, N] (lane-packed cache column)
    newv_ref,  # [1, 1, N]
    # scratch
    h_acc,  # [B, D] f32 — hidden state across grid steps
    kbuf,  # [2, ABLK, N]
    vbuf,  # [2, ABLK, N]
    sems,  # DMA sems [2, 2]
    *,
    s_text: int,
    num_heads: int,
    fused: bool,
    vocab: int,
    stochastic: bool = False,
    quant: bool = False,
    act_quant: bool = False,
    two_phase: bool = True,
):
    layer = pl.program_id(0)
    phase = pl.program_id(1) if two_phase else None
    num_layers = pl.num_programs(0)
    B, D = x_ref.shape
    C, N = cache_k_hbm.shape[1], cache_k_hbm.shape[2]
    hd = D // num_heads
    G = N // hd
    x_len = x_len_ref[0]
    pos = pos_ref[0]
    slot = s_text + pos
    scale = 1.0 / math.sqrt(hd)
    eps = 1e-5

    def ln(x, s, b):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * s + b

    def qmat(x, w_blk, srow):
        """W8A8 matmul: dynamic per-row int8 activations × int8 weights on
        the MXU. Skips the int8→bf16 weight cast of the W8A16 path (the
        cast is ~12.5M VPU elements/layer — the dominant non-DMA cost)."""
        ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [B, 1]
        sx = jnp.maximum(ax, 1e-6) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot(xq, w_blk, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sx * srow)

    # ---------------- phase 0: attention -----------------------------------
    def _attention():
        @pl.when(layer == 0)
        def _():
            if fused:
                # h0 = emb[token] + alpha·PE[audio position `pos`]:
                # one-hot matmul gather + in-kernel sinusoidal row (no XLA
                # glue between steps). Scalar-prefetch refs are SMEM, so
                # tokens are read element-wise (B is small and static).
                VB = emb_ref.shape[0]
                vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, VB), 1)
                beam_ids = jax.lax.broadcasted_iota(jnp.int32, (B, VB), 0)
                # scatter the B scalar tokens into a [B, VB] column via
                # static where-chain (stack/concat of 1-D rows doesn't
                # legalize in Mosaic)
                tok_col = jnp.zeros((B, VB), jnp.int32)
                for i in range(B):
                    tok_col = jnp.where(beam_ids == i, tok_ref[i], tok_col)
                onehot = (vocab_ids == tok_col).astype(emb_ref.dtype)
                emb = jax.lax.dot(
                    onehot, emb_ref[...],
                    preferred_element_type=jnp.float32,
                )  # [B, D]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
                freq = jnp.exp(
                    (lane // 2 * 2).astype(jnp.float32)
                    * (-math.log(10000.0) / D)
                )
                ang = pos.astype(jnp.float32) * freq
                pe_row = jnp.where(
                    lane % 2 == 0, jnp.sin(ang), jnp.cos(ang)
                )
                alpha = alpha_temp_ref[0, 0]
                h_acc[...] = emb + alpha * pe_row
            else:
                h_acc[...] = x_ref[...].astype(jnp.float32)

        h = h_acc[...]
        h1 = ln(
            h,
            ln1s_ref[0, 0].astype(jnp.float32),
            ln1b_ref[0, 0].astype(jnp.float32),
        )
        # int8 weights stream at half the HBM cost; the per-output-channel
        # scale folds into the matmul result, so "dequantization" is only
        # the int8→bf16 operand cast (overlapped with the weight DMA)
        if quant and act_quant:
            qkv = qmat(h1, wqkv_ref[0], sqkv_ref[0, 0]) + bqkv_ref[
                0, 0
            ].astype(jnp.float32)
        elif quant:
            qkv = jax.lax.dot(
                h1.astype(jnp.bfloat16), wqkv_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * sqkv_ref[0, 0] + bqkv_ref[0, 0].astype(jnp.float32)
        else:
            qkv = (
                jax.lax.dot(
                    h1.astype(wqkv_ref.dtype), wqkv_ref[0],
                    preferred_element_type=jnp.float32,
                )
                + bqkv_ref[0, 0].astype(jnp.float32)
            )  # [B, 3D]
        # lane-pack the per-beam heads: [B, D] → [1, N] with N = B·H·hd
        q = qkv[:, :D].reshape(1, N)
        k_new = qkv[:, D : 2 * D].reshape(1, N)
        v_new = qkv[:, 2 * D :].reshape(1, N)
        newk_ref[0] = k_new.astype(newk_ref.dtype)
        newv_ref[0] = v_new.astype(newv_ref.dtype)

        lane_group = jax.lax.broadcasted_iota(jnp.int32, (N, G), 0) // hd
        group_id = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
        sel = (lane_group == group_id).astype(jnp.float32)
        # quantized B>1: bf16 score/spread matmul operands (f32
        # accumulation) — in lockstep with ops/decode_block.py's folds;
        # B=1 and the strict quantize="none" modes keep f32
        score16 = B > 1 and quant
        sel_s = sel.astype(jnp.bfloat16) if score16 else sel
        selT_s = sel.T.astype(jnp.bfloat16) if score16 else sel.T

        def cast_s(x):
            return x.astype(jnp.bfloat16) if score16 else x

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
        qf = q[0]

        def body(i, carry):
            m_i, l_i, acc = carry
            buf_slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < total)
            def _():
                start_dma(i + 1, jax.lax.rem(i + 1, 2))

            wait_dma(i, buf_slot)
            base = jnp.where(i == 0, 0, s_text + (i - 1) * ABLK)
            rows = base + jax.lax.broadcasted_iota(jnp.int32, (ABLK, 1), 0)
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
            # zero stale/invalid rows (uninitialized VMEM may hold NaN bit
            # patterns; 0 * NaN would poison the p*V accumulation)
            kb = jnp.where(ok, kbuf[buf_slot].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[buf_slot].astype(jnp.float32), 0.0)

            s = jax.lax.dot(
                cast_s(kb * qf[None, :]), sel_s,
                preferred_element_type=jnp.float32,
            ) * scale  # [ABLK, G]
            s = jnp.where(ok, s, -1e30)

            m_new = jnp.maximum(m_i, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_i - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)
            p_lanes = jax.lax.dot(
                cast_s(p), selT_s, preferred_element_type=jnp.float32
            )
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

        # fold in this step's own k/v (the slot column, excluded above)
        own_s = jax.lax.dot(
            cast_s((qf * k_new[0])[None, :]), sel_s,
            preferred_element_type=jnp.float32,
        ) * scale
        m_new = jnp.maximum(m_i, own_s)
        alpha = jnp.exp(m_i - m_new)
        p_own = jnp.exp(own_s - m_new)
        l_new = l_i * alpha + p_own
        alpha_lanes = jax.lax.dot(
            alpha, sel.T, preferred_element_type=jnp.float32
        )
        p_own_lanes = jax.lax.dot(
            cast_s(p_own), selT_s, preferred_element_type=jnp.float32
        )
        acc = acc * alpha_lanes + p_own_lanes * v_new[0][None, :]
        l_lanes = jax.lax.dot(
            l_new, sel.T, preferred_element_type=jnp.float32
        )
        attn = (acc / l_lanes).reshape(B, D)

        if quant and act_quant:
            out_proj = qmat(attn, wout_ref[0], sout_ref[0, 0])
        elif quant:
            out_proj = jax.lax.dot(
                attn.astype(jnp.bfloat16), wout_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * sout_ref[0, 0]
        else:
            out_proj = jax.lax.dot(
                attn.astype(wout_ref.dtype), wout_ref[0],
                preferred_element_type=jnp.float32,
            )
        h_acc[...] = h + out_proj + bout_ref[0, 0].astype(jnp.float32)

    # ---------------- phase 1: FFN (+ head on the last layer) --------------
    def _ffn():
        h = h_acc[...]
        h2 = ln(
            h,
            ln2s_ref[0, 0].astype(jnp.float32),
            ln2b_ref[0, 0].astype(jnp.float32),
        )
        if quant and act_quant:
            f = qmat(h2, w1_ref[0], s1_ref[0, 0]) + b1_ref[0, 0].astype(
                jnp.float32
            )
        elif quant:
            f = jax.lax.dot(
                h2.astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * s1_ref[0, 0] + b1_ref[0, 0].astype(jnp.float32)
        else:
            f = (
                jax.lax.dot(
                    h2.astype(w1_ref.dtype), w1_ref[0],
                    preferred_element_type=jnp.float32,
                )
                + b1_ref[0, 0].astype(jnp.float32)
            )
        f = jnp.maximum(f, 0.0)
        if quant and act_quant:
            down = qmat(f, w2_ref[0], s2_ref[0, 0])
        elif quant:
            down = jax.lax.dot(
                f.astype(jnp.bfloat16), w2_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * s2_ref[0, 0]
        else:
            down = jax.lax.dot(
                f.astype(w2_ref.dtype), w2_ref[0],
                preferred_element_type=jnp.float32,
            )
        h = h + down + b2_ref[0, 0].astype(jnp.float32)
        h_acc[...] = h

        @pl.when(layer == num_layers - 1)
        def _():
            hf = ln(
                h,
                fns_ref[0].astype(jnp.float32),
                fnb_ref[0].astype(jnp.float32),
            )
            if quant:
                logits = jax.lax.dot(
                    hf.astype(jnp.bfloat16),
                    wpred_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * spred_ref[...]
            else:
                logits = jax.lax.dot(
                    hf.astype(wpred_ref.dtype), wpred_ref[...],
                    preferred_element_type=jnp.float32,
                )
            logits_ref[...] = logits.astype(logits_ref.dtype)
            if fused:
                # next-token sampling in-kernel (plain path: no top-k/top-p)
                VP = logits.shape[1]
                lanes = jax.lax.broadcasted_iota(jnp.int32, (B, VP), 1)
                masked = jnp.where(lanes < vocab, logits, -1e30)
                temp = jnp.maximum(alpha_temp_ref[0, 1], 1e-6)
                scaled = masked / temp

                if stochastic:
                    # Gumbel-max categorical via the on-core PRNG.
                    # prng_random_bits returns SIGNED int32 on TPU: mask to
                    # the low 24 bits (an arithmetic >>8 of a negative value
                    # would make u negative → log(neg) = NaN gumbel)
                    pltpu.prng_seed(seed_ref[0])
                    bits = pltpu.prng_random_bits((B, VP))
                    u = (bits & 0xFFFFFF).astype(jnp.float32) * (
                        1.0 / (1 << 24)
                    )
                    gumbel = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
                    score = scaled + gumbel
                else:
                    score = masked
                best = jnp.max(score, axis=1, keepdims=True)
                # argmax via lowest winning lane (ties → smallest index,
                # matching jnp.argmax)
                tok = jnp.min(
                    jnp.where(score == best, lanes, VP), axis=1,
                    keepdims=True,
                )  # [B, 1]
                # NaN logits make `score == best` all-False → tok = VP;
                # clamp to a valid id so downstream gathers stay in range
                tok = jnp.minimum(tok, vocab - 1)
                logp = scaled - jax.nn.logsumexp(scaled, axis=1,
                                                 keepdims=True)
                chosen = jnp.sum(
                    jnp.where(lanes == tok, logp, 0.0), axis=1,
                    keepdims=True,
                )
                # SMEM outputs take scalar stores
                for i in range(B):
                    tok_out_ref[i, 0] = tok[i, 0].astype(jnp.int32)
                    logp_out_ref[i, 0] = chosen[i, 0]

    if two_phase:
        pl.when(phase == ATTN)(_attention)
        pl.when(phase == FFN)(_ffn)
    else:
        _attention()
        _ffn()


def _call_kernel(
    lw, cache_k, cache_v, x, tokens, seeds, greedy, alpha_temp,
    x_len, audio_pos, *, s_text, num_heads, fused, vocab,
    stochastic=False, quant=False, act_quant=False, two_phase=True,
):
    B = x.shape[0]
    NL, C, N = cache_k.shape
    D = x.shape[1]
    F = lw["w1"].shape[-1]
    VP = lw["wpred"].shape[-1]
    VB = lw["emb"].shape[0]
    assert s_text <= ABLK and (C - s_text) % ABLK == 0, (C, s_text)
    assert s_text % 128 == 0

    if two_phase:
        # attention weights arrive during the previous layer's FFN phase;
        # FFN weights arrive during this layer's attention phase
        attn_idx = lambda l, p, *_: (l, 0, 0)  # noqa: E731
        ffn_idx = lambda l, p, *_: (  # noqa: E731
            jnp.maximum(l - 1 + p, 0), 0, 0,
        )
        const2 = lambda l, p, *_: (0, 0)  # noqa: E731
        out_idx = lambda l, p, *_: (l, 0, 0)  # noqa: E731
        grid = (NL, 2)
    else:
        # single-phase: one grid step per layer; Mosaic double-buffers the
        # next layer's whole-weight blocks (half the grid-step overhead,
        # double the per-step VMEM)
        attn_idx = lambda l, *_: (l, 0, 0)  # noqa: E731
        ffn_idx = attn_idx
        const2 = lambda l, *_: (0, 0)  # noqa: E731
        out_idx = attn_idx
        grid = (NL,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 3 * D), attn_idx),
            pl.BlockSpec((1, 1, 3 * D), attn_idx),
            pl.BlockSpec((1, D, D), attn_idx),
            pl.BlockSpec((1, 1, D), attn_idx),
            pl.BlockSpec((1, D, F), ffn_idx),
            pl.BlockSpec((1, 1, F), ffn_idx),
            pl.BlockSpec((1, F, D), ffn_idx),
            pl.BlockSpec((1, 1, D), ffn_idx),
            pl.BlockSpec((1, 1, D), attn_idx),
            pl.BlockSpec((1, 1, D), attn_idx),
            pl.BlockSpec((1, 1, D), ffn_idx),
            pl.BlockSpec((1, 1, D), ffn_idx),
            pl.BlockSpec((1, D), const2),
            pl.BlockSpec((1, D), const2),
            pl.BlockSpec((D, VP), const2),
            pl.BlockSpec((1, 1, 3 * D), attn_idx),
            pl.BlockSpec((1, 1, D), attn_idx),
            pl.BlockSpec((1, 1, F), ffn_idx),
            pl.BlockSpec((1, 1, D), ffn_idx),
            pl.BlockSpec((1, VP), const2),
            pl.BlockSpec((VB, D), const2),
            pl.BlockSpec((1, 2), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((B, VP), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), out_idx),
            pl.BlockSpec((1, 1, N), out_idx),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((2, ABLK, N), cache_k.dtype),
            pltpu.VMEM((2, ABLK, N), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    logits, tok_out, logp_out, newk, newv = pl.pallas_call(
        functools.partial(
            _kernel, s_text=s_text, num_heads=num_heads, fused=fused,
            vocab=vocab, stochastic=stochastic, quant=quant,
            act_quant=act_quant, two_phase=two_phase,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, VP), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((NL, 1, N), cache_k.dtype),
            jax.ShapeDtypeStruct((NL, 1, N), cache_v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        x_len.astype(jnp.int32)[None],
        audio_pos.astype(jnp.int32)[None],
        tokens.astype(jnp.int32),
        seeds.astype(jnp.int32)[None],
        greedy.astype(jnp.int32)[None],
        x,
        lw["wqkv"], lw["bqkv"], lw["wout"], lw["bout"],
        lw["w1"], lw["b1"], lw["w2"], lw["b2"],
        lw["ln1s"], lw["ln1b"], lw["ln2s"], lw["ln2b"],
        lw["fns"], lw["fnb"], lw["wpred"],
        lw["sqkv"], lw["sout"], lw["s1"], lw["s2"], lw["spred"],
        lw["emb"],
        alpha_temp,
        cache_k, cache_v,
    )
    slot = s_text + audio_pos.astype(jnp.int32)
    ck = jax.lax.dynamic_update_slice(
        cache_k, newk.astype(cache_k.dtype), (0, slot, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cache_v, newv.astype(cache_v.dtype), (0, slot, 0)
    )
    return logits, tok_out, logp_out, ck, cv


@functools.partial(
    jax.jit,
    static_argnames=("s_text", "num_heads", "quant", "act_quant",
                     "two_phase"),
)
def decode_step(
    x: jnp.ndarray,  # [B, D] this step's input embedding (+PE)
    layer_weights,  # dict of stacked per-layer weights (pack_layer_weights)
    cache_k: jnp.ndarray,  # [NL, C, N]
    cache_v: jnp.ndarray,  # [NL, C, N]
    x_len: jnp.ndarray,
    audio_pos: jnp.ndarray,
    *,
    s_text: int,
    num_heads: int,
    quant: bool = False,
    act_quant: bool = False,
    two_phase: bool = True,
):
    """→ (logits [B, VP] fp32 (vocab lane-padded), cache_k', cache_v')."""
    B = x.shape[0]
    logits, _, _, ck, cv = _call_kernel(
        layer_weights, cache_k, cache_v, x,
        jnp.zeros((B,), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.ones((), jnp.int32),
        jnp.zeros((1, 2), jnp.float32),
        x_len, audio_pos,
        s_text=s_text, num_heads=num_heads, fused=False,
        vocab=layer_weights["wpred"].shape[-1], quant=quant,
        act_quant=act_quant, two_phase=two_phase,
    )
    return logits, ck, cv


@functools.partial(
    jax.jit,
    static_argnames=(
        "s_text", "num_heads", "vocab", "stochastic", "quant", "act_quant",
        "two_phase",
    ),
)
def decode_step_fused(
    tokens: jnp.ndarray,  # [B] this step's input tokens
    layer_weights,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    x_len: jnp.ndarray,
    audio_pos: jnp.ndarray,
    seed: jnp.ndarray,  # [] int32 — per-step PRNG seed
    greedy: jnp.ndarray,  # [] int32 (unused when stochastic=False)
    temperature: jnp.ndarray,  # [] f32
    pe_alpha: jnp.ndarray,  # [] f32 — audio PE alpha
    *,
    s_text: int,
    num_heads: int,
    vocab: int,
    stochastic: bool = False,
    quant: bool = False,
    act_quant: bool = False,
    two_phase: bool = True,
):
    """Fully fused decode step: token in → next token out.

    Embedding gather (one-hot matmul), sinusoidal PE row, all layers,
    final norm, prediction head and plain sampling (greedy / Gumbel
    categorical via the on-core PRNG) happen inside the kernel — the only
    XLA ops left per step are the two in-place cache column writes and the
    beam bookkeeping. → (next_tokens [B], logprobs [B], cache_k', cache_v').
    """
    B = tokens.shape[0]
    D = layer_weights["wqkv"].shape[1]
    alpha_temp = jnp.stack(
        [pe_alpha.astype(jnp.float32), temperature.astype(jnp.float32)]
    )[None]
    _, tok_out, logp_out, ck, cv = _call_kernel(
        layer_weights, cache_k, cache_v,
        jnp.zeros((B, D), cache_k.dtype),
        tokens, seed, greedy, alpha_temp,
        x_len, audio_pos,
        s_text=s_text, num_heads=num_heads, fused=True, vocab=vocab,
        stochastic=stochastic, quant=quant, act_quant=act_quant,
        two_phase=two_phase,
    )
    return tok_out[:, 0], logp_out[:, 0], ck, cv


VOCAB_PAD = 128  # pad the prediction vocab to a lane multiple


def pack_layer_weights(
    layers: dict, dtype=jnp.bfloat16, final_norm=None, predict_w=None,
    audio_embedding=None,
) -> dict:
    """Engine param stack → the megakernel's flat stacked-weight dict.

    final_norm: {'scale','bias'} of the stack's last LayerNorm;
    predict_w: [D, V] prediction head (V lane-padded with zeros; the engine
    masks logits beyond the true vocab);
    audio_embedding: [VB, D] token embedding table for the fused path (a
    1-row dummy when only the logits path is used).
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
        # unit scales (bf16 mode); quantize_weights() replaces them
        "sqkv": jnp.ones_like(vec(sa["in_proj_b"]), dtype=jnp.float32),
        "sout": jnp.ones_like(vec(sa["out_b"]), dtype=jnp.float32),
        "s1": jnp.ones_like(vec(layers["linear1"]["b"]), dtype=jnp.float32),
        "s2": jnp.ones_like(vec(layers["linear2"]["b"]), dtype=jnp.float32),
        "spred": jnp.ones(
            (1, _pad_vocab(predict_w).shape[-1]), jnp.float32
        ),
        "emb": (
            audio_embedding
            if audio_embedding is not None
            else jnp.zeros((8, layers["linear1"]["w"].shape[1]))
        ).astype(dtype),
    }


def _pad_vocab(w):
    D, V = w.shape
    VP = -(-V // VOCAB_PAD) * VOCAB_PAD
    if VP == V:
        return w
    return jnp.concatenate([w, jnp.zeros((D, VP - V), w.dtype)], axis=1)


def quantize_weights(lw: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of the streaming
    weights (W8A16). The matmul runs on bf16-cast int8 operands and the
    scale folds into the output, so serving pays half the HBM weight
    traffic for ~0.4% per-channel relative weight error. Opt-in
    (EngineConfig.quantize="int8"); audio-fidelity impact should be A/B
    checked once trained weights are available."""
    out = dict(lw)

    def q(name, scale_name):
        w = lw[name].astype(jnp.float32)  # [NL, in, out] or [in, out]
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per out column
        scale = jnp.maximum(amax, 1e-8) / 127.0
        out[name] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        if w.ndim == 3:
            out[scale_name] = jnp.transpose(scale, (0, 1, 2))  # [NL, 1, out]
        else:
            out[scale_name] = scale  # [1, out]

    q("wqkv", "sqkv")
    q("wout", "sout")
    q("w1", "s1")
    q("w2", "s2")
    q("wpred", "spred")
    return out
