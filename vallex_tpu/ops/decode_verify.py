"""Pallas verify megakernel for speculative AR decoding.

Per-token bf16 decoding is HBM-bound: every generated frame must re-stream
the full 302 MB of decoder weights, and the measured ceiling of the weight
stream is ~540 GB/s on this chip — a hard ~560 us/frame floor that leaves
the bf16 strict-parity mode just short of the RTF <= 0.05 target. This
kernel breaks the per-token bandwidth wall: it runs ONE bf16 forward pass
over K consecutive positions (the current token + K-1 draft tokens proposed
by the int8-weight block kernel), producing next-token logits at every
position and the bf16-exact KV columns. The engine accepts the longest
draft prefix whose bf16 argmax confirms it (greedy speculative decoding —
outputs are exactly what per-token bf16 greedy would produce), so the
weight stream is paid once per ~K frames instead of per frame.

Attention layout (B=1, all-heads lane packing: cache row = a position's
[D] = [H*hd] vector). Everything is built to avoid Mosaic-unsupported
reshapes/transposes:
  - scores for all K queries x H heads in ONE matmul per key block:
      S[c, k*G+h] = dot(kb[c, :], Qp[:, k*G+h])
    where Qp [N, K*G] is a lane-concat of q_k[:, None] * sel (sel = 0/1
    head selector [N, G]);
  - online-softmax state m/l lives as [1, K*G]; the weighted-value
    accumulator lives PACKED as accm [K*G, N] in VMEM scratch, updated as
      accm = accm * outer(alpha, 1) + p^T-contract-vb
    where outer() is a dot_general contracting the size-1 leading dim;
  - the final head compaction [K*G, N] -> [K, N] is one selector matmul:
      attn_num = dot(S2, accm * headmask),  S2[k, m] = (m // G == k),
      headmask[m, n] = (m % G == head(n)).
  - three key sources fold in sequence, exactly matching the per-token
    megakernel's numerics (ops/decode_step.py): HBM cache rows (bf16
    rounded), this pass's earlier columns j < k (rounded, from the scratch
    planes), and each query's OWN column j == k (unrounded f32).

Masking contract matches engine/ar.py: HBM cache row c valid iff c < x_len
(text) or s_text <= c < s_text + pos0 (audio from previous iterations).
Constraints: s_text <= ABLK, s_text % 128 == 0; the engine's caches carry
>= KP slack rows (KP = K rounded up to 8) for the aligned plane write-back.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import ABLK

ATTN, FFN = 0, 1


def _kernel(
    # scalar prefetch
    x_len_ref,  # [1]
    pos_ref,  # [1] audio position of fed token 0
    fed_ref,  # [K] tokens fed at positions pos0..pos0+K-1
    # inputs
    wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    fns_ref, fnb_ref, wpred_ref,
    emb_ref,  # [VB, D]
    alpha_ref,  # [1, 1] SMEM: pe alpha
    cache_k_hbm,  # [NL, C, N]
    cache_v_hbm,
    # outputs
    logits_ref,  # [K, VP] — next-token logits at every fed position
    newk_ref,  # [NL, KP, N] HBM
    newv_ref,  # [NL, KP, N] HBM
    # scratch
    h_acc,  # [K, D] f32
    kbuf,  # [2, ABLK, N]
    vbuf,
    sems,  # [2, 2]
    kblk,  # [NL, KP, N] cache dtype
    vblk,
    accm,  # [K*G, N] f32 — packed weighted-value accumulator
    out_sems,  # [2]
    *,
    s_text: int,
    num_heads: int,
):
    layer = pl.program_id(0)
    phase = pl.program_id(1)
    num_layers = pl.num_programs(0)
    K, D = h_acc.shape
    C, N = cache_k_hbm.shape[1], cache_k_hbm.shape[2]
    KP = kblk.shape[1]
    H = num_heads
    hd = D // H
    G = H  # B=1: one lane group per head
    KG = K * G
    x_len = x_len_ref[0]
    pos0 = pos_ref[0]
    scale = 1.0 / math.sqrt(hd)
    eps = 1e-5

    def ln(x, s, b):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * s + b

    def outer(row, n_cols):
        """[1, M] -> [M, n_cols] replication via a size-1 contraction."""
        ones = jnp.ones((1, n_cols), jnp.float32)
        return jax.lax.dot_general(
            row, ones, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _attention():
        @pl.when(layer == 0)
        def _():
            VB = emb_ref.shape[0]
            vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (K, VB), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, VB), 0)
            tok_col = jnp.zeros((K, VB), jnp.int32)
            for i in range(K):
                tok_col = jnp.where(row_ids == i, fed_ref[i], tok_col)
            onehot = (vocab_ids == tok_col).astype(emb_ref.dtype)
            emb = jax.lax.dot(
                onehot, emb_ref[...], preferred_element_type=jnp.float32
            )  # [K, D]
            lane = jax.lax.broadcasted_iota(jnp.int32, (K, D), 1)
            krow = jax.lax.broadcasted_iota(jnp.int32, (K, D), 0)
            freq = jnp.exp(
                (lane // 2 * 2).astype(jnp.float32)
                * (-math.log(10000.0) / D)
            )
            ang = (pos0 + krow).astype(jnp.float32) * freq
            pe = jnp.where(lane % 2 == 0, jnp.sin(ang), jnp.cos(ang))
            h_acc[...] = emb + alpha_ref[0, 0] * pe

        h = h_acc[...]
        h1 = ln(
            h,
            ln1s_ref[0, 0].astype(jnp.float32),
            ln1b_ref[0, 0].astype(jnp.float32),
        )
        qkv = jax.lax.dot(
            h1.astype(wqkv_ref.dtype), wqkv_ref[0],
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, 0].astype(jnp.float32)  # [K, 3D]
        q = qkv[:, :D]
        k_new = qkv[:, D : 2 * D]
        v_new = qkv[:, 2 * D :]
        if KP > K:
            zpad = jnp.zeros((KP - K, N), kblk.dtype)
            kblk[layer] = jnp.concatenate(
                [k_new.astype(kblk.dtype), zpad], axis=0
            )
            vblk[layer] = jnp.concatenate(
                [v_new.astype(vblk.dtype), zpad], axis=0
            )
        else:
            kblk[layer] = k_new.astype(kblk.dtype)
            vblk[layer] = v_new.astype(vblk.dtype)

        lane_group = jax.lax.broadcasted_iota(jnp.int32, (N, G), 0) // hd
        group_id = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
        sel = (lane_group == group_id).astype(jnp.float32)  # [N, G]
        # Qp [N, K*G]: column k*G+h = q_k on head-h lanes
        Qp = jnp.concatenate(
            [q[i][:, None] * sel for i in range(K)], axis=1
        )
        # headmask [K*G, N]: m % G == head(n); S2 [K, K*G]: m // G == k
        hm_m = jax.lax.broadcasted_iota(jnp.int32, (KG, N), 0) % G
        hm_n = jax.lax.broadcasted_iota(jnp.int32, (KG, N), 1) // hd
        headmask = (hm_m == hm_n).astype(jnp.float32)
        s2_k = jax.lax.broadcasted_iota(jnp.int32, (K, KG), 0)
        s2_m = jax.lax.broadcasted_iota(jnp.int32, (K, KG), 1) // G
        S2 = (s2_k == s2_m).astype(jnp.float32)

        accm[...] = jnp.zeros((KG, N), jnp.float32)

        def fold(s_raw, vb, ok, m_i, l_i):
            """Fold one key block into the packed softmax state."""
            s = jnp.where(ok, s_raw * scale, -1e30)
            m_new = jnp.maximum(m_i, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_i - m_new)  # [1, K*G]
            p = jnp.exp(s - m_new)  # [R, K*G]
            l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)
            M = jax.lax.dot_general(
                p, vb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [K*G, N]
            accm[...] = accm[...] * outer(alpha, N) + M
            return m_new, l_new

        n_audio = pos0 // ABLK + 1
        total = 1 + n_audio

        def text_dma(s):
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(0, s_text), :],
                    kbuf.at[s, pl.ds(0, s_text), :], sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(0, s_text), :],
                    vbuf.at[s, pl.ds(0, s_text), :], sems.at[s, 1],
                ),
            )

        def audio_dma(i, s):
            start = s_text + pl.multiple_of((i - 1) * ABLK, ABLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    kbuf.at[s], sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vbuf.at[s], sems.at[s, 1],
                ),
            )

        def start_dma(i, s):
            @pl.when(i == 0)
            def _():
                a, b = text_dma(s)
                a.start()
                b.start()

            @pl.when(i != 0)
            def _():
                a, b = audio_dma(i, s)
                a.start()
                b.start()

        def wait_dma(i, s):
            @pl.when(i == 0)
            def _():
                a, b = text_dma(s)
                a.wait()
                b.wait()

            @pl.when(i != 0)
            def _():
                a, b = audio_dma(i, s)
                a.wait()
                b.wait()

        start_dma(0, 0)

        def body(i, carry):
            m_i, l_i = carry
            s = jax.lax.rem(i, 2)

            @pl.when(i + 1 < total)
            def _():
                start_dma(i + 1, jax.lax.rem(i + 1, 2))

            wait_dma(i, s)
            base = jnp.where(i == 0, 0, s_text + (i - 1) * ABLK)
            rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (ABLK, 1), 0
            )
            is_text = i == 0
            ok = jnp.logical_or(
                jnp.logical_and(
                    is_text, jnp.logical_and(rows < x_len, rows < s_text)
                ),
                jnp.logical_and(
                    jnp.logical_not(is_text),
                    jnp.logical_and(rows >= s_text, rows < s_text + pos0),
                ),
            )  # [ABLK, 1]
            kb = jnp.where(ok, kbuf[s].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[s].astype(jnp.float32), 0.0)
            s_raw = jax.lax.dot(
                kb, Qp, preferred_element_type=jnp.float32
            )  # [ABLK, K*G]
            okb = jnp.broadcast_to(ok, (ABLK, KG))
            return fold(s_raw, vb, okb, m_i, l_i)

        m0 = jnp.full((1, KG), -1e30, jnp.float32)
        l0 = jnp.zeros((1, KG), jnp.float32)
        m_i, l_i = jax.lax.fori_loop(0, total, body, (m0, l0))

        # earlier columns of THIS pass, j < k (cache-dtype rounded — what
        # the per-token path reads back from HBM)
        kfl = kblk[layer].astype(jnp.float32)  # [KP, N] (pad rows zero)
        vfl = vblk[layer].astype(jnp.float32)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (KP, KG), 0)
        qcol = jax.lax.broadcasted_iota(jnp.int32, (KP, KG), 1) // G
        ok_if = jrow < qcol
        s_if = jax.lax.dot(kfl, Qp, preferred_element_type=jnp.float32)
        m_i, l_i = fold(s_if, vfl, ok_if, m_i, l_i)

        # own column j == k, unrounded f32 (as ops/decode_step.py folds it)
        jrow_o = jax.lax.broadcasted_iota(jnp.int32, (K, KG), 0)
        qcol_o = jax.lax.broadcasted_iota(jnp.int32, (K, KG), 1) // G
        ok_own = jrow_o == qcol_o
        s_own = jax.lax.dot(
            k_new, Qp, preferred_element_type=jnp.float32
        )  # [K, K*G]
        m_i, l_i = fold(s_own, v_new, ok_own, m_i, l_i)

        num = jax.lax.dot(
            S2, accm[...] * headmask, preferred_element_type=jnp.float32
        )  # [K, N]
        den = jax.lax.dot(
            S2, outer(l_i, N) * headmask,
            preferred_element_type=jnp.float32,
        )
        attn = num / den  # [K, N] == [K, D]

        out_proj = jax.lax.dot(
            attn.astype(wout_ref.dtype), wout_ref[0],
            preferred_element_type=jnp.float32,
        )
        h_acc[...] = h + out_proj + bout_ref[0, 0].astype(jnp.float32)

    def _ffn():
        h = h_acc[...]
        h2 = ln(
            h,
            ln2s_ref[0, 0].astype(jnp.float32),
            ln2b_ref[0, 0].astype(jnp.float32),
        )
        f = jax.lax.dot(
            h2.astype(w1_ref.dtype), w1_ref[0],
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, 0].astype(jnp.float32)
        f = jnp.maximum(f, 0.0)
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
            logits = jax.lax.dot(
                hf.astype(wpred_ref.dtype), wpred_ref[...],
                preferred_element_type=jnp.float32,
            )
            logits_ref[...] = logits.astype(logits_ref.dtype)
            for li in range(kblk.shape[0]):
                ck = pltpu.make_async_copy(
                    kblk.at[li], newk_ref.at[li], out_sems.at[0]
                )
                cv = pltpu.make_async_copy(
                    vblk.at[li], newv_ref.at[li], out_sems.at[1]
                )
                ck.start()
                cv.start()
                ck.wait()
                cv.wait()

    pl.when(phase == ATTN)(_attention)
    pl.when(phase == FFN)(_ffn)


@functools.partial(
    jax.jit, static_argnames=("steps", "s_text", "num_heads")
)
def decode_verify(
    fed: jnp.ndarray,  # [K] tokens at positions pos0..pos0+K-1
    layer_weights,  # pack_layer_weights dict (bf16 — NOT quantized)
    cache_k: jnp.ndarray,  # [NL, C, N] with >= KP slack rows
    cache_v: jnp.ndarray,
    x_len: jnp.ndarray,
    audio_pos: jnp.ndarray,  # [] position of fed[0]
    pe_alpha: jnp.ndarray,
    *,
    steps: int,
    s_text: int,
    num_heads: int,
):
    """One bf16 forward over K positions → (logits [K, VP], cache_k',
    cache_v') with the K bf16-exact KV columns written at audio_pos."""
    lw = layer_weights
    NL, C, N = cache_k.shape
    D = lw["wqkv"].shape[1]
    F = lw["w1"].shape[-1]
    VP = lw["wpred"].shape[-1]
    VB = lw["emb"].shape[0]
    K = steps
    KP = -(-K // 8) * 8
    # see ops/decode_block.py on the slack/bounds invariants
    assert s_text <= ABLK and s_text % 128 == 0
    assert C - s_text >= ABLK + KP, (C, K, s_text)
    assert N == D, "verify kernel is single-beam (B=1) only"

    attn_idx = lambda l, p, *_: (l, 0, 0)  # noqa: E731
    ffn_idx = lambda l, p, *_: (jnp.maximum(l - 1 + p, 0), 0, 0)  # noqa: E731
    const2 = lambda l, p, *_: (0, 0)  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NL, 2),
        in_specs=[
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
            pl.BlockSpec((VB, D), const2),
            pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((K, VP), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, D), jnp.float32),
            pltpu.VMEM((2, ABLK, N), cache_k.dtype),
            pltpu.VMEM((2, ABLK, N), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((NL, KP, N), cache_k.dtype),
            pltpu.VMEM((NL, KP, N), cache_v.dtype),
            pltpu.VMEM((K * num_heads, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    logits, newk, newv = pl.pallas_call(
        functools.partial(
            _kernel, s_text=s_text, num_heads=num_heads
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, VP), jnp.float32),
            jax.ShapeDtypeStruct((NL, KP, N), cache_k.dtype),
            jax.ShapeDtypeStruct((NL, KP, N), cache_v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        x_len.astype(jnp.int32)[None],
        audio_pos.astype(jnp.int32)[None],
        fed.astype(jnp.int32),
        lw["wqkv"], lw["bqkv"], lw["wout"], lw["bout"],
        lw["w1"], lw["b1"], lw["w2"], lw["b2"],
        lw["ln1s"], lw["ln1b"], lw["ln2s"], lw["ln2b"],
        lw["fns"], lw["fnb"], lw["wpred"], lw["emb"],
        pe_alpha.astype(jnp.float32).reshape(1, 1),
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
