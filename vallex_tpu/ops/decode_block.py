"""Pallas block megakernel: K AR decode steps in ONE pallas_call.

The single-step fused megakernel (ops/decode_step.py) left ~0.1 ms/step of
XLA glue outside the kernel: the while_loop carry bookkeeping (EOS forcing,
logprob accumulation), the y-buffer token write, the two cache-column
dynamic_update_slices, and the per-iteration while_loop/dispatch overhead —
~10 small fused kernels per generated frame. This kernel amortizes ALL of it
by a factor of K:

  grid = (K, num_layers, 2)   phase 0 = attention, phase 1 = FFN

Each k iteration is one full decode step: embedding gather + PE row, all
layers (two-phase weight streaming exactly as the single-step kernel), final
norm, prediction head, sampling, and the reference's beam bookkeeping
(EOS forcing / logprob masking / length-cap gating — models/vallex.py:572-577)
as scalar SMEM state. The K new K/V columns of every layer live in a VMEM
scratch block and are folded into each step's online softmax (the k-th step
sees in-block columns j <= k); they are written back to the HBM caches as one
[NL, K, N] output per call, so the XLA-side cache write happens once per K
frames instead of once per frame.

Numerics match the single-step fused path: same f32 accumulation, same
per-step PRNG seeds (seed0 + k), same sampling; the only difference is the
online-softmax fold order of the last <K positions (last-ulp f32).

Masking contract (engine/ar.py layout): HBM cache row c is valid iff
c < x_len (text) or s_text <= c < s_text + pos0 (audio generated in previous
blocks); audio positions pos0..pos0+k-1 come from the in-block scratch.
Constraints: s_text <= ABLK, s_text % 128 == 0, (C - K - s_text) % ABLK == 0
(the caches carry K slack rows so the final block never writes out of
bounds).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import ABLK
from .sampling import filtered_keep_mask

ATTN, FFN = 0, 1


def _kernel(
    # scalar prefetch
    x_len_ref,  # [B] valid text length per lane group (beams: broadcast)
    pos_ref,  # [1] audio position of the block's first step (batched: the
    #           number of generated frames before this block)
    tok_ref,  # [B] token to feed at step 0
    seed_ref,  # [1] PRNG seed of step 0 (step k uses seed0 + k)
    done_ref,  # [B] i32 beam-done flags entering the block
    remaining_ref,  # [B] max_gen - step0 per lane group: step k >=
    #                 remaining[i] is length-capped (beams: broadcast)
    plen_ref,  # [B] prompt_len per lane group (beams: broadcast; audio
    #            rows [0, prompt_len] are the shared prefix in the B>1
    #            beams schedule, per-request mask bounds in batched mode)
    # inputs
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
    fns_ref,  # [1, D]
    fnb_ref,  # [1, D]
    wpred_ref,  # [D, VP]
    sqkv_ref,  # [1, 1, 3D] int8 scales (quant mode; ones otherwise)
    sout_ref,  # [1, 1, D]
    s1_ref,  # [1, 1, F]
    s2_ref,  # [1, 1, D]
    spred_ref,  # [1, VP]
    emb_ref,  # [VB, D]
    kscale_ref,  # [1, 1, N] per-(layer, head) int8 KV scales (kv_quant;
    #              lane n carries scale[layer, head(n)]; ones otherwise)
    vscale_ref,  # [1, 1, N]
    alpha_temp_ref,  # [1, 4] SMEM: (pe alpha, temperature, top_k, top_p)
    logp0_ref,  # [1, B] SMEM f32: logprob of tok0
    sumlp0_ref,  # [1, B] SMEM f32: accumulated logprobs entering the block
    cache_k_hbm,  # [NL, C, N] (C includes K slack rows; grouped mode:
    #               generated rows ONLY, row t = generated frame t)
    cache_v_hbm,  # [NL, C, N]
    prefix_k_hbm,  # [NL, s_text + p_audio, (B//beams)*D] grouped-mode
    #                shared prefix (text+BOS+prompt K per REQUEST, no beam
    #                copies); token-sized dummy otherwise
    prefix_v_hbm,
    # outputs
    logits_ref,  # [B, VP] — last step's logits (debug/inspection)
    ytok_ref,  # [K, B] SMEM (full array): the token FED at step k
    tok_out_ref,  # [B, 1] SMEM — token to feed to the next block
    logp_out_ref,  # [B, 1] SMEM f32
    done_out_ref,  # [B, 1] SMEM i32 — done flags after the block
    sum_out_ref,  # [B, 1] SMEM f32 — accumulated logprobs after the block
    newk_ref,  # [NL, K, N] HBM — written by DMA at the final grid step
    newv_ref,  # [NL, K, N] HBM
    slog_ref,  # [1, B, VP] block (k_step-indexed): EVERY step's logits —
    #            feeds the draft side of speculative sampling
    # scratch
    h_acc,  # [B, D] f32
    kbuf,  # [2, ABLK, N]
    vbuf,  # [2, ABLK, N]
    sems,  # DMA sems [2, 2]
    kblk,  # [NL, K, N] cache-dtype — this block's K columns per layer
    vblk,  # [NL, K, N] cache-dtype (same rounding as the HBM cache, so
    #        the fold matches what the single-step path reads back)
    out_sems,  # DMA sems [2] for the final write-back
    cur_tok,  # SMEM [B] i32 — next token to feed
    cur_logp,  # SMEM [B] f32
    done_s,  # SMEM [B] i32
    sum_s,  # SMEM [B] f32
    ksh,  # [2, ABLK, D] cache-dtype — shared-prefix planes (B>1; dummy B=1)
    vsh,
    sems_sh,  # DMA sems [2, 2] for the shared-prefix copies
    *,
    s_text: int,
    num_heads: int,
    vocab: int,
    eos: int,
    stochastic: bool,
    quant: bool,
    act_quant: bool,
    batched: bool,
    p_audio: int,
    kv_quant: bool,
    filtered: bool,
    grouped: bool,
    beams: int,
):
    k_step = pl.program_id(0)
    layer = pl.program_id(1)
    phase = pl.program_id(2)
    num_layers = pl.num_programs(1)
    K = pl.num_programs(0)
    B = h_acc.shape[0]
    D = h_acc.shape[1]
    C, N = cache_k_hbm.shape[1], cache_k_hbm.shape[2]
    hd = D // num_heads
    x_len = x_len_ref[0]
    pos0 = pos_ref[0]
    pos = pos0 + k_step
    scale = 1.0 / math.sqrt(hd)
    eps = 1e-5

    def ln(x, s, b):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * s + b

    def qmat(x, w_blk, srow):
        ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sx = jnp.maximum(ax, 1e-6) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot(xq, w_blk, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sx * srow)

    def mat(x, w_ref, s_ref):
        if quant and act_quant:
            return qmat(x, w_ref[0], s_ref[0, 0])
        if quant:
            return jax.lax.dot(
                x.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * s_ref[0, 0]
        return jax.lax.dot(
            x.astype(w_ref.dtype), w_ref[0],
            preferred_element_type=jnp.float32,
        )

    # ---------------- phase 0: attention -----------------------------------
    def _attention():
        @pl.when(jnp.logical_and(k_step == 0, layer == 0))
        def _():
            for i in range(B):
                cur_tok[i] = tok_ref[i]
                cur_logp[i] = logp0_ref[0, i]
                done_s[i] = done_ref[i]
                sum_s[i] = sumlp0_ref[0, i]

        @pl.when(layer == 0)
        def _():
            # --- feed bookkeeping (reference models/vallex.py:572-577) ---
            # done beams keep emitting EOS; logprob accumulates only while
            # alive; steps past the length cap are forced done.
            fed_vals = []
            for i in range(B):
                capped = (k_step >= remaining_ref[i]).astype(jnp.int32)
                d0 = jnp.bitwise_or(done_s[i], capped)
                fed = jnp.where(d0 == 1, eos, cur_tok[i])
                sum_s[i] = sum_s[i] + jnp.where(d0 == 1, 0.0, cur_logp[i])
                done_s[i] = jnp.bitwise_or(
                    d0, (fed == eos).astype(jnp.int32)
                )
                ytok_ref[k_step, i] = fed
                fed_vals.append(fed)

            # h0 = emb[fed] + alpha·PE[pos]
            VB = emb_ref.shape[0]
            vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, VB), 1)
            beam_ids = jax.lax.broadcasted_iota(jnp.int32, (B, VB), 0)
            tok_col = jnp.zeros((B, VB), jnp.int32)
            for i in range(B):
                tok_col = jnp.where(beam_ids == i, fed_vals[i], tok_col)
            onehot = (vocab_ids == tok_col).astype(emb_ref.dtype)
            emb = jax.lax.dot(
                onehot, emb_ref[...], preferred_element_type=jnp.float32
            )
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
            freq = jnp.exp(
                (lane // 2 * 2).astype(jnp.float32)
                * (-math.log(10000.0) / D)
            )
            if batched:
                # per-request audio position: plen_r + 1 + t0 + k_step
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, D), 0)
                pos_col = jnp.zeros((B, D), jnp.int32)
                for i in range(B):
                    pos_col = jnp.where(
                        row_ids == i, plen_ref[i] + 1 + pos, pos_col
                    )
                ang = pos_col.astype(jnp.float32) * freq
            else:
                ang = pos.astype(jnp.float32) * freq
            pe_row = jnp.where(lane % 2 == 0, jnp.sin(ang), jnp.cos(ang))
            alpha = alpha_temp_ref[0, 0]
            h_acc[...] = emb + alpha * pe_row

        h = h_acc[...]
        h1 = ln(
            h,
            ln1s_ref[0, 0].astype(jnp.float32),
            ln1b_ref[0, 0].astype(jnp.float32),
        )
        qkv = mat(h1, wqkv_ref, sqkv_ref) + bqkv_ref[0, 0].astype(
            jnp.float32
        )
        k_new = qkv[:, D : 2 * D].reshape(1, N)
        v_new = qkv[:, 2 * D :].reshape(1, N)
        if kv_quant:
            # static per-(layer, head) scales: fold the k-scale into q and
            # the v-scale into the final attention output, so the cache
            # (and all folds) work in int8 quantization units for free
            ksc_N = kscale_ref[0].astype(jnp.float32)  # [1, N]
            vsc_N = vscale_ref[0].astype(jnp.float32)
            k_store = jnp.clip(jnp.round(k_new / ksc_N), -127.0, 127.0)
            v_store = jnp.clip(jnp.round(v_new / vsc_N), -127.0, 127.0)
            q_cache = qkv[:, :D] * kscale_ref[0, 0:1, 0:D].astype(
                jnp.float32
            )
            own_k = k_new / ksc_N
            own_v = v_new / vsc_N
        else:
            k_store, v_store = k_new, v_new
            q_cache = qkv[:, :D]
            own_k, own_v = k_new, v_new
        # store this step's column into row k_step of the layer's scratch
        # plane via a masked full-plane write (Mosaic cannot vector-store at
        # a dynamic sublane index). Planes carry KP >= K rows (KP a multiple
        # of 8) so the final write-back DMA is sublane-aligned; rows >= K
        # are never marked valid.
        KP = kblk.shape[1]
        rowsel = (
            jax.lax.broadcasted_iota(jnp.int32, (KP, N), 0) == k_step
        )
        kblk[layer] = jnp.where(
            rowsel,
            jnp.broadcast_to(k_store.astype(kblk.dtype), (KP, N)),
            kblk[layer],
        )
        vblk[layer] = jnp.where(
            rowsel,
            jnp.broadcast_to(v_store.astype(vblk.dtype), (KP, N)),
            vblk[layer],
        )

        # Per-beam head selector [D, H]. Scores/projections are computed
        # per beam on static 128-aligned lane slices kb[:, b*D:(b+1)*D]:
        # a single [N, G] selector matmul over the beam-packed lanes is
        # block-diagonal, so it wastes (1 - 1/B^2) of its MXU FLOPs on
        # structural zeros — at B=5 that's 25x the needed work.
        Hh = num_heads
        lane_group = jax.lax.broadcasted_iota(jnp.int32, (D, Hh), 0) // hd
        group_id = jax.lax.broadcasted_iota(jnp.int32, (D, Hh), 1)
        sel = (lane_group == group_id).astype(jnp.float32)

        # Quantized B>1 modes run the score/spread matmuls with bf16
        # operands (f32 accumulation): multi-beam/batched attention is
        # MXU-bound and the ~1e-3 score rounding is immaterial on top of
        # int8 weights. quantize="none" keeps full f32 everywhere, so the
        # bf16 strict mode and the batched-equals-single guarantee hold
        # exactly there. decode_step.py applies the same casts so the two
        # kernels stay in lockstep.
        score16 = B > 1 and quant
        sel_s = sel.astype(jnp.bfloat16) if score16 else sel
        selT_s = sel.T.astype(jnp.bfloat16) if score16 else sel.T

        def fold(kb, vb, ok, state, shared=False):
            """Fold one sanitized key/value plane into the PACKED
            online-softmax state (m [1, B·H], l [1, B·H], acc [1, B·D]).
            ok: [R, 1] bool. shared=True: kb/vb are [R, D] prefix rows
            IDENTICAL across beams (text / acoustic prompt) — every beam
            scores the same plane; shared=False: kb/vb are beam-lane-packed
            [R, N]. The state lives packed (three arrays, not 3·B) so the
            HBM-fold fori_loops carry O(1) vector values regardless of B —
            per-beam tuples spilled Mosaic's register allocator at B=16."""
            m_all, l_all, acc_all = state
            out_m, out_l, out_acc = [], [], []
            for b in range(B):
                m_b = m_all[:, b * Hh : (b + 1) * Hh]
                l_b = l_all[:, b * Hh : (b + 1) * Hh]
                acc_b = acc_all[:, b * D : (b + 1) * D]
                if shared:
                    kb_b, vb_b = kb, vb
                else:
                    kb_b = kb[:, b * D : (b + 1) * D]
                    vb_b = vb[:, b * D : (b + 1) * D]
                q_b = q_cache[b : b + 1]  # [1, D] f32
                kq = kb_b * q_b
                s = jax.lax.dot(
                    kq.astype(jnp.bfloat16) if score16 else kq, sel_s,
                    preferred_element_type=jnp.float32,
                ) * scale  # [R, H]
                s = jnp.where(ok, s, -1e30)
                m_new = jnp.maximum(m_b, jnp.max(s, axis=0, keepdims=True))
                alpha = jnp.exp(m_b - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_b * alpha + jnp.sum(p, axis=0, keepdims=True)
                p_lanes = jax.lax.dot(
                    p.astype(jnp.bfloat16) if score16 else p, selT_s,
                    preferred_element_type=jnp.float32,
                )
                alpha_lanes = jax.lax.dot(
                    alpha, sel.T, preferred_element_type=jnp.float32
                )
                acc_new = acc_b * alpha_lanes + jnp.sum(
                    p_lanes * vb_b, axis=0, keepdims=True
                )
                out_m.append(m_new)
                out_l.append(l_new)
                out_acc.append(acc_new)
            return (
                jnp.concatenate(out_m, axis=1),
                jnp.concatenate(out_l, axis=1),
                jnp.concatenate(out_acc, axis=1),
            )

        if B > 1:
            # Wide-matmul fold for beam-lane-packed planes: one
            # [R, N]x[N, G] score matmul + one [R, G]x[G, N] spread beat B
            # narrow per-beam matmuls on the MXU (measured — the narrow
            # ones run at 16/128 output-lane utilization), so full-lane
            # blocks use the packed-selector formulation and only repack
            # the m/l/acc state per beam.
            G = N // hd
            lgN = jax.lax.broadcasted_iota(jnp.int32, (N, G), 0) // hd
            gidN = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
            selN = (lgN == gidN).astype(jnp.float32)
            qf = q_cache.reshape(1, N)

            selN_s = selN.astype(jnp.bfloat16) if score16 else selN
            selNT_s = (
                selN.T.astype(jnp.bfloat16) if score16 else selN.T
            )

            def cast_s(x):
                return x.astype(jnp.bfloat16) if score16 else x

            # The selector matmuls are block-diagonal: group g's score
            # lanes only read its own D input lanes, so one full-width
            # [R, N]x[N, G] matmul wastes a factor B of its MXU FLOPs on
            # structural zeros. Chunk groups so each matmul emits one full
            # 128-lane MXU output tile (GC = 128 // num_heads groups):
            # waste is capped at GC regardless of B. Below GC groups the
            # single wide matmul stands (measured best at B <= 8; at B=16
            # unchunked wide cost scales linearly and loses ~2x).
            GC = max(1, 128 // Hh)
            g_chunks = (
                [(c * GC, min(GC, B - c * GC))
                 for c in range(-(-B // GC))]
                if B > GC else [(0, B)]
            )

            def _score_chunks(kbq):
                if len(g_chunks) == 1:
                    return jax.lax.dot(
                        kbq, selN_s, preferred_element_type=jnp.float32
                    )
                return jnp.concatenate([
                    jax.lax.dot(
                        kbq[:, g0 * D : (g0 + gc) * D],
                        selN_s[g0 * D : (g0 + gc) * D,
                               g0 * Hh : (g0 + gc) * Hh],
                        preferred_element_type=jnp.float32,
                    )
                    for g0, gc in g_chunks
                ], axis=1)

            def _spread_chunks(p):
                if len(g_chunks) == 1:
                    return jax.lax.dot(
                        cast_s(p), selNT_s,
                        preferred_element_type=jnp.float32,
                    )
                return jnp.concatenate([
                    jax.lax.dot(
                        cast_s(p[:, g0 * Hh : (g0 + gc) * Hh]),
                        selNT_s[g0 * Hh : (g0 + gc) * Hh,
                                g0 * D : (g0 + gc) * D],
                        preferred_element_type=jnp.float32,
                    )
                    for g0, gc in g_chunks
                ], axis=1)

            def fold_wide(kb, vb, ok, state):
                # fully packed: NO per-beam slicing or repacking — the
                # state stays (m [1,G], l [1,G], acc [1,N]) end to end, so
                # the op count is B-independent and the fori_loop carry is
                # three vectors (B-tuples spilled registers at 16 groups)
                m_olds, l_olds, acc_olds = state
                s_all = _score_chunks(cast_s(kb * qf)) * scale  # [R, G]
                s_all = jnp.where(ok, s_all, -1e30)
                s_max = jnp.max(s_all, axis=0, keepdims=True)  # [1, G]
                m_new = jnp.maximum(m_olds, s_max)
                alpha = jnp.exp(m_olds - m_new)  # [1, G]
                p = jnp.exp(s_all - m_new)  # [R, G]
                l_sum = jnp.sum(p, axis=0, keepdims=True)
                p_lanes = _spread_chunks(p)  # [R, N]
                alpha_lanes = jax.lax.dot(
                    alpha, selN.T, preferred_element_type=jnp.float32
                )  # [1, N]
                pv = jnp.sum(p_lanes * vb, axis=0, keepdims=True)  # [1, N]
                return (
                    m_new,
                    l_olds * alpha + l_sum,
                    acc_olds * alpha_lanes + pv,
                )
        else:
            fold_wide = fold

        state0 = (
            jnp.full((1, B * Hh), -1e30, jnp.float32),
            jnp.zeros((1, B * Hh), jnp.float32),
            jnp.zeros((1, B * D), jnp.float32),
        )

        def fold_grouped(kb, vb, ok_g, state):
            """Grouped-prefix fold: kb/vb are [rows, R_req*D] planes with
            request r's shared prefix in lanes [r*D, (r+1)*D); ok_g is
            [rows, R_req] per-request row validity. Each (request, beam)
            folds its request's NARROW plane against its own query — the
            same math as fold(shared=True), so no VMEM lane-broadcast is
            ever materialized (a widened [rows, N] copy costs ~1 GB/frame
            of on-chip traffic at best_of=5, measured slower than the HBM
            re-reads it replaced). Zero-padded contractions are exact in
            f32, so tokens stay bitwise equal to the ungrouped fold."""
            m_all, l_all, acc_all = state
            out_m, out_l, out_acc = [], [], []
            for g in range(B):
                r = g // beams
                kb_r = kb[:, r * D : (r + 1) * D]
                vb_r = vb[:, r * D : (r + 1) * D]
                ok_r = ok_g[:, r : r + 1]
                m_b = m_all[:, g * Hh : (g + 1) * Hh]
                l_b = l_all[:, g * Hh : (g + 1) * Hh]
                acc_b = acc_all[:, g * D : (g + 1) * D]
                q_b = q_cache[g : g + 1]  # [1, D] f32
                kq = kb_r * q_b
                s = jax.lax.dot(
                    kq.astype(jnp.bfloat16) if score16 else kq, sel_s,
                    preferred_element_type=jnp.float32,
                ) * scale  # [rows, H]
                s = jnp.where(ok_r, s, -1e30)
                m_new = jnp.maximum(
                    m_b, jnp.max(s, axis=0, keepdims=True)
                )
                alpha = jnp.exp(m_b - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_b * alpha + jnp.sum(p, axis=0, keepdims=True)
                p_lanes = jax.lax.dot(
                    p.astype(jnp.bfloat16) if score16 else p, selT_s,
                    preferred_element_type=jnp.float32,
                )
                alpha_lanes = jax.lax.dot(
                    alpha, sel.T, preferred_element_type=jnp.float32
                )
                acc_new = acc_b * alpha_lanes + jnp.sum(
                    p_lanes * vb_r, axis=0, keepdims=True
                )
                out_m.append(m_new)
                out_l.append(l_new)
                out_acc.append(acc_new)
            return (
                jnp.concatenate(out_m, axis=1),
                jnp.concatenate(out_l, axis=1),
                jnp.concatenate(out_acc, axis=1),
            )

        if B == 1:
            state = _hbm_fold_single(fold, state0)
        elif batched and grouped:
            state = _hbm_fold_batched_grouped(
                fold_wide, fold_grouped, state0
            )
        elif batched:
            state = _hbm_fold_batched(fold_wide, state0)
        else:
            state = _hbm_fold_beams(fold, fold_wide, state0)

        # fold this block's PREVIOUS columns j < k_step (cache-dtype rounded,
        # exactly what the single-step path would read back from HBM) ...
        jrow = jax.lax.broadcasted_iota(jnp.int32, (KP, 1), 0)
        okb = jrow < k_step
        kbl = jnp.where(okb, kblk[layer].astype(jnp.float32), 0.0)
        vbl = jnp.where(okb, vblk[layer].astype(jnp.float32), 0.0)
        state = fold_wide(kbl, vbl, okb, state)

        # ... then this step's own k/v in unrounded f32 (as single-step
        # does; kv_quant: divided into cache units, rescaled at the end)
        ok_own = jnp.ones((1, 1), bool)
        state = fold_wide(own_k, own_v, ok_own, state)

        _, l_all, acc_all = state
        attn = jnp.concatenate(
            [
                acc_all[:, b * D : (b + 1) * D] / jax.lax.dot(
                    l_all[:, b * Hh : (b + 1) * Hh], sel.T,
                    preferred_element_type=jnp.float32,
                )
                for b in range(B)
            ],
            axis=0,
        )  # [B, D]
        if kv_quant:
            attn = attn * vscale_ref[0, 0:1, 0:D].astype(jnp.float32)

        out_proj = mat(attn, wout_ref, sout_ref)
        h_acc[...] = h + out_proj + bout_ref[0, 0].astype(jnp.float32)

    def _hbm_fold_single(fold, state0):
        """B=1 HBM cache fold: full-lane [ABLK, N] double-buffered blocks
        (one static text block + pos0//ABLK+1 audio blocks)."""
        n_audio = pos0 // ABLK + 1
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

        def body(i, state):
            buf_slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < total)
            def _():
                start_dma(i + 1, jax.lax.rem(i + 1, 2))

            wait_dma(i, buf_slot)
            base = jnp.where(i == 0, 0, s_text + (i - 1) * ABLK)
            rows = base + jax.lax.broadcasted_iota(jnp.int32, (ABLK, 1), 0)
            is_text = i == 0
            # audio rows generated by PREVIOUS blocks only (< s_text+pos0);
            # this block's columns come from the VMEM scratch fold below
            ok = jnp.logical_or(
                jnp.logical_and(
                    is_text, jnp.logical_and(rows < x_len, rows < s_text)
                ),
                jnp.logical_and(
                    jnp.logical_not(is_text),
                    jnp.logical_and(rows >= s_text, rows < s_text + pos0),
                ),
            )
            kb = jnp.where(ok, kbuf[buf_slot].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[buf_slot].astype(jnp.float32), 0.0)
            return fold(kb, vb, ok, state)

        return jax.lax.fori_loop(0, total, body, state0)

    def _hbm_fold_beams(fold, fold_wide, state0):
        """B>1 HBM cache fold with prefix deduplication. The text and
        acoustic-prompt rows are IDENTICAL across beams (prefill broadcasts
        one prefix; generated rows start at audio position prompt_len+1), so
        reading their full beam-lane-packed planes would stream the same
        bytes B times. Schedule:

          vblock 0              text rows [0, s_text), beam-0 lanes only
          vblocks 1..n_sh       128-row prompt sub-blocks, beam-0 lanes
          then nfull            ABLK-row full-lane generated blocks
          then ntail            128-row full-lane tail sub-blocks (the
                                last <ABLK rows — avoids DMAing up to 511
                                masked garbage rows every step)

        One issue() dispatcher prefetches vblock i+1 (whatever its
        category) while i is folded, so the double-buffer pipeline never
        breaks across category boundaries."""
        SBLK = 128
        plen = plen_ref[0]
        n_sh = (plen + 1) // SBLK  # audio rows [0, 128·n_sh) are shared
        gen_lo = n_sh * SBLK  # first full-lane audio row
        L = pos0 - gen_lo  # full-lane rows to read
        nfull = L // ABLK
        ntail = (L - nfull * ABLK + SBLK - 1) // SBLK
        is0 = 1 + n_sh  # first full/tail vblock index
        total = is0 + nfull + ntail

        def text_pair(slot):
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(0, s_text), pl.ds(0, D)],
                    ksh.at[slot, pl.ds(0, s_text), :], sems_sh.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(0, s_text), pl.ds(0, D)],
                    vsh.at[slot, pl.ds(0, s_text), :], sems_sh.at[slot, 1],
                ),
            )

        def prompt_pair(j, slot):
            start = s_text + pl.multiple_of(j * SBLK, SBLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, SBLK), pl.ds(0, D)],
                    ksh.at[slot, pl.ds(0, SBLK), :], sems_sh.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, SBLK), pl.ds(0, D)],
                    vsh.at[slot, pl.ds(0, SBLK), :], sems_sh.at[slot, 1],
                ),
            )

        def full_pair(g, slot):
            start = s_text + pl.multiple_of(gen_lo + g * ABLK, SBLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    kbuf.at[slot], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vbuf.at[slot], sems.at[slot, 1],
                ),
            )

        def tail_pair(t, slot):
            start = s_text + pl.multiple_of(
                gen_lo + nfull * ABLK + t * SBLK, SBLK
            )
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, SBLK), :],
                    kbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, SBLK), :],
                    vbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 1],
                ),
            )

        def issue(i):
            """Start vblock i's DMA pair, whatever its category. Shared
            vblocks alternate ksh/vsh slots by i, full/tail vblocks
            alternate kbuf/vbuf slots by (i - is0) — each buffer's
            consecutive users always land on opposite slots."""

            @pl.when(i == 0)
            def _():
                a, b = text_pair(0)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= 1, i < is0))
            def _():
                a, b = prompt_pair(i - 1, jax.lax.rem(i, 2))
                a.start()
                b.start()

            g = i - is0

            @pl.when(jnp.logical_and(i >= is0, g < nfull))
            def _():
                a, b = full_pair(g, jax.lax.rem(g, 2))
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= is0, g >= nfull))
            def _():
                a, b = tail_pair(g - nfull, jax.lax.rem(g, 2))
                a.start()
                b.start()

        issue(0)
        # total >= 2 always: pos0 >= 1 so there is at least one
        # prompt/full/tail vblock after the text block
        issue(1)

        # --- text block (always exactly one; static row count) -----------
        a, b = text_pair(0)
        a.wait()
        b.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (s_text, 1), 0)
        ok = rows < x_len
        kb = jnp.where(ok, ksh[0, :s_text].astype(jnp.float32), 0.0)
        vb = jnp.where(ok, vsh[0, :s_text].astype(jnp.float32), 0.0)
        state = fold(kb, vb, ok, state0, shared=True)

        # --- shared prompt sub-blocks (rows all valid by construction) ----
        ones_sh = jnp.ones((SBLK, 1), bool)

        def body_p(j, state):
            i = j + 1

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            a, b = prompt_pair(j, jax.lax.rem(i, 2))
            a.wait()
            b.wait()
            slot = jax.lax.rem(i, 2)
            kb = ksh[slot, :SBLK].astype(jnp.float32)
            vb = vsh[slot, :SBLK].astype(jnp.float32)
            return fold(kb, vb, ones_sh, state, shared=True)

        state = jax.lax.fori_loop(0, n_sh, body_p, state)

        # --- full-lane generated blocks (rows all valid) ------------------
        ones_full = jnp.ones((ABLK, 1), bool)

        def body_f(g, state):
            i = is0 + g

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(g, 2)
            a, b = full_pair(g, slot)
            a.wait()
            b.wait()
            kb = kbuf[slot].astype(jnp.float32)
            vb = vbuf[slot].astype(jnp.float32)
            return fold_wide(kb, vb, ones_full, state)

        state = jax.lax.fori_loop(0, nfull, body_f, state)

        # --- full-lane tail sub-blocks (partially valid) ------------------
        def body_t(t, state):
            i = is0 + nfull + t

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(nfull + t, 2)
            a, b = tail_pair(t, slot)
            a.wait()
            b.wait()
            idx = (
                gen_lo + nfull * ABLK + t * SBLK
                + jax.lax.broadcasted_iota(jnp.int32, (SBLK, 1), 0)
            )
            ok = idx < pos0
            kb = jnp.where(ok, kbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            return fold_wide(kb, vb, ok, state)

        return jax.lax.fori_loop(0, ntail, body_t, state)

    def _hbm_fold_batched(fold_wide, state0):
        """Batched-request HBM fold (B independent requests in lanes).
        Cache row layout (engine ar_generate_batch): text [0, s_text);
        per-request BOS+prompt at audio rows [0, p_audio); generated frame
        t at STATIC row p_audio + t for every request. Text/prompt
        validity varies per request (per-GROUP masks from the x_len /
        prompt_len vectors); generated rows are valid for every request
        (done requests keep feeding EOS, exactly like beams). pos0 is the
        number of generated frames before this block."""
        SBLK = 128
        G_ = N // hd
        s_gen = s_text + p_audio  # static, % 128 == 0

        # per-group (request) valid lengths
        gi = jax.lax.broadcasted_iota(jnp.int32, (1, G_), 1) // num_heads
        xl_g = jnp.zeros((1, G_), jnp.int32)
        pl_g = jnp.zeros((1, G_), jnp.int32)
        mp = plen_ref[0]
        for i in range(B):
            xl_g = jnp.where(gi == i, x_len_ref[i], xl_g)
            pl_g = jnp.where(gi == i, plen_ref[i], pl_g)
            mp = jnp.maximum(mp, plen_ref[i])

        P_B = p_audio // ABLK  # static bound on prompt blocks
        n_prompt = jnp.minimum(mp // ABLK + 1, P_B)
        nfull = pos0 // ABLK
        ntail = (pos0 - nfull * ABLK + SBLK - 1) // SBLK
        is0 = 1 + n_prompt
        total = is0 + nfull + ntail

        def text_pair(slot):
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(0, s_text), :],
                    kbuf.at[slot, pl.ds(0, s_text), :], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(0, s_text), :],
                    vbuf.at[slot, pl.ds(0, s_text), :], sems.at[slot, 1],
                ),
            )

        def prompt_pair(j, slot):
            start = s_text + pl.multiple_of(j * ABLK, ABLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    kbuf.at[slot], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vbuf.at[slot], sems.at[slot, 1],
                ),
            )

        def full_pair(g, slot):
            start = s_gen + pl.multiple_of(g * ABLK, ABLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    kbuf.at[slot], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vbuf.at[slot], sems.at[slot, 1],
                ),
            )

        def tail_pair(t, slot):
            start = s_gen + pl.multiple_of(
                nfull * ABLK + t * SBLK, SBLK
            )
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, SBLK), :],
                    kbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, SBLK), :],
                    vbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 1],
                ),
            )

        def issue(i):
            slot = jax.lax.rem(i, 2)

            @pl.when(i == 0)
            def _():
                a, b = text_pair(slot)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= 1, i < is0))
            def _():
                a, b = prompt_pair(i - 1, slot)
                a.start()
                b.start()

            g = i - is0

            @pl.when(jnp.logical_and(i >= is0, g < nfull))
            def _():
                a, b = full_pair(g, slot)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= is0, g >= nfull))
            def _():
                a, b = tail_pair(g - nfull, slot)
                a.start()
                b.start()

        issue(0)
        issue(1)  # total >= 2: pos0 >= 1 so a full/tail block follows

        # --- text (rows < x_len_r per request) ----------------------------
        a, b = text_pair(0)
        a.wait()
        b.wait()
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (s_text, G_), 0)
        ok_t = rows_t < xl_g
        state = fold_wide(
            kbuf[0, :s_text].astype(jnp.float32),
            vbuf[0, :s_text].astype(jnp.float32),
            ok_t, state0,
        )

        # --- prompt blocks (audio row <= prompt_len_r) --------------------
        rows_p = jax.lax.broadcasted_iota(jnp.int32, (ABLK, G_), 0)

        def body_p(j, state):
            i = j + 1

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(i, 2)
            a, b = prompt_pair(j, slot)
            a.wait()
            b.wait()
            ok = (j * ABLK + rows_p) <= pl_g
            return fold_wide(
                kbuf[slot].astype(jnp.float32),
                vbuf[slot].astype(jnp.float32), ok, state,
            )

        state = jax.lax.fori_loop(0, n_prompt, body_p, state)

        # --- generated region (row idx < pos0, request-independent) -------
        ones_full = jnp.ones((ABLK, 1), bool)

        def body_f(g, state):
            i = is0 + g

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(i, 2)
            a, b = full_pair(g, slot)
            a.wait()
            b.wait()
            return fold_wide(
                kbuf[slot].astype(jnp.float32),
                vbuf[slot].astype(jnp.float32), ones_full, state,
            )

        state = jax.lax.fori_loop(0, nfull, body_f, state)

        def body_t(t, state):
            i = is0 + nfull + t

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(i, 2)
            a, b = tail_pair(t, slot)
            a.wait()
            b.wait()
            idx = (
                nfull * ABLK + t * SBLK
                + jax.lax.broadcasted_iota(jnp.int32, (SBLK, 1), 0)
            )
            ok = idx < pos0
            kb = jnp.where(ok, kbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            return fold_wide(kb, vb, ok, state)

        return jax.lax.fori_loop(0, ntail, body_t, state)

    def _hbm_fold_batched_grouped(fold_wide, fold_grouped, state0):
        """Batched best_of fold with the GROUPED shared-prefix layout
        (engine ar_generate_batch, beams > 1): the text + BOS + prompt K/V
        live ONCE per request in prefix_{k,v}_hbm — [NL, s_text + p_audio,
        R*D] lanes, no beam copies — and the main cache holds ONLY
        generated rows ([NL, t_gen + slack, N], row t = generated frame
        t). Each prefix block is DMA'd at R*D lanes and lane-broadcast to
        the full beam width in VMEM, so per-step HBM prefix traffic drops
        by a factor of `beams` vs the ungrouped layout — the measured
        reason coalesced best_of lost to back-to-back single requests
        (PERFORMANCE.md: each of R*B lane rows re-read its request's
        prompt cache). Fold block boundaries, masks and fold order are
        IDENTICAL to _hbm_fold_batched, so emitted tokens are bitwise
        equal to the ungrouped layout."""
        SBLK = 128
        R_req = B // beams
        mp = plen_ref[0]
        for i in range(B):
            mp = jnp.maximum(mp, plen_ref[i])

        # per-REQUEST valid lengths for the narrow prefix folds
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, R_req), 1)
        xl_r = jnp.zeros((1, R_req), jnp.int32)
        pl_r = jnp.zeros((1, R_req), jnp.int32)
        for r in range(R_req):
            xl_r = jnp.where(ri == r, x_len_ref[r * beams], xl_r)
            pl_r = jnp.where(ri == r, plen_ref[r * beams], pl_r)

        P_B = p_audio // ABLK  # static bound on prompt blocks
        n_prompt = jnp.minimum(mp // ABLK + 1, P_B)
        nfull = pos0 // ABLK
        ntail = (pos0 - nfull * ABLK + SBLK - 1) // SBLK
        is0 = 1 + n_prompt
        total = is0 + nfull + ntail

        def text_pair(slot):
            return (
                pltpu.make_async_copy(
                    prefix_k_hbm.at[layer, pl.ds(0, s_text), :],
                    ksh.at[slot, pl.ds(0, s_text), :], sems_sh.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    prefix_v_hbm.at[layer, pl.ds(0, s_text), :],
                    vsh.at[slot, pl.ds(0, s_text), :], sems_sh.at[slot, 1],
                ),
            )

        def prompt_pair(j, slot):
            start = s_text + pl.multiple_of(j * ABLK, ABLK)
            return (
                pltpu.make_async_copy(
                    prefix_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    ksh.at[slot], sems_sh.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    prefix_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vsh.at[slot], sems_sh.at[slot, 1],
                ),
            )

        def full_pair(g, slot):
            start = pl.multiple_of(g * ABLK, ABLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, ABLK), :],
                    kbuf.at[slot], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, ABLK), :],
                    vbuf.at[slot], sems.at[slot, 1],
                ),
            )

        def tail_pair(t, slot):
            start = pl.multiple_of(nfull * ABLK + t * SBLK, SBLK)
            return (
                pltpu.make_async_copy(
                    cache_k_hbm.at[layer, pl.ds(start, SBLK), :],
                    kbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cache_v_hbm.at[layer, pl.ds(start, SBLK), :],
                    vbuf.at[slot, pl.ds(0, SBLK), :], sems.at[slot, 1],
                ),
            )

        def issue(i):
            """Start vblock i's DMA pair. Prefix vblocks alternate ksh/vsh
            slots by i, generated vblocks alternate kbuf/vbuf slots by
            (i - is0) — each buffer family's consecutive users always land
            on opposite slots (same dispatcher shape as
            _hbm_fold_beams)."""

            @pl.when(i == 0)
            def _():
                a, b = text_pair(0)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= 1, i < is0))
            def _():
                a, b = prompt_pair(i - 1, jax.lax.rem(i, 2))
                a.start()
                b.start()

            g = i - is0

            @pl.when(jnp.logical_and(i >= is0, g < nfull))
            def _():
                a, b = full_pair(g, jax.lax.rem(g, 2))
                a.start()
                b.start()

            @pl.when(jnp.logical_and(i >= is0, g >= nfull))
            def _():
                a, b = tail_pair(g - nfull, jax.lax.rem(g, 2))
                a.start()
                b.start()

        issue(0)
        issue(1)  # total >= 2: n_prompt >= 1 always

        # --- text (rows < x_len_r per request; mask identical) -------------
        a, b = text_pair(0)
        a.wait()
        b.wait()
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (s_text, R_req), 0)
        ok_t = rows_t < xl_r
        state = fold_grouped(
            ksh[0, :s_text].astype(jnp.float32),
            vsh[0, :s_text].astype(jnp.float32),
            ok_t, state0,
        )

        # --- prompt blocks (audio row <= prompt_len_r) ----------------------
        rows_p = jax.lax.broadcasted_iota(jnp.int32, (ABLK, R_req), 0)

        def body_p(j, state):
            i = j + 1

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(i, 2)
            a, b = prompt_pair(j, slot)
            a.wait()
            b.wait()
            ok = (j * ABLK + rows_p) <= pl_r
            return fold_grouped(
                ksh[slot].astype(jnp.float32),
                vsh[slot].astype(jnp.float32), ok, state,
            )

        state = jax.lax.fori_loop(0, n_prompt, body_p, state)

        # --- generated region (full-lane; row idx < pos0) -------------------
        ones_full = jnp.ones((ABLK, 1), bool)

        def body_f(g, state):
            i = is0 + g

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(g, 2)
            a, b = full_pair(g, slot)
            a.wait()
            b.wait()
            return fold_wide(
                kbuf[slot].astype(jnp.float32),
                vbuf[slot].astype(jnp.float32), ones_full, state,
            )

        state = jax.lax.fori_loop(0, nfull, body_f, state)

        def body_t(t, state):
            i = is0 + nfull + t

            @pl.when(i + 1 < total)
            def _():
                issue(i + 1)

            slot = jax.lax.rem(nfull + t, 2)
            a, b = tail_pair(t, slot)
            a.wait()
            b.wait()
            idx = (
                nfull * ABLK + t * SBLK
                + jax.lax.broadcasted_iota(jnp.int32, (SBLK, 1), 0)
            )
            ok = idx < pos0
            kb = jnp.where(ok, kbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            vb = jnp.where(ok, vbuf[slot, :SBLK].astype(jnp.float32), 0.0)
            return fold_wide(kb, vb, ok, state)

        return jax.lax.fori_loop(0, ntail, body_t, state)

    # ---------------- phase 1: FFN (+ head + sampling on the last layer) ---
    def _ffn():
        h = h_acc[...]
        h2 = ln(
            h,
            ln2s_ref[0, 0].astype(jnp.float32),
            ln2b_ref[0, 0].astype(jnp.float32),
        )
        f = mat(h2, w1_ref, s1_ref) + b1_ref[0, 0].astype(jnp.float32)
        f = jnp.maximum(f, 0.0)
        down = mat(f, w2_ref, s2_ref)
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
            slog_ref[0] = logits.astype(slog_ref.dtype)

            VP = logits.shape[1]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (B, VP), 1)
            masked = jnp.where(lanes < vocab, logits, -1e30)
            temp = jnp.maximum(alpha_temp_ref[0, 1], 1e-6)
            scaled = masked / temp
            if filtered:
                # top-k / top-p filtering IN-KERNEL via exact integer
                # bisection over IEEE-754 sortable keys (no sorts — see
                # ops/sampling.py::filtered_keep_mask; reference order
                # temperature → top-k → top-p, models/vallex.py:791-853).
                # Restricting `scaled` here makes the Gumbel draw AND the
                # emitted logprob both come from the filtered distribution,
                # matching the XLA topk_sampling path.
                tk = alpha_temp_ref[0, 2].astype(jnp.int32)
                tp = alpha_temp_ref[0, 3]
                keep = filtered_keep_mask(scaled, tk, tp)
                scaled = jnp.where(keep, scaled, -1e30)

            if stochastic:
                # signed int32 bits: mask to 24 low bits (see decode_step)
                pltpu.prng_seed(seed_ref[0] + k_step)
                bits = pltpu.prng_random_bits((B, VP))
                u = (bits & 0xFFFFFF).astype(jnp.float32) * (
                    1.0 / (1 << 24)
                )
                gumbel = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
                score = scaled + gumbel
            else:
                score = masked
            best = jnp.max(score, axis=1, keepdims=True)
            tok = jnp.min(
                jnp.where(score == best, lanes, VP), axis=1, keepdims=True
            )
            tok = jnp.minimum(tok, vocab - 1)
            logp = scaled - jax.nn.logsumexp(scaled, axis=1, keepdims=True)
            chosen = jnp.sum(
                jnp.where(lanes == tok, logp, 0.0), axis=1, keepdims=True
            )
            for i in range(B):
                cur_tok[i] = tok[i, 0].astype(jnp.int32)
                cur_logp[i] = chosen[i, 0]
                tok_out_ref[i, 0] = tok[i, 0].astype(jnp.int32)
                logp_out_ref[i, 0] = chosen[i, 0]
                done_out_ref[i, 0] = done_s[i]
                sum_out_ref[i, 0] = sum_s[i]

        @pl.when(
            jnp.logical_and(k_step == K - 1, layer == num_layers - 1)
        )
        def _():
            # write the block's K cache columns of every layer to the HBM
            # outputs in one [K, N] plane DMA per (layer, k|v)
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
    jax.jit,
    static_argnames=(
        "steps", "s_text", "num_heads", "vocab", "eos", "stochastic",
        "quant", "act_quant", "batched", "p_audio", "filtered", "beams",
    ),
)
def decode_block_fused(
    tokens: jnp.ndarray,  # [B] token to feed at step 0
    logprobs: jnp.ndarray,  # [B] f32 its logprob
    done: jnp.ndarray,  # [B] bool beam-done flags
    sum_logprobs: jnp.ndarray,  # [B] f32
    layer_weights,  # pack_layer_weights dict
    cache_k: jnp.ndarray,  # [NL, C, N] with K slack rows
    cache_v: jnp.ndarray,
    x_len: jnp.ndarray,
    audio_pos: jnp.ndarray,  # [] position of step 0
    prompt_len: jnp.ndarray,  # [] valid acoustic-prompt frames (audio rows
    #   [0, prompt_len] = BOS+prompt are beam-identical; drives the B>1
    #   shared-prefix DMA schedule. Ignored at B=1.)
    prefix_k: "jnp.ndarray | None" = None,  # [NL, s_text + p_audio,
    #   (B//beams)*D] grouped batched-beams mode: per-REQUEST prefix K
    #   (text + BOS + prompt, no beam copies); cache_k then holds ONLY
    #   generated rows. None = ungrouped layout.
    prefix_v: "jnp.ndarray | None" = None,
    *,
    seed: jnp.ndarray,  # [] i32 seed of step 0
    remaining: jnp.ndarray,  # [] i32 steps left before the length cap
    temperature: jnp.ndarray,
    pe_alpha: jnp.ndarray,
    steps: int,
    s_text: int,
    num_heads: int,
    vocab: int,
    eos: int,
    stochastic: bool,
    quant: bool = False,
    act_quant: bool = False,
    batched: bool = False,
    p_audio: int = 0,
    kv_scales=None,  # (kscale_lane, vscale_lane) each [NL, 1, N] f32
    filtered: bool = False,
    top_k=None,  # [] runtime top-k (filtered mode; <= 0 disables)
    top_p=None,  # [] runtime top-p (filtered mode; >= 1 disables)
    beams: int = 1,  # static: lane rows per request (grouped mode)
):
    """K fused decode steps → (fed_tokens [K,B], next_tok [B], next_logp [B],
    done' [B], sum_logprobs' [B], cache_k', cache_v',
    step_logits [K, B, VP] — every step's pre-sampling logits, the draft
    side of speculative sampling; ~40 KB/frame of HBM write, negligible
    next to the weight stream, so it is always emitted rather than
    forking every config's compiled program on a static flag)."""
    B = tokens.shape[0]
    lw = layer_weights
    NL, C, N = cache_k.shape
    D = lw["wqkv"].shape[1]
    F = lw["w1"].shape[-1]
    VP = lw["wpred"].shape[-1]
    VB = lw["emb"].shape[0]
    K = steps
    KP = -(-K // 8) * 8  # sublane-aligned scratch/write-back plane rows
    grouped = prefix_k is not None
    # The engine allocates the caches as [s_text + t_audio + slack] with
    # t_audio % ABLK == 0; audio-block DMA bounds are guaranteed by the
    # engine's pos0 <= t_audio - 1 invariant. slack >= KP covers the
    # KP-row column write (rows K..KP-1 are stale garbage that the next
    # block/verify pass overwrites before their positions become valid).
    assert s_text <= ABLK and s_text % 128 == 0
    if grouped:
        # grouped layout: the main cache holds generated rows only; the
        # prefix lives in prefix_{k,v} at (B//beams)*D lanes per row
        assert batched and B % beams == 0, (B, beams)
        assert prefix_k.shape == (NL, s_text + p_audio, (B // beams) * D), (
            prefix_k.shape, (NL, s_text + p_audio, (B // beams) * D)
        )
        assert C >= ABLK + KP, (C, K)
    else:
        assert C - s_text >= ABLK + KP, (C, K, s_text)
    if batched:
        assert p_audio % ABLK == 0 and p_audio >= ABLK, p_audio
        assert B > 1, "batched mode packs requests in lanes; use the"\
            " single-request path for B == 1"
    # x_len / remaining / prompt_len may be scalars (single request /
    # beams: every lane-group shares them) or [B] vectors (batched mode)
    xlv = jnp.broadcast_to(
        jnp.atleast_1d(x_len.astype(jnp.int32)), (B,)
    )
    rmv = jnp.broadcast_to(
        jnp.atleast_1d(remaining.astype(jnp.int32)), (B,)
    )
    plv = jnp.broadcast_to(
        jnp.atleast_1d(prompt_len.astype(jnp.int32)), (B,)
    )

    attn_idx = lambda k, l, p, *_: (l, 0, 0)  # noqa: E731
    ffn_idx = lambda k, l, p, *_: (jnp.maximum(l - 1 + p, 0), 0, 0)  # noqa: E731
    const2 = lambda k, l, p, *_: (0, 0)  # noqa: E731
    grid = (K, NL, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=grid,
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
            pl.BlockSpec((1, 1, 3 * D), attn_idx),
            pl.BlockSpec((1, 1, D), attn_idx),
            pl.BlockSpec((1, 1, F), ffn_idx),
            pl.BlockSpec((1, 1, D), ffn_idx),
            pl.BlockSpec((1, VP), const2),
            pl.BlockSpec((VB, D), const2),
            pl.BlockSpec((1, 1, N), attn_idx),
            pl.BlockSpec((1, 1, N), attn_idx),
            pl.BlockSpec((1, 4), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((B, VP), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, B, VP), lambda k, l, p, *_: (k, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((2, ABLK, N), cache_k.dtype),
            pltpu.VMEM((2, ABLK, N), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((NL, KP, N), cache_k.dtype),
            pltpu.VMEM((NL, KP, N), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((B,), jnp.int32),
            pltpu.SMEM((B,), jnp.float32),
            pltpu.SMEM((B,), jnp.int32),
            pltpu.SMEM((B,), jnp.float32),
            # shared-prefix double buffers: (2, ABLK, D) under the B>1
            # single-request beams schedule, (2, ABLK, R*D) under the
            # grouped batched-beams schedule, token-sized placeholders
            # otherwise (B=1 and ungrouped batched, whose prefixes are
            # per-request full-lane)
            pltpu.VMEM(
                (2, ABLK, D) if (B > 1 and not batched)
                else (2, ABLK, (B // beams) * D) if grouped
                else (2, 8, 128),
                cache_k.dtype,
            ),
            pltpu.VMEM(
                (2, ABLK, D) if (B > 1 and not batched)
                else (2, ABLK, (B // beams) * D) if grouped
                else (2, 8, 128),
                cache_v.dtype,
            ),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    tkf = (
        jnp.zeros((), jnp.float32) if top_k is None
        else top_k.astype(jnp.float32)
    )
    tpf = (
        jnp.ones((), jnp.float32) if top_p is None
        else top_p.astype(jnp.float32)
    )
    alpha_temp = jnp.stack(
        [pe_alpha.astype(jnp.float32), temperature.astype(jnp.float32),
         tkf, tpf]
    )[None]
    kv_quant = kv_scales is not None
    if kv_quant:
        ksc_in = kv_scales[0].astype(jnp.float32)
        vsc_in = kv_scales[1].astype(jnp.float32)
        assert ksc_in.shape == (NL, 1, N), ksc_in.shape
    else:
        ksc_in = jnp.ones((NL, 1, N), jnp.float32)
        vsc_in = jnp.ones((NL, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _kernel, s_text=s_text, num_heads=num_heads, vocab=vocab,
            eos=eos, stochastic=stochastic, quant=quant,
            act_quant=act_quant, batched=batched, p_audio=p_audio,
            kv_quant=kv_quant, filtered=filtered, grouped=grouped,
            beams=beams,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, VP), jnp.float32),
            jax.ShapeDtypeStruct((K, B), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((NL, KP, N), cache_k.dtype),
            jax.ShapeDtypeStruct((NL, KP, N), cache_v.dtype),
            jax.ShapeDtypeStruct((K, B, VP), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        xlv,
        audio_pos.astype(jnp.int32)[None],
        tokens.astype(jnp.int32),
        seed.astype(jnp.int32)[None],
        done.astype(jnp.int32),
        rmv,
        plv,
        lw["wqkv"], lw["bqkv"], lw["wout"], lw["bout"],
        lw["w1"], lw["b1"], lw["w2"], lw["b2"],
        lw["ln1s"], lw["ln1b"], lw["ln2s"], lw["ln2b"],
        lw["fns"], lw["fnb"], lw["wpred"],
        lw["sqkv"], lw["sout"], lw["s1"], lw["s2"], lw["spred"],
        lw["emb"],
        ksc_in,
        vsc_in,
        alpha_temp,
        logprobs.astype(jnp.float32)[None],
        sum_logprobs.astype(jnp.float32)[None],
        cache_k, cache_v,
        prefix_k if grouped else jnp.zeros((1, 8, 128), cache_k.dtype),
        prefix_v if grouped else jnp.zeros((1, 8, 128), cache_v.dtype),
    )
    (
        _, ytok, tok_out, logp_out, done_out, sum_out, newk, newv,
        step_logits,
    ) = outs
    if grouped:
        # main cache holds generated rows only: frame t lives at row t
        slot = audio_pos.astype(jnp.int32)
    elif batched:
        slot = s_text + p_audio + audio_pos.astype(jnp.int32)
    else:
        slot = s_text + audio_pos.astype(jnp.int32)
    ck = jax.lax.dynamic_update_slice(
        cache_k, newk.astype(cache_k.dtype), (0, slot, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cache_v, newv.astype(cache_v.dtype), (0, slot, 0)
    )
    return (
        ytok,
        tok_out[:, 0],
        logp_out[:, 0],
        done_out[:, 0].astype(bool),
        sum_out[:, 0],
        ck,
        cv,
        step_logits,
    )
