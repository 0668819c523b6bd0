"""Pallas TPU kernel: fused single-query KV-cache attention for AR decode.

The XLA decode path costs ~3x the raw cache traffic at C=1152 (the
lax.scan over layers re-materializes the whole cache through its ys, and
the full padded cache is read every step however little is valid). This
kernel DMAs only VALID cache blocks HBM->VMEM (double-buffered) and computes
one-query flash attention over them; blocks holding text padding or future
audio are never touched.

Layout: the cache is 2-D [C, N] with N = B*H*hd lanes (1024 for the
150 M model) — head h of beam b owns lanes [(b*H+h)*hd, +hd). hd=64 is
below the TPU's 128-lane tile, so a [B,H,C,hd] layout cannot be sliced by
Mosaic; packing (B,H,hd) into lanes instead gives full-width VPU work and
makes per-head reductions a matmul with a 0/1 head-selector matrix (MXU):

    scores[blk, g] = sum_lanes (q * k_blk) . sel    sel[n, g] = [n//hd == g]
    out[lanes]     = sum_blk (p @ sel^T) * v_blk

This step's own k/v is folded into the softmax in-kernel; the cache column
write happens outside as an XLA dynamic_update_slice on the while-loop
carry (in-place, and slot-axis slicing is legal in XLA).

Valid slots (engine/ar.py layout): c < x_len (text) or
s_text <= c < s_text+pos (audio); valid blocks form two contiguous runs that
the kernel walks by ordinal. Constraints: C % BLK == 0, s_text % BLK == 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # cache slots per DMA block


def _kernel(
    # scalar prefetch
    x_len_ref,  # [1]
    pos_ref,  # [1] current audio position
    # inputs
    q_ref,  # [1, N] VMEM
    new_k_ref,  # [1, N] VMEM
    new_v_ref,  # [1, N] VMEM
    cache_k_hbm,  # [C, N] HBM (read-only)
    cache_v_hbm,  # [C, N]
    # outputs
    out_ref,  # [1, N] VMEM
    # scratch
    kbuf,  # [2, BLK, N] VMEM
    vbuf,  # [2, BLK, N] VMEM
    sems,  # DMA semaphores [2, 2]
    *,
    s_text: int,
    hd: int,
):
    C, N = cache_k_hbm.shape
    G = N // hd  # head groups (B*H)
    x_len = x_len_ref[0]
    pos = pos_ref[0]
    slot = s_text + pos
    scale = 1.0 / math.sqrt(hd)

    audio_block0 = s_text // BLK
    n_text = pl.cdiv(x_len, BLK)
    n_audio = pos // BLK + 1
    total = n_text + n_audio

    # 0/1 head-selector: sel[n, g] = 1 iff lane n belongs to head group g
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (N, G), 0) // hd
    group_id = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
    sel = (lane_group == group_id).astype(jnp.float32)  # [N, G]

    def block_of(ordinal):
        return jnp.where(
            ordinal < n_text, ordinal, audio_block0 + (ordinal - n_text)
        )

    def start_dma(ordinal, buf_slot):
        start = pl.multiple_of(block_of(ordinal) * BLK, BLK)
        pltpu.make_async_copy(
            cache_k_hbm.at[pl.ds(start, BLK), :],
            kbuf.at[buf_slot],
            sems.at[buf_slot, 0],
        ).start()
        pltpu.make_async_copy(
            cache_v_hbm.at[pl.ds(start, BLK), :],
            vbuf.at[buf_slot],
            sems.at[buf_slot, 1],
        ).start()

    def wait_dma(ordinal, buf_slot):
        start = pl.multiple_of(block_of(ordinal) * BLK, BLK)
        pltpu.make_async_copy(
            cache_k_hbm.at[pl.ds(start, BLK), :],
            kbuf.at[buf_slot],
            sems.at[buf_slot, 0],
        ).wait()
        pltpu.make_async_copy(
            cache_v_hbm.at[pl.ds(start, BLK), :],
            vbuf.at[buf_slot],
            sems.at[buf_slot, 1],
        ).wait()

    start_dma(0, 0)

    q = q_ref[0, :].astype(jnp.float32)  # [N]

    def body(i, carry):
        m_i, l_i, acc = carry  # [1,G], [1,G], [1,N] f32
        buf_slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _():
            start_dma(i + 1, jax.lax.rem(i + 1, 2))

        wait_dma(i, buf_slot)
        k = kbuf[buf_slot].astype(jnp.float32)  # [BLK, N]
        v = vbuf[buf_slot].astype(jnp.float32)

        # per-head scores via selector matmul
        s = jax.lax.dot(
            k * q[None, :], sel, preferred_element_type=jnp.float32
        ) * scale  # [BLK, G]

        b = block_of(i)
        rows = b * BLK + jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
        ok = jnp.logical_or(
            rows < x_len,
            jnp.logical_and(rows >= s_text, rows < slot),
        )
        s = jnp.where(ok, s, -1e30)

        m_blk = jnp.max(s, axis=0, keepdims=True)  # [1, G]
        m_new = jnp.maximum(m_i, m_blk)
        alpha = jnp.exp(m_i - m_new)  # [1, G]
        p = jnp.exp(s - m_new)  # [BLK, G] (invalid rows ~ 0)
        l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)

        # expand p back to lanes and accumulate p.V
        p_lanes = jax.lax.dot(
            p, sel.T, preferred_element_type=jnp.float32
        )  # [BLK, N]
        alpha_lanes = jax.lax.dot(
            alpha, sel.T, preferred_element_type=jnp.float32
        )  # [1, N]
        acc_new = acc * alpha_lanes + jnp.sum(
            p_lanes * v, axis=0, keepdims=True
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((1, G), -1e30, jnp.float32)
    l0 = jnp.zeros((1, G), jnp.float32)
    a0 = jnp.zeros((1, N), jnp.float32)
    m_i, l_i, acc = jax.lax.fori_loop(0, total, body, (m0, l0, a0))

    # fold in this step's own k/v (the slot column, excluded above)
    nk = new_k_ref[0, :].astype(jnp.float32)
    nv = new_v_ref[0, :].astype(jnp.float32)
    own_s = jax.lax.dot(
        (q * nk)[None, :], sel, preferred_element_type=jnp.float32
    ) * scale  # [1, G]
    m_new = jnp.maximum(m_i, own_s)
    alpha = jnp.exp(m_i - m_new)
    p_own = jnp.exp(own_s - m_new)
    l_new = l_i * alpha + p_own

    alpha_lanes = jax.lax.dot(alpha, sel.T, preferred_element_type=jnp.float32)
    p_own_lanes = jax.lax.dot(p_own, sel.T, preferred_element_type=jnp.float32)
    acc = acc * alpha_lanes + p_own_lanes * nv[None, :]

    l_lanes = jax.lax.dot(l_new, sel.T, preferred_element_type=jnp.float32)
    out_ref[...] = (acc / l_lanes).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_text",))
def decode_attention(
    q: jnp.ndarray,  # [B, H, hd]
    new_k: jnp.ndarray,  # [B, H, hd]
    new_v: jnp.ndarray,  # [B, H, hd]
    cache_k: jnp.ndarray,  # [C, B*H*hd] lane-packed
    cache_v: jnp.ndarray,  # [C, B*H*hd]
    x_len: jnp.ndarray,  # [] int32
    audio_pos: jnp.ndarray,  # [] int32
    *,
    s_text: int,
):
    """-> (attended [B, H, hd], cache_k', cache_v').

    Caches use the lane-packed [C, B*H*hd] layout; the new column is written
    here with an XLA dynamic_update_slice (in-place on loop carries). The
    mask depends only on (x_len, audio_pos), shared across beams.
    """
    B, H, hd = q.shape
    C, N = cache_k.shape
    assert N == B * H * hd
    assert C % BLK == 0 and s_text % BLK == 0, (C, s_text)

    qf = q.reshape(1, N)
    nkf = new_k.reshape(1, N)
    nvf = new_v.reshape(1, N)

    out = pl.pallas_call(
        functools.partial(_kernel, s_text=s_text, hd=hd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, BLK, N), cache_k.dtype),
                pltpu.VMEM((2, BLK, N), cache_v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, N), q.dtype),
    )(
        x_len.astype(jnp.int32)[None],
        audio_pos.astype(jnp.int32)[None],
        qf, nkf, nvf, cache_k, cache_v,
    )
    slot = s_text + audio_pos.astype(jnp.int32)
    ck = jax.lax.dynamic_update_slice(
        cache_k, nkf.astype(cache_k.dtype), (slot, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cache_v, nvf.astype(cache_v.dtype), (slot, 0)
    )
    return out.reshape(B, H, hd), ck, cv


def pack_cache(kv: jnp.ndarray) -> jnp.ndarray:
    """[B, H, C, hd] -> lane-packed [C, B*H*hd]."""
    B, H, C, hd = kv.shape
    return kv.transpose(2, 0, 1, 3).reshape(C, B * H * hd)
