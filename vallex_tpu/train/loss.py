"""Training losses for VALL-E X (AR + NAR), built the VALL-E-paper way.

The reference repo ships no runnable training loop (VALLE.forward raises
NotImplementedError, models/vallex.py:447-457; the README defers training to
lifeiteng/vall-e). This module provides the standard two-stage objective so
the framework is trainable end-to-end on TPU:

  AR: teacher-forced next-token cross-entropy over codebook 0 with the
      BOS-prepend / EOS-append convention of `pad_y_eos`
      (reference: models/vallex.py:294-305).
  NAR: one uniformly-sampled stage j ∈ [1,7] per step; the running
      embedding sums codebooks < j over the suffix and all 8 codebooks over
      a random prefix of min(225, len/4) frames (prefix_mode=1 semantics,
      models/vallex.py:318-334); cross-entropy on codebook j over the
      suffix.

Everything is fixed-shape and mask-based so one jit covers a whole bucket.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import layers as L
from ..models import vallex as V

Params = Dict[str, Any]


def _ce(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray):
    """Masked mean cross-entropy. logits [..., V] fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def ar_loss(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    lang_ids: jnp.ndarray,  # [B, S]
    text_lens: jnp.ndarray,  # [B]
    audio_cb0: jnp.ndarray,  # [B, T] codebook-0 tokens
    audio_lens: jnp.ndarray,  # [B]
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    B, S = text_ids.shape
    T = audio_cb0.shape[1]
    eos, bos = cfg.eos_id, cfg.bos_id

    # pad_y_eos: inputs = [BOS, y]; targets = [y, EOS@len]
    y_in = jnp.concatenate(
        [jnp.full((B, 1), bos, audio_cb0.dtype), audio_cb0], axis=1
    )  # [B, T+1]
    pos_t = jnp.arange(T + 1)[None]
    targets = jnp.where(
        pos_t < audio_lens[:, None],
        jnp.concatenate([audio_cb0, jnp.zeros((B, 1), audio_cb0.dtype)], 1),
        eos,
    )  # y then EOS at position len (later positions also EOS, masked out)

    x = V.text_input(params, cfg, text_ids, lang_ids, "ar", pe_table, dtype)
    y_emb = V.ar_audio_input(params, cfg, y_in, pe_table, 0, dtype)
    xy = jnp.concatenate([x, y_emb], axis=1)  # [B, S+T+1]

    total = S + T + 1
    rows = jnp.arange(total)[None, :, None]
    cols = jnp.arange(total)[None, None, :]
    col_text_ok = cols < text_lens[:, None, None]
    col_audio_ok = jnp.logical_and(
        cols >= S, (cols - S) <= audio_lens[:, None, None]
    )
    causal = jnp.where(cols < S, True, cols <= rows)
    ok = jnp.logical_and(jnp.logical_or(col_text_ok, col_audio_ok), causal)
    mask = jnp.where(ok, 0.0, V.NEG_INF).astype(jnp.float32)[:, None]

    h = V.ar_forward(params, cfg, xy, mask, remat=True)
    logits = V.ar_logits(params, h[:, S:])  # [B, T+1, 1025]
    loss_mask = (pos_t <= audio_lens[:, None]).astype(jnp.float32)
    return _ce(logits, targets.astype(jnp.int32), loss_mask)


def nar_loss(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    lang_ids: jnp.ndarray,
    text_lens: jnp.ndarray,
    codes: jnp.ndarray,  # [B, T, 8]
    audio_lens: jnp.ndarray,  # [B]
    stage: jnp.ndarray,  # [] int in [1, 7] (sampled by the caller)
    prefix_len: jnp.ndarray,  # [] int (sampled by the caller, ≤ 225)
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    B, S = text_ids.shape
    T = codes.shape[1]
    emb = params["nar_audio_embeddings"]["weight"]  # [8, 1025, D]

    x = V.text_input(params, cfg, text_ids, lang_ids, "nar", pe_table, dtype)

    pos_t = jnp.arange(T)[None, :, None]  # [1, T, 1]
    in_prefix = pos_t < prefix_len
    valid = pos_t < audio_lens[:, None, None]

    # running embedding: cb0 everywhere; cbs 1..7 on prefix; cbs < stage on
    # suffix (prefix_mode=1; reference: models/vallex.py:318-334)
    y_emb = jnp.take(emb[0], codes[..., 0], axis=0).astype(dtype)
    for j in range(1, cfg.num_quantizers):
        ej = jnp.take(emb[j], codes[..., j], axis=0).astype(dtype)
        add = jnp.where(in_prefix, 1.0, 0.0) + jnp.where(
            jnp.logical_and(~in_prefix, j < stage), 1.0, 0.0
        )
        y_emb = y_emb + ej * add.astype(dtype)
    y_emb = y_emb * valid.astype(dtype)

    y_pos = L.sine_pe_apply(
        pe_table, params["nar_audio_position"]["alpha"], y_emb
    )
    xy = jnp.concatenate([x, y_pos], axis=1)

    cols = jnp.arange(S + T)[None, :]
    ok = jnp.where(
        cols < S, cols < text_lens[:, None], (cols - S) < audio_lens[:, None]
    )
    mask = jnp.where(ok, 0.0, V.NEG_INF).astype(jnp.float32)[:, None, None, :]

    h = V.nar_forward_stage(params, cfg, xy, stage - 1, mask, remat=True)
    logits = V.nar_logits(params, h[:, S:], stage - 1)  # [B, T, 1024]

    targets = jnp.take_along_axis(
        codes, jnp.broadcast_to(stage, (B, T, 1)).astype(jnp.int32), axis=-1
    )[..., 0]
    loss_mask = jnp.logical_and(~in_prefix[..., 0], valid[..., 0]).astype(
        jnp.float32
    )
    return _ce(logits, targets.astype(jnp.int32), loss_mask)


def total_loss(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined AR + NAR objective over a collated batch."""
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    r1, r2 = jax.random.split(rng)
    stage = jax.random.randint(r1, (), 1, cfg.num_quantizers)
    max_prefix = jnp.minimum(
        (jnp.min(batch["audio_lens"]) // 4).astype(jnp.int32), 225
    )
    prefix_len = jax.random.randint(r2, (), 0, jnp.maximum(max_prefix, 1))

    l_ar = ar_loss(
        params, cfg,
        batch["text_ids"], batch["lang_ids"], batch["text_lens"],
        batch["codes"][..., 0], batch["audio_lens"], pe, dtype,
    )
    l_nar = nar_loss(
        params, cfg,
        batch["text_ids"], batch["lang_ids"], batch["text_lens"],
        batch["codes"], batch["audio_lens"], stage, prefix_len, pe, dtype,
    )
    loss = l_ar + l_nar
    return loss, {"loss": loss, "ar_loss": l_ar, "nar_loss": l_nar}

def debug_activations(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (text-region hidden [B,S,D], audio-region hidden [B,T,D]) from a
    teacher-forced AR pass, for the training visualizer (the reference
    dumps encoder/decoder heatmaps, models/visualizer.py:26-106; VALL-E is
    decoder-only, so the text/audio halves of the sequence play those
    roles)."""
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    text_ids, lang_ids = batch["text_ids"], batch["lang_ids"]
    B, S = text_ids.shape
    audio_cb0 = batch["codes"][..., 0]
    x = V.text_input(params, cfg, text_ids, lang_ids, "ar", pe, dtype)
    y = V.ar_audio_input(params, cfg, audio_cb0, pe, 0, dtype)
    xy = jnp.concatenate([x, y], axis=1)
    total = xy.shape[1]
    rows = jnp.arange(total)[None, :, None]
    cols = jnp.arange(total)[None, None, :]
    causal = jnp.where(cols < S, True, cols <= rows)
    mask = jnp.where(causal, 0.0, V.NEG_INF).astype(jnp.float32)[:, None]
    h = V.ar_forward(params, cfg, xy, mask)
    return h[:, :S], h[:, S:]
