"""VALL-E X model: parameter pytree + pure forward functions.

Architecture (reference: models/vallex.py:50-264, 400-445):
- AR stack: text embedding (2048×D), audio embedding (1026×D incl. EOS=1024
  and BOS=1025), sinusoidal PEs with learnable alpha, 12 pre-norm encoder
  layers + final LayerNorm, untied predict head Linear(D→1025, no bias).
- NAR stack: text embedding, 8 audio embeddings (cb0 has 1025 rows for EOS),
  12 layers with AdaptiveLayerNorm conditioned on one of 7 stage embeddings,
  7 predict heads (heads 0..5 weight-tied to audio embeddings 2..7;
  reference: models/vallex.py:254-264).
- Language embeddings (3×D) added per text position (accent control;
  reference: models/vallex.py:439-445, 498-505).

Parameters are stored in a checkpoint-shaped pytree so the torch→JAX
converter (utils/checkpoint.py) is a mechanical key mapping.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers as L

Params = Dict[str, Any]

NEG_INF = -1e9  # additive-mask value (float32-safe; softmax in fp32)


def init_vallex(key, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 16)
    num_q = cfg.num_quantizers
    # NAR audio embeddings stacked [8, 1025, D]; row 1024 is only meaningful
    # for codebook 0 (EOS); it stays zero for codebooks 1..7.
    nar_audio = jnp.zeros((num_q, cfg.num_audio_tokens + 1, cfg.d_model))
    emb0 = jax.random.normal(
        ks[4], (cfg.num_audio_tokens + 1, cfg.d_model)
    )
    nar_audio = nar_audio.at[0].set(emb0)
    rest = jax.random.normal(
        ks[5], (num_q - 1, cfg.num_audio_tokens, cfg.d_model)
    )
    nar_audio = nar_audio.at[1:, : cfg.num_audio_tokens].set(rest)

    # NAR predict heads [7, D, 1024]; heads 0..num_q-3 tied to embeddings 2..
    nar_predict = jnp.transpose(
        nar_audio[2:, : cfg.num_audio_tokens], (0, 2, 1)
    )  # [6, D, 1024] views of embeddings
    last_head = L._xavier_uniform(
        ks[6], (1, cfg.d_model, cfg.num_audio_tokens)
    )
    nar_predict = jnp.concatenate([nar_predict, last_head], axis=0)

    return {
        "ar_text_embedding": L.init_embedding(
            ks[0], cfg.num_text_tokens, cfg.d_model
        ),
        "nar_text_embedding": L.init_embedding(
            ks[1], cfg.num_text_tokens, cfg.d_model
        ),
        "ar_audio_embedding": L.init_embedding(
            ks[2], cfg.ar_audio_vocab, cfg.d_model
        ),
        "ar_text_position": {"alpha": jnp.ones(())},
        "ar_audio_position": {"alpha": jnp.ones(())},
        "nar_text_position": {"alpha": jnp.ones(())},  # fixed (alpha=False)
        "nar_audio_position": {"alpha": jnp.ones(())},
        "ar_decoder": L.init_encoder_stack(
            ks[7], cfg.num_layers, cfg.d_model, cfg.ffn_dim, adaptive=False
        ),
        "nar_decoder": L.init_encoder_stack(
            ks[8], cfg.num_layers, cfg.d_model, cfg.ffn_dim, adaptive=True
        ),
        "ar_predict_layer": {
            "w": L._xavier_uniform(
                ks[9], (cfg.d_model, cfg.num_audio_tokens + 1)
            )
        },
        "nar_audio_embeddings": {"weight": nar_audio},
        "nar_predict_layers": {"w": nar_predict},
        "nar_stage_embeddings": {
            "weight": jax.random.normal(ks[10], (num_q - 1, cfg.d_model))
        },
        "ar_language_embedding": L.init_embedding(
            ks[11], cfg.num_languages, cfg.d_model
        ),
        "nar_language_embedding": L.init_embedding(
            ks[12], cfg.num_languages, cfg.d_model
        ),
    }


# ---------------------------------------------------------------------------
# Input assembly
# ---------------------------------------------------------------------------

def text_input(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    lang_ids: jnp.ndarray,  # [B, S] per-position language id (0=en,1=zh,2=ja)
    stack: str,  # "ar" | "nar"
    pe_table: jnp.ndarray,
    dtype=jnp.float32,
    add_lang: bool = True,
) -> jnp.ndarray:
    """Token emb + per-position language emb + sinusoidal PE → [B, S, D].

    add_lang=False reproduces `continual`'s prologue, which skips the
    language embeddings (reference: models/vallex.py:729-731)."""
    x = L.embedding_apply(params[f"{stack}_text_embedding"], text_ids, dtype)
    if add_lang:
        x = x + L.embedding_apply(
            params[f"{stack}_language_embedding"], lang_ids, dtype
        )
    # NAR text PE alpha is frozen at 1.0 in the reference (alpha=False) but
    # still a stored parameter; use whatever the checkpoint holds.
    alpha = params[f"{stack}_text_position"]["alpha"]
    return L.sine_pe_apply(pe_table, alpha, x)


def ar_audio_input(
    params: Params,
    cfg: ModelConfig,
    y_ids: jnp.ndarray,  # [B, T]
    pe_table: jnp.ndarray,
    offset: int | jnp.ndarray = 0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    emb = L.embedding_apply(params["ar_audio_embedding"], y_ids, dtype)
    alpha = params["ar_audio_position"]["alpha"]
    return L.sine_pe_apply(pe_table, alpha, emb, offset)


# ---------------------------------------------------------------------------
# Masks (additive fp32)
# ---------------------------------------------------------------------------

def prefill_mask(
    x_len: jnp.ndarray, total_len: int, valid_len: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """AR mask over a padded [total_len] sequence: positions < x_len form a
    fully-visible text prefix; the rest is causal (reference:
    models/vallex.py:535-549). Optionally masks key positions ≥ valid_len.

    Returns [1, 1, total_len, total_len] additive mask.
    """
    rows = jnp.arange(total_len)[:, None]
    cols = jnp.arange(total_len)[None, :]
    causal = cols <= rows
    in_text = cols < x_len
    allowed = jnp.logical_or(causal, in_text)
    if valid_len is not None:
        allowed = jnp.logical_and(allowed, cols < valid_len)
    return jnp.where(allowed, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def padding_mask(valid_len: jnp.ndarray, total_len: int) -> jnp.ndarray:
    """Full-visibility mask over valid positions only (NAR). [B,1,1,total]."""
    cols = jnp.arange(total_len)[None, :]
    allowed = cols < valid_len[:, None]
    return jnp.where(allowed, 0.0, NEG_INF)[:, None, None, :].astype(
        jnp.float32
    )


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def ar_forward(
    params: Params,
    cfg: ModelConfig,
    xy: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    remat: bool = False,
    segments=None,
    prefix_flash: Optional[int] = None,
) -> jnp.ndarray:
    """Full-sequence AR decoder pass → hidden states [B, S, D].

    segments + prefix_flash=<static text length> runs attention through the
    prefix-causal Pallas flash kernel instead of materializing the additive
    mask (TPU training fast path)."""
    return L.encoder_stack_apply(
        params["ar_decoder"], xy, cfg.num_heads, mask, remat=remat,
        segments=segments, prefix_flash=prefix_flash,
    )


def ar_logits(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(
        h, params["ar_predict_layer"]["w"].astype(h.dtype),
        preferred_element_type=jnp.float32,
    )


def nar_forward_stage(
    params: Params,
    cfg: ModelConfig,
    xy: jnp.ndarray,
    stage_idx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    segments=None,
    remat: bool = False,
) -> jnp.ndarray:
    """One NAR pass conditioned on stage embedding `stage_idx` (0..6).

    segments=(q_seg, kv_seg) runs attention through the Pallas flash
    kernel instead of the mask (TPU fast path — the NAR mask is pure key
    padding, exactly what segment ids express)."""
    stage_emb = params["nar_stage_embeddings"]["weight"][stage_idx].astype(
        xy.dtype
    )
    return L.encoder_stack_apply(
        params["nar_decoder"], xy, cfg.num_heads, mask, stage_emb, segments,
        remat=remat,
    )


def nar_logits(
    params: Params, h: jnp.ndarray, stage_idx: jnp.ndarray
) -> jnp.ndarray:
    w = params["nar_predict_layers"]["w"][stage_idx].astype(h.dtype)
    return jnp.dot(h, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Two-stage training parameter selection (reference: models/vallex.py:266-292)
# ---------------------------------------------------------------------------

def stage_param_labels(params: Params, stage: int) -> Params:
    """→ pytree of bools marking the parameters trained in `stage`
    (1 = ar_*, 2 = nar_*). For two-stage training map to labels and use
    optax.multi_transform({"train": opt, "freeze": optax.set_to_zero()}, …)
    — optax.masked alone passes raw gradients through unmasked leaves."""
    assert stage in (1, 2)
    prefix = "ar_" if stage == 1 else "nar_"

    def build(tree, under_prefix):
        out = {}
        for k, v in tree.items():
            hit = under_prefix or k.startswith(prefix)
            if isinstance(v, dict):
                out[k] = build(v, hit)
            else:
                out[k] = hit
        return out

    return build(params, False)


def stage_parameters(params: Params, stage: int):
    """Iterator over the arrays selected for `stage` (1=AR, 2=NAR)."""
    labels = stage_param_labels(params, stage)
    import jax

    for arr, keep in zip(jax.tree.leaves(params), jax.tree.leaves(labels)):
        if keep:
            yield arr
