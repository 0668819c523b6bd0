"""VALL-F: the decoder-architecture variant of VALL-E.

The reference constructs VALL-F as VALLF with nn.TransformerDecoder layers —
text is cross-attended *memory* rather than a causal prefix
(models/vallex.py:46-49, models/__init__.py:98-136). Its forward/inference
are unimplemented upstream (VALLF.forward raises NotImplementedError); here
the variant is fully functional: parameter init, teacher-forced AR loss and
a jitted greedy/sampled inference loop, plus the 7-stage NAR fill with
AdaLN-conditioned decoder layers.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers as L
from .vallex import NEG_INF

Params = Dict[str, Any]


def init_vallf(key, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 16)
    num_q = cfg.num_quantizers
    nar_audio = jnp.zeros((num_q, cfg.num_audio_tokens + 1, cfg.d_model))
    nar_audio = nar_audio.at[0].set(
        jax.random.normal(ks[4], (cfg.num_audio_tokens + 1, cfg.d_model))
    )
    nar_audio = nar_audio.at[1:, : cfg.num_audio_tokens].set(
        jax.random.normal(
            ks[5], (num_q - 1, cfg.num_audio_tokens, cfg.d_model)
        )
    )
    nar_predict = jnp.transpose(
        nar_audio[2:, : cfg.num_audio_tokens], (0, 2, 1)
    )
    nar_predict = jnp.concatenate(
        [
            nar_predict,
            L._xavier_uniform(ks[6], (1, cfg.d_model, cfg.num_audio_tokens)),
        ],
        axis=0,
    )
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
        "nar_text_position": {"alpha": jnp.ones(())},
        "nar_audio_position": {"alpha": jnp.ones(())},
        "ar_decoder": L.init_decoder_stack(
            ks[7], cfg.num_layers, cfg.d_model, cfg.ffn_dim, adaptive=False
        ),
        "nar_decoder": L.init_decoder_stack(
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
    }


def _text_memory(params: Params, cfg: ModelConfig, text_ids, pe, stack, dtype):
    emb = L.embedding_apply(params[f"{stack}_text_embedding"], text_ids, dtype)
    alpha = params[f"{stack}_text_position"]["alpha"]
    return L.sine_pe_apply(pe, alpha, emb)


@functools.partial(
    jax.jit, static_argnames=("cfg", "t_audio", "compute_dtype")
)
def vallf_ar_generate(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [1, S]
    x_len: jnp.ndarray,
    prompt_cb0: jnp.ndarray,  # [1, Tp_max]
    prompt_len: jnp.ndarray,
    rng: jax.Array,
    temperature: jnp.ndarray,
    greedy: jnp.ndarray,  # bool
    *,
    t_audio: int,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy/sampled AR decode with text as cross-attention memory.

    Per-step full-recompute over the fixed audio buffer (VALL-F is a
    capability-parity variant, not the serving fast path) → (y [1, t_audio],
    gen_len)."""
    dtype = jnp.dtype(compute_dtype)
    S = text_ids.shape[1]
    eos, bos = cfg.eos_id, cfg.bos_id
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    memory = _text_memory(params, cfg, text_ids, pe, "ar", dtype)

    cross_mask = jnp.where(
        jnp.arange(S) < x_len, 0.0, NEG_INF
    ).astype(jnp.float32)[None, None, None, :]

    y_buf = jnp.full((1, t_audio), eos, jnp.int32)
    y_buf = y_buf.at[:, 0].set(bos)
    y_buf = jax.lax.dynamic_update_slice(
        y_buf, prompt_cb0.astype(jnp.int32), (0, 1)
    )

    rows = jnp.arange(t_audio)
    causal = jnp.where(
        rows[None, :] <= rows[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[None, None]

    def cond(c):
        y_buf, pos, done, rng = c
        return jnp.logical_and(~done, pos < t_audio - 1)

    def body(c):
        y_buf, pos, done, rng = c
        rng, step = jax.random.split(rng)
        emb = L.embedding_apply(params["ar_audio_embedding"], y_buf, dtype)
        y_pos = L.sine_pe_apply(pe, params["ar_audio_position"]["alpha"], emb)
        valid = jnp.where(
            rows <= pos, 0.0, NEG_INF
        ).astype(jnp.float32)[None, None, None, :]
        h = L.decoder_stack_apply(
            params["ar_decoder"], y_pos, memory, cfg.num_heads,
            causal + valid, cross_mask,
        )
        logits = jnp.dot(
            h[:, pos], params["ar_predict_layer"]["w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        tok = jnp.where(
            greedy,
            jnp.argmax(logits, -1),
            jax.random.categorical(step, logits / temperature, -1),
        ).astype(jnp.int32)
        y_buf = jax.lax.dynamic_update_slice(y_buf, tok[:, None], (0, pos + 1))
        return (y_buf, pos + 1, jnp.all(tok == eos), rng)

    y_buf, pos, _, _ = jax.lax.while_loop(
        cond, body, (y_buf, prompt_len.astype(jnp.int32), False, rng)
    )
    gen_len = pos - prompt_len.astype(jnp.int32)
    return y_buf, gen_len


@functools.partial(
    jax.jit, static_argnames=("cfg", "t_audio", "compute_dtype")
)
def vallf_nar_generate(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [1, S]
    x_len: jnp.ndarray,
    codes_in: jnp.ndarray,  # [1, t_audio, 8]
    t_len: jnp.ndarray,
    prompt_len: jnp.ndarray,
    *,
    t_audio: int,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """7 NAR passes with AdaLN decoder layers and text memory."""
    dtype = jnp.dtype(compute_dtype)
    S = text_ids.shape[1]
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    memory = _text_memory(params, cfg, text_ids, pe, "nar", dtype)
    emb_tables = params["nar_audio_embeddings"]["weight"]

    rows = jnp.arange(t_audio)[None, :]
    in_prompt = (rows < prompt_len)[..., None]
    in_suffix = jnp.logical_and(rows >= prompt_len, rows < t_len)[..., None]

    y_emb = jnp.take(emb_tables[0], codes_in[..., 0], axis=0).astype(dtype)
    for j in range(1, cfg.num_quantizers):
        ej = jnp.take(emb_tables[j], codes_in[..., j], axis=0).astype(dtype)
        y_emb = y_emb + jnp.where(in_prompt, ej, 0)

    self_mask = jnp.where(
        rows < t_len, 0.0, NEG_INF
    ).astype(jnp.float32)[:, None, None, :]
    cross_mask = jnp.where(
        jnp.arange(S) < x_len, 0.0, NEG_INF
    ).astype(jnp.float32)[None, None, None, :]

    def stage_body(y_emb, stage_idx):
        y_pos = L.sine_pe_apply(
            pe, params["nar_audio_position"]["alpha"], y_emb
        )
        stage_emb = params["nar_stage_embeddings"]["weight"][
            stage_idx
        ].astype(dtype)
        h = L.decoder_stack_apply(
            params["nar_decoder"], y_pos, memory, cfg.num_heads,
            self_mask, cross_mask, stage_emb,
        )
        w = params["nar_predict_layers"]["w"][stage_idx].astype(dtype)
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
        samples = jnp.argmax(logits, -1).astype(jnp.int32)
        es = jnp.take(emb_tables[stage_idx + 1], samples, axis=0).astype(dtype)
        return y_emb + jnp.where(in_suffix, es, 0), samples

    _, stage_codes = jax.lax.scan(
        stage_body, y_emb, jnp.arange(cfg.num_quantizers - 1)
    )
    cb0 = codes_in[..., 0].astype(jnp.int32)[None]
    out = jnp.transpose(
        jnp.concatenate([cb0, stage_codes], axis=0), (1, 2, 0)
    )
    return jnp.where(in_prompt, codes_in.astype(jnp.int32), out)
