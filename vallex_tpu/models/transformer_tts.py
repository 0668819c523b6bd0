"""Seq2seq Transformer TTS (text → mel-spectrogram) for pipeline debugging.

JAX counterpart of the reference's debug model (models/transformer.py:41-394,
after "Neural Speech Synthesis with Transformer Network"): a text encoder, a
mel decoder with cross attention, a mel projection head and a stop-token
head. Training = masked MSE on mels + BCE on stop logits
(reference forward, models/transformer.py:222-318); inference = greedy
frame-by-frame decoding until the stop head fires
(models/transformer.py:320-385).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import NUM_MEL_BINS, ModelConfig
from . import layers as L
from .vallex import NEG_INF

Params = Dict[str, Any]


def init_transformer_tts(key, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 6)
    return {
        "text_embedding": L.init_embedding(
            ks[0], cfg.num_text_tokens, cfg.d_model
        ),
        "encoder_position": {"alpha": jnp.ones(())},
        "decoder_position": {"alpha": jnp.ones(())},
        "decoder_prenet": L.init_linear(ks[1], NUM_MEL_BINS, cfg.d_model),
        "encoder": L.init_encoder_stack(
            ks[2], cfg.num_layers, cfg.d_model, cfg.ffn_dim, adaptive=False
        ),
        "decoder": L.init_decoder_stack(
            ks[3], cfg.num_layers, cfg.d_model, cfg.ffn_dim, adaptive=False
        ),
        "predict_layer": L.init_linear(ks[4], cfg.d_model, NUM_MEL_BINS),
        "stop_layer": L.init_linear(ks[5], cfg.d_model, 1),
    }


def _encode(params, cfg, text_ids, x_len, dtype):
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    x = L.embedding_apply(params["text_embedding"], text_ids, dtype)
    x = L.sine_pe_apply(pe, params["encoder_position"]["alpha"], x)
    S = text_ids.shape[1]
    # x_len: scalar or [B, 1] → key mask [B or 1, 1, 1, S]
    ok = jnp.arange(S)[None, :] < jnp.reshape(x_len, (-1, 1))
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    memory = L.encoder_stack_apply(params["encoder"], x, cfg.num_heads, mask)
    return memory, mask


def forward(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    x_lens: jnp.ndarray,  # [B]
    mels: jnp.ndarray,  # [B, T, 100]
    mel_lens: jnp.ndarray,  # [B]
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Teacher-forced training loss: masked mel MSE + stop BCE."""
    B, T, _ = mels.shape
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    memory, cross_mask = _encode(params, cfg, text_ids, x_lens, dtype)

    # decoder input: mel frames shifted right (zero first frame)
    dec_in = jnp.concatenate(
        [jnp.zeros_like(mels[:, :1]), mels[:, :-1]], axis=1
    )
    h = L.linear_apply(params["decoder_prenet"], dec_in.astype(dtype))
    h = L.sine_pe_apply(pe, params["decoder_position"]["alpha"], h)
    rows = jnp.arange(T)
    causal = jnp.where(
        rows[None, :] <= rows[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[None, None]
    valid = jnp.where(
        rows[None, :] < mel_lens[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[:, None, None, :]
    h = L.decoder_stack_apply(
        params["decoder"], h, memory, cfg.num_heads, causal + valid,
        cross_mask,
    )
    mel_pred = L.linear_apply(params["predict_layer"], h)
    stop_logits = L.linear_apply(params["stop_layer"], h)[..., 0]

    frame_mask = (rows[None, :] < mel_lens[:, None]).astype(jnp.float32)
    mse = jnp.sum(
        jnp.mean((mel_pred - mels.astype(dtype)) ** 2, -1) * frame_mask
    ) / jnp.maximum(jnp.sum(frame_mask), 1.0)
    stop_target = (rows[None, :] == (mel_lens[:, None] - 1)).astype(
        jnp.float32
    )
    bce = jnp.sum(
        (
            jnp.maximum(stop_logits, 0)
            - stop_logits * stop_target
            + jnp.log1p(jnp.exp(-jnp.abs(stop_logits)))
        )
        * frame_mask
    ) / jnp.maximum(jnp.sum(frame_mask), 1.0)
    loss = mse + bce
    return loss, {"mel_mse": mse, "stop_bce": bce}


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames"))
def inference(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [1, S]
    x_len: jnp.ndarray,
    *,
    max_frames: int = 1000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy frame-by-frame decoding → (mels [1, max_frames, 100], n_frames)."""
    dtype = jnp.float32
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    memory, cross_mask = _encode(params, cfg, text_ids, x_len, dtype)
    rows = jnp.arange(max_frames)
    causal = jnp.where(
        rows[None, :] <= rows[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[None, None]

    mels = jnp.zeros((1, max_frames, NUM_MEL_BINS), dtype)

    def cond(c):
        mels, pos, done = c
        return jnp.logical_and(~done, pos < max_frames)

    def body(c):
        mels, pos, done = c
        dec_in = jnp.concatenate(
            [jnp.zeros_like(mels[:, :1]), mels[:, :-1]], axis=1
        )
        h = L.linear_apply(params["decoder_prenet"], dec_in)
        h = L.sine_pe_apply(pe, params["decoder_position"]["alpha"], h)
        valid = jnp.where(
            rows <= pos, 0.0, NEG_INF
        ).astype(jnp.float32)[None, None, None, :]
        h = L.decoder_stack_apply(
            params["decoder"], h, memory, cfg.num_heads, causal + valid,
            cross_mask,
        )
        frame = L.linear_apply(params["predict_layer"], h[:, pos])
        stop = L.linear_apply(params["stop_layer"], h[:, pos])[0, 0]
        mels = jax.lax.dynamic_update_slice(mels, frame[:, None], (0, pos, 0))
        return (mels, pos + 1, stop > 0)

    mels, n, _ = jax.lax.while_loop(cond, body, (mels, jnp.int32(0), False))
    return mels, n
