"""JAX Whisper encoder/decoder for transcript-less `make_prompt`.

The reference transcribes enrollment clips with openai-whisper medium
(reference utils/prompt_making.py:32-55, 87-109: detect_language + decode).
This is a TPU-native port of the Whisper architecture: log-mel front end as
DFT matmuls (no FFT ops — XLA's TPU FFT lowering is slow, see
codec/fbank.py), a jitted encoder over the fixed 30 s / 3000-frame chunk
(static shapes), and a KV-cached greedy decoder driven by lax.while_loop.

Weights are converted from a HuggingFace Whisper checkpoint
(convert_hf_state_dict); this image has no network egress, so the live
transcription path stays weights-gated (utils/whisper_transcribe.py) while
the architecture itself is verified against a reconstructed random-init
torch model in tests/test_whisper.py.

Architecture facts reproduced (openai/whisper; HF WhisperModel):
  - mel: 16 kHz, n_fft 400, hop 160, hann, 80 slaney mel banks to 8 kHz,
    log10, floor at max-8, (x+4)/4;
  - encoder: conv(80→d,k3,s1) GELU, conv(d→d,k3,s2) GELU, +sinusoidal PE,
    pre-norm blocks (MHA + 4d GELU MLP), final LN;
  - decoder: token emb + LEARNED positional emb, pre-norm blocks with
    causal self-attn, cross-attn over the encoder states, 4d GELU MLP,
    final LN, logits tied to the token embedding;
  - attention: q scaled by hd^-0.5; k projection has NO bias.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
N_FRAMES = 3000  # 30 s


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 1024  # medium
    num_heads: int = 16
    encoder_layers: int = 24
    decoder_layers: int = 24
    vocab: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (multilingual vocab)
    eot: int = 50257
    sot: int = 50258
    translate: int = 50358
    transcribe: int = 50359
    no_timestamps: int = 50363
    lang_base: int = 50259  # <|en|>; language tokens are contiguous

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


# Whisper's language-token order (openai/whisper tokenizer LANGUAGES);
# token id = lang_base + index.
_LANG_ORDER = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el "
    "ms cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az "
    "sl kn et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af "
    "oc ka be tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as "
    "tt haw ln ha ba jw su"
).split()


def lang_token(cfg: WhisperConfig, lang: str) -> int:
    return cfg.lang_base + _LANG_ORDER.index(lang)


def token_lang(cfg: WhisperConfig, token: int) -> str:
    return _LANG_ORDER[token - cfg.lang_base]


# --------------------------------------------------------------------------
# log-mel front end (DFT matmuls)
# --------------------------------------------------------------------------


def _mel_filters() -> np.ndarray:
    """80 slaney-normalized slaney-scale mel filters, 201 fft bins → [80, 201]
    (matches librosa.filters.mel(16000, 400, n_mels=80) used by Whisper)."""
    n_freqs = N_FFT // 2 + 1
    fft_freqs = np.linspace(0, SAMPLE_RATE / 2, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / 200.0 * 3.0
        log_step = math.log(6.4) / 27.0
        above = f >= 1000.0
        mel = np.where(above, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / log_step, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_step = math.log(6.4) / 27.0
        above = m >= 15.0
        return np.where(above, 1000.0 * np.exp(log_step * (m - 15.0)), f)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), N_MELS + 2))
    fb = np.zeros((N_MELS, n_freqs))
    for i in range(N_MELS):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def log_mel_spectrogram(wav: jnp.ndarray) -> jnp.ndarray:
    """16 kHz waveform [480000] (30 s, pre-padded/truncated) →
    log-mel [80, 3000] exactly as Whisper's front end computes it."""
    # center=True reflect padding
    x = jnp.pad(wav.astype(jnp.float32), (N_FFT // 2, N_FFT // 2), "reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP  # 3001 for 30 s
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[idx]  # [F, 400]
    window = jnp.asarray(
        np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    )
    frames = frames * window[None, :]
    k = np.arange(N_FFT // 2 + 1)
    n = np.arange(N_FFT)
    ang = 2.0 * np.pi * np.outer(n, k) / N_FFT
    cos_m = jnp.asarray(np.cos(ang), jnp.float32)  # [400, 201]
    sin_m = jnp.asarray(-np.sin(ang), jnp.float32)
    re = frames @ cos_m
    im = frames @ sin_m
    power = re * re + im * im  # [F, 201]
    power = power[:-1]  # whisper drops the last frame → 3000
    mel = power @ jnp.asarray(_mel_filters()).T  # [F, 80]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # [80, 3000]


def pad_or_trim(wav: np.ndarray, length: int = SAMPLE_RATE * 30) -> np.ndarray:
    if len(wav) >= length:
        return wav[:length]
    return np.pad(wav, (0, length - len(wav)))


# --------------------------------------------------------------------------
# parameters
# --------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's encoder positional table (openai/whisper model.py)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def _init_attn(key, d: int) -> Params:
    ks = jax.random.split(key, 4)
    s = 1.0 / math.sqrt(d)
    return {
        "q_w": jax.random.normal(ks[0], (d, d)) * s,
        "q_b": jnp.zeros((d,)),
        "k_w": jax.random.normal(ks[1], (d, d)) * s,  # no bias (whisper)
        "v_w": jax.random.normal(ks[2], (d, d)) * s,
        "v_b": jnp.zeros((d,)),
        "o_w": jax.random.normal(ks[3], (d, d)) * s,
        "o_b": jnp.zeros((d,)),
    }


def _init_block(key, d: int, cross: bool) -> Params:
    ks = jax.random.split(key, 4)
    s = 1.0 / math.sqrt(d)
    p = {
        "self_attn": _init_attn(ks[0], d),
        "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "fc1_w": jax.random.normal(ks[1], (d, 4 * d)) * s,
        "fc1_b": jnp.zeros((4 * d,)),
        "fc2_w": jax.random.normal(ks[2], (4 * d, d)) * s,
        "fc2_b": jnp.zeros((d,)),
        "ln_mlp": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], d)
        p["ln_cross"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return p


def init_whisper(key, cfg: WhisperConfig) -> Params:
    ks = jax.random.split(key, 8)
    d = cfg.d_model
    enc_blocks = [
        _init_block(k, d, cross=False)
        for k in jax.random.split(ks[0], cfg.encoder_layers)
    ]
    dec_blocks = [
        _init_block(k, d, cross=True)
        for k in jax.random.split(ks[1], cfg.decoder_layers)
    ]
    return {
        "conv1_w": jax.random.normal(ks[2], (3, N_MELS, d)) * 0.05,
        "conv1_b": jnp.zeros((d,)),
        "conv2_w": jax.random.normal(ks[3], (3, d, d)) * 0.05,
        "conv2_b": jnp.zeros((d,)),
        "enc_pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
        "enc_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *enc_blocks),
        "enc_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "tok_emb": jax.random.normal(ks[4], (cfg.vocab, d)) * 0.02,
        "dec_pos": jax.random.normal(ks[5], (cfg.max_target_positions, d))
        * 0.02,
        "dec_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *dec_blocks),
        "dec_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _ln(p, x):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]


def _heads(x, h):
    t, d = x.shape
    return x.reshape(t, h, d // h).transpose(1, 0, 2)  # [H, T, hd]


def _attn(p, q_x, kv_x, h, mask=None):
    """q_x [Tq, D], kv_x [Tk, D] → [Tq, D]."""
    hd = q_x.shape[-1] // h
    q = _heads(q_x @ p["q_w"] + p["q_b"], h) * (hd ** -0.5)
    k = _heads(kv_x @ p["k_w"], h)
    v = _heads(kv_x @ p["v_w"] + p["v_b"], h)
    s = jnp.einsum("htd,hsd->hts", q, k)
    if mask is not None:
        s = s + mask
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hts,hsd->htd", a, v)
    o = o.transpose(1, 0, 2).reshape(q_x.shape[0], -1)
    return o @ p["o_w"] + p["o_b"]


def _mlp(p, x):
    return jax.nn.gelu(x @ p["fc1_w"] + p["fc1_b"], approximate=False) @ p[
        "fc2_w"
    ] + p["fc2_b"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [80, 3000] → encoder states [1500, D]."""
    x = mel.T  # [3000, 80]
    # conv1 k3 s1 p1
    xp = jnp.pad(x, ((1, 1), (0, 0)))
    w1 = params["conv1_w"]  # [3, 80, D]
    y = (
        xp[:-2] @ w1[0] + xp[1:-1] @ w1[1] + xp[2:] @ w1[2]
        + params["conv1_b"]
    )
    y = jax.nn.gelu(y, approximate=False)
    # conv2 k3 s2 p1
    yp = jnp.pad(y, ((1, 1), (0, 0)))
    w2 = params["conv2_w"]
    idx = jnp.arange(cfg.max_source_positions) * 2
    y = (
        yp[idx] @ w2[0] + yp[idx + 1] @ w2[1] + yp[idx + 2] @ w2[2]
        + params["conv2_b"]
    )
    y = jax.nn.gelu(y, approximate=False)
    h = y + params["enc_pos"]

    def block(h, bp):
        h = h + _attn(bp["self_attn"], _ln(bp["ln1"], h), _ln(bp["ln1"], h),
                      cfg.num_heads)
        h = h + _mlp(bp, _ln(bp["ln_mlp"], h))
        return h, None

    h, _ = jax.lax.scan(block, h, params["enc_blocks"])
    return _ln(params["enc_ln"], h)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decoder_forward(
    params: Params, cfg: WhisperConfig, tokens: jnp.ndarray,
    enc: jnp.ndarray,
) -> jnp.ndarray:
    """Teacher-forced full-sequence decoder: tokens [T] → logits [T, vocab]."""
    T = tokens.shape[0]
    h = params["tok_emb"][tokens] + params["dec_pos"][:T]
    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, -1e30
    )[None]

    def block(h, bp):
        hn = _ln(bp["ln1"], h)
        h = h + _attn(bp["self_attn"], hn, hn, cfg.num_heads, causal)
        h = h + _attn(
            bp["cross_attn"], _ln(bp["ln_cross"], h), enc, cfg.num_heads
        )
        h = h + _mlp(bp, _ln(bp["ln_mlp"], h))
        return h, None

    h, _ = jax.lax.scan(block, h, params["dec_blocks"])
    h = _ln(params["dec_ln"], h)
    return h @ params["tok_emb"].T


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "prefix_len"))
def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,  # [1500, D]
    prefix: jnp.ndarray,  # [prefix_len] sot sequence
    *,
    prefix_len: int,
    max_len: int = 224,
) -> jnp.ndarray:
    """KV-cached greedy decode → token buffer [max_len] (eot-filled tail).

    ASR is not the TTS hot path (once per make_prompt), so the decoder step
    is plain XLA: scan over layers with a preallocated cache, lax.while_loop
    over positions, no host round-trips.
    """
    d = cfg.d_model
    h_heads = cfg.num_heads
    NL = cfg.decoder_layers

    # cross-attention K/V once per layer
    def cross_kv(bp):
        k = enc @ bp["cross_attn"]["k_w"]
        v = enc @ bp["cross_attn"]["v_w"] + bp["cross_attn"]["v_b"]
        return k, v

    cross_k, cross_v = jax.lax.map(
        lambda bp: cross_kv(bp), params["dec_blocks"]
    )  # [NL, 1500, D]

    cache_k = jnp.zeros((NL, max_len, d), jnp.float32)
    cache_v = jnp.zeros((NL, max_len, d), jnp.float32)
    buf = jnp.full((max_len,), cfg.eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prefix.astype(jnp.int32), (0,))

    def step(carry):
        buf, cache_k, cache_v, pos, done = carry
        tok = buf[pos]
        x = params["tok_emb"][tok] + params["dec_pos"][pos]  # [D]
        x = x[None]  # [1, D]

        def block(x_and_caches, inp):
            x, = x_and_caches
            bp, ck, cv, xk, xv = inp
            hn = _ln(bp["ln1"], x)
            q = _heads(hn @ bp["self_attn"]["q_w"] + bp["self_attn"]["q_b"],
                       h_heads) * (d // h_heads) ** -0.5
            k_new = hn @ bp["self_attn"]["k_w"]
            v_new = hn @ bp["self_attn"]["v_w"] + bp["self_attn"]["v_b"]
            ck = jax.lax.dynamic_update_slice(ck, k_new, (pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_new, (pos, 0))
            kh = _heads(ck, h_heads)  # [H, max_len, hd]
            vh = _heads(cv, h_heads)
            s = jnp.einsum("htd,hsd->hts", q, kh)
            s = jnp.where(
                jnp.arange(max_len)[None, None, :] <= pos, s, -1e30
            )
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hts,hsd->htd", a, vh)
            o = o.transpose(1, 0, 2).reshape(1, -1)
            x = x + o @ bp["self_attn"]["o_w"] + bp["self_attn"]["o_b"]
            # cross attention
            hc = _ln(bp["ln_cross"], x)
            qc = _heads(hc @ bp["cross_attn"]["q_w"]
                        + bp["cross_attn"]["q_b"], h_heads) * (
                d // h_heads
            ) ** -0.5
            khc = _heads(xk, h_heads)
            vhc = _heads(xv, h_heads)
            sc = jnp.einsum("htd,hsd->hts", qc, khc)
            ac = jax.nn.softmax(sc, axis=-1)
            oc = jnp.einsum("hts,hsd->htd", ac, vhc)
            oc = oc.transpose(1, 0, 2).reshape(1, -1)
            x = x + oc @ bp["cross_attn"]["o_w"] + bp["cross_attn"]["o_b"]
            x = x + _mlp(bp, _ln(bp["ln_mlp"], x))
            return (x,), (ck, cv)

        (x,), (cache_k, cache_v) = jax.lax.scan(
            block, (x,),
            (params["dec_blocks"], cache_k, cache_v, cross_k, cross_v),
        )
        x = _ln(params["dec_ln"], x)
        logits = (x @ params["tok_emb"].T)[0]
        nxt = jnp.argmax(logits).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eot, nxt)
        buf = jnp.where(
            jnp.arange(max_len) == pos + 1, nxt, buf
        )
        done = jnp.logical_or(done, nxt == cfg.eot)
        return buf, cache_k, cache_v, pos + 1, done

    def cond(carry):
        _, _, _, pos, done = carry
        return jnp.logical_and(pos < max_len - 1, ~done)

    # fill the cache for the prefix tokens first (teacher-forced steps)
    carry = (buf, cache_k, cache_v, jnp.asarray(0), jnp.asarray(False))
    for _ in range(prefix_len - 1):
        b, ck, cv, pos, done = step(carry)
        # prefix tokens are fixed: keep buf as-is
        carry = (buf, ck, cv, pos, jnp.asarray(False))
    buf, cache_k, cache_v, pos, done = carry
    final = jax.lax.while_loop(
        cond, step, (buf, cache_k, cache_v, pos, done)
    )
    return final[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "prefix_len", "best_of"),
)
def sampled_decode(
    params: Params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,  # [1500, D]
    prefix: jnp.ndarray,  # [prefix_len] sot sequence
    rng: jax.Array,
    *,
    prefix_len: int,
    max_len: int,
    best_of: int = 5,
    temperature: float = 1.0,
) -> tuple:
    """KV-cached SAMPLED decode with best_of independent lanes — the
    reference's transcription mode (utils/prompt_making.py:46:
    DecodingOptions(temperature=1.0, best_of=5, sample_len=150)).

    Replicates openai-whisper's GreedyDecoder.update semantics at
    temperature > 0: the next token is drawn from Categorical(logits /
    temperature); the accumulated score uses the UNSCALED log-softmax
    (whisper/decoding.py GreedyDecoder — sampling and scoring use
    different temperatures); once a lane emits eot every later token is
    forced eot and scoring stops (the eot logprob itself IS counted).

    → (buf [best_of, max_len] token buffers, sum_logprobs [best_of])."""
    d = cfg.d_model
    h_heads = cfg.num_heads
    hd = d // h_heads
    NL = cfg.decoder_layers
    B = best_of
    S = cfg.max_source_positions

    def cross_kv(bp):
        k = enc @ bp["cross_attn"]["k_w"]
        v = enc @ bp["cross_attn"]["v_w"] + bp["cross_attn"]["v_b"]
        return k, v

    cross_k, cross_v = jax.lax.map(
        lambda bp: cross_kv(bp), params["dec_blocks"]
    )  # [NL, 1500, D]

    cache_k = jnp.zeros((NL, B, max_len, d), jnp.float32)
    cache_v = jnp.zeros((NL, B, max_len, d), jnp.float32)
    buf = jnp.full((B, max_len), cfg.eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.broadcast_to(prefix.astype(jnp.int32), (B, prefix_len)),
        (0, 0),
    )

    def step(carry):
        buf, cache_k, cache_v, pos, done, sum_lp, rng = carry
        tok = buf[:, pos]  # [B]
        x = params["tok_emb"][tok] + params["dec_pos"][pos]  # [B, D]

        def block(x_c, inp):
            x, = x_c
            bp, ck, cv, xk, xv = inp  # ck/cv [B, max_len, d]
            hn = _ln(bp["ln1"], x)
            q = (hn @ bp["self_attn"]["q_w"] + bp["self_attn"]["q_b"])
            q = q.reshape(B, h_heads, hd) * hd ** -0.5
            k_new = hn @ bp["self_attn"]["k_w"]
            v_new = hn @ bp["self_attn"]["v_w"] + bp["self_attn"]["v_b"]
            ck = jax.lax.dynamic_update_slice(ck, k_new[:, None], (0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_new[:, None], (0, pos, 0))
            kh = ck.reshape(B, max_len, h_heads, hd)
            vh = cv.reshape(B, max_len, h_heads, hd)
            s = jnp.einsum("bhd,bshd->bhs", q, kh)
            s = jnp.where(jnp.arange(max_len)[None, None, :] <= pos, s, -1e30)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhs,bshd->bhd", a, vh).reshape(B, d)
            x = x + o @ bp["self_attn"]["o_w"] + bp["self_attn"]["o_b"]
            # cross attention (encoder states shared across lanes)
            hc = _ln(bp["ln_cross"], x)
            qc = (hc @ bp["cross_attn"]["q_w"] + bp["cross_attn"]["q_b"])
            qc = qc.reshape(B, h_heads, hd) * hd ** -0.5
            khc = xk.reshape(S, h_heads, hd)
            vhc = xv.reshape(S, h_heads, hd)
            sc = jnp.einsum("bhd,shd->bhs", qc, khc)
            ac = jax.nn.softmax(sc, axis=-1)
            oc = jnp.einsum("bhs,shd->bhd", ac, vhc).reshape(B, d)
            x = x + oc @ bp["cross_attn"]["o_w"] + bp["cross_attn"]["o_b"]
            x = x + _mlp(bp, _ln(bp["ln_mlp"], x))
            return (x,), (ck, cv)

        (x,), (cache_k, cache_v) = jax.lax.scan(
            block, (x,),
            (params["dec_blocks"], cache_k, cache_v, cross_k, cross_v),
        )
        x = _ln(params["dec_ln"], x)
        logits = x @ params["tok_emb"].T  # [B, vocab]
        rng, step_rng = jax.random.split(rng)
        t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
        nxt = jax.random.categorical(step_rng, logits / t, axis=-1)
        nxt = nxt.astype(jnp.int32)
        lp = jax.nn.log_softmax(logits, axis=-1)  # UNSCALED (whisper)
        cur_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
        sum_lp = sum_lp + cur_lp * (~done)
        nxt = jnp.where(done, cfg.eot, nxt)
        buf = jnp.where(
            (jnp.arange(max_len)[None] == pos + 1), nxt[:, None], buf
        )
        done = jnp.logical_or(done, nxt == cfg.eot)
        return buf, cache_k, cache_v, pos + 1, done, sum_lp, rng

    def cond(carry):
        _, _, _, pos, done, _, _ = carry
        return jnp.logical_and(pos < max_len - 1, ~jnp.all(done))

    # teacher-forced prefix steps: fill caches, discard samples/scores
    carry = (
        buf, cache_k, cache_v, jnp.asarray(0),
        jnp.zeros((B,), bool), jnp.zeros((B,), jnp.float32), rng,
    )
    for _ in range(prefix_len - 1):
        _, ck, cv, pos, _, _, rng_c = step(carry)
        carry = (
            buf, ck, cv, pos, jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.float32), rng_c,
        )
    final = jax.lax.while_loop(cond, step, carry)
    return final[0], final[5]


def rank_samples(
    buf: np.ndarray,  # [B, max_len]
    sum_logprobs: np.ndarray,  # [B]
    *,
    prefix_len: int,
    eot: int,
) -> int:
    """openai-whisper MaximumLikelihoodRanker with length_penalty=None:
    score each lane by sum_logprobs / length, length = sampled tokens
    before the first eot. → best lane index."""
    scores = []
    for b in range(buf.shape[0]):
        ids = buf[b, prefix_len:]
        nz = np.nonzero(ids == eot)[0]
        length = int(nz[0]) if len(nz) else len(ids)
        scores.append(float(sum_logprobs[b]) / max(length, 1))
    return int(np.argmax(scores))


def detect_language(
    params: Params, cfg: WhisperConfig, enc: jnp.ndarray
) -> int:
    """→ language token id with the highest probability after <|sot|>
    (reference: whisper detect_language; prompt_making.py:40-44)."""
    logits = decoder_forward(
        params, cfg, jnp.asarray([cfg.sot], jnp.int32), enc
    )[0]
    n_langs = len(_LANG_ORDER)
    lang_logits = logits[cfg.lang_base : cfg.lang_base + n_langs]
    return int(jnp.argmax(lang_logits)) + cfg.lang_base


def transcribe_ids(
    params: Params,
    cfg: WhisperConfig,
    wav: np.ndarray,  # 16 kHz mono, any length (pad/trim to 30 s)
    *,
    language: str | None = None,
    max_len: int = 224,
    temperature: float = 0.0,
    best_of: int = 1,
    sample_len: int | None = None,
    seed: int = 0,
):
    """→ (token ids after the sot sequence, detected language code).

    temperature == 0 → KV-cached greedy decode. temperature > 0 →
    best_of independent sample lanes at that temperature, ranked by
    average logprob — the reference's transcription mode
    (utils/prompt_making.py:46: temperature=1.0, best_of=5,
    sample_len=150)."""
    mel = log_mel_spectrogram(jnp.asarray(pad_or_trim(np.asarray(wav))))
    enc = encode(params, cfg, mel)
    if language is None:
        lang_id = detect_language(params, cfg, enc)
    else:
        lang_id = lang_token(cfg, language)
    prefix = jnp.asarray(
        [cfg.sot, lang_id, cfg.transcribe, cfg.no_timestamps], jnp.int32
    )
    if temperature > 0.0:
        sl = sample_len if sample_len is not None else max_len - 4
        buf, sum_lp = sampled_decode(
            params, cfg, enc, prefix, jax.random.PRNGKey(seed),
            prefix_len=4, max_len=4 + sl + 1, best_of=best_of,
            temperature=float(temperature),
        )
        buf = np.asarray(buf)
        best = rank_samples(
            buf, np.asarray(sum_lp), prefix_len=4, eot=cfg.eot
        )
        ids = buf[best, 4:]
    else:
        buf = greedy_decode(
            params, cfg, enc, prefix, prefix_len=4, max_len=max_len
        )
        ids = np.asarray(buf)[4:]
    ids = ids[ids != cfg.eot]
    return ids, token_lang(cfg, lang_id)


# --------------------------------------------------------------------------
# HF checkpoint conversion
# --------------------------------------------------------------------------


def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: WhisperConfig) -> Params:
    """HuggingFace WhisperModel/WhisperForConditionalGeneration state dict
    (numpy arrays) → this module's pytree."""
    g = lambda k: jnp.asarray(sd[k])  # noqa: E731
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def attn(p):
        return {
            "q_w": g(f"{p}.q_proj.weight").T,
            "q_b": g(f"{p}.q_proj.bias"),
            "k_w": g(f"{p}.k_proj.weight").T,
            "v_w": g(f"{p}.v_proj.weight").T,
            "v_b": g(f"{p}.v_proj.bias"),
            "o_w": g(f"{p}.out_proj.weight").T,
            "o_b": g(f"{p}.out_proj.bias"),
        }

    def ln(p):
        return {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}

    def block(p, cross):
        out = {
            "self_attn": attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "fc1_w": g(f"{p}.fc1.weight").T,
            "fc1_b": g(f"{p}.fc1.bias"),
            "fc2_w": g(f"{p}.fc2.weight").T,
            "fc2_b": g(f"{p}.fc2.bias"),
            "ln_mlp": ln(f"{p}.final_layer_norm"),
        }
        if cross:
            out["cross_attn"] = attn(f"{p}.encoder_attn")
            out["ln_cross"] = ln(f"{p}.encoder_attn_layer_norm")
        return out

    enc_blocks = [
        block(f"{pre}encoder.layers.{i}", cross=False)
        for i in range(cfg.encoder_layers)
    ]
    dec_blocks = [
        block(f"{pre}decoder.layers.{i}", cross=True)
        for i in range(cfg.decoder_layers)
    ]
    return {
        # HF conv weight [D, in, 3] → [3, in, D]
        "conv1_w": jnp.transpose(g(f"{pre}encoder.conv1.weight"), (2, 1, 0)),
        "conv1_b": g(f"{pre}encoder.conv1.bias"),
        "conv2_w": jnp.transpose(g(f"{pre}encoder.conv2.weight"), (2, 1, 0)),
        "conv2_b": g(f"{pre}encoder.conv2.bias"),
        "enc_pos": g(f"{pre}encoder.embed_positions.weight"),
        "enc_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *enc_blocks),
        "enc_ln": ln(f"{pre}encoder.layer_norm"),
        "tok_emb": g(f"{pre}decoder.embed_tokens.weight"),
        "dec_pos": g(f"{pre}decoder.embed_positions.weight"),
        "dec_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *dec_blocks),
        "dec_ln": ln(f"{pre}decoder.layer_norm"),
    }
