"""EnCodec 24 kHz codec (SEANet encoder/decoder + RVQ) in JAX.

TPU-native replacement for the `encodec` package the reference wraps in
`AudioTokenizer` (data/tokenizer.py:63-111): 24 kHz mono, 6 kbps target
bandwidth ⇒ 8 codebooks × 1024 bins at 75 frames/s (320-sample hop).

Architecture (encodec_model_24khz, causal/streaming variant):
  encoder: Conv1d(1→32, k7) → per ratio r ∈ [2,4,5,8]:
      [ResidualUnit(C): ELU→Conv(k3, C→C/2)→ELU→Conv(k1, C/2→C),
       added to a 1×1 conv shortcut of the input (the 24 kHz model uses
       conv shortcuts, not identity — see the reference's
       remove_encodec_weight_norm touching shortcut.conv.conv,
       data/tokenizer.py:41-46),
       then ELU → Conv(C→2C, k=2r, stride=r)]  (channels 32→…→512)
      → 2-layer LSTM (residual skip) → ELU → Conv1d(512→128, k7)
  quantizer: residual VQ, nearest-neighbour per stage over 128-d codebooks
  decoder: mirror with transposed convs (k=2r, stride r), ratios [8,5,4,2]

All convs are causal with REFLECT left padding of (K_eff - stride) samples
(encodec's SConv1d pad_mode='reflect', causal=True). Weight-norm from torch
checkpoints is fused into plain kernels at conversion time — reproducing
the reference's `remove_encodec_weight_norm` determinism trick
(data/tokenizer.py:33-60).

Layout is channels-last [B, T, C]; conv kernels [K, Cin, Cout].
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

RATIOS = [8, 5, 4, 2]  # decoder order; encoder uses reversed
N_FILTERS = 32
DIM = 128  # latent dim
LSTM_DIM = 512
NUM_CODEBOOKS = 8
CODEBOOK_SIZE = 1024
HOP = 320  # = prod(RATIOS)
SAMPLE_RATE = 24000


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _causal_conv(x, w, b, stride: int = 1, dilation: int = 1):
    """Causal Conv1d: REFLECT left-pad of K_eff - stride samples, matching
    encodec's SConv1d (causal=True, pad_mode='reflect'). Assumes the input
    length is a multiple of the stride (guaranteed by `encode` padding the
    waveform to a multiple of HOP), so no extra right padding is needed."""
    K = w.shape[0]
    k_eff = (K - 1) * dilation + 1
    pad = max(k_eff - stride, 0)
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b


def _causal_conv_transpose(x, w, b, stride: int):
    """Causal ConvTranspose1d: full transposed conv then trim the right
    (K - stride) samples (encodec trims padding entirely from the right
    in causal mode)."""
    y = jax.lax.conv_transpose(
        x, w,
        strides=(stride,),
        padding="VALID",  # full: (T-1)*stride + K
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    K = w.shape[0]
    trim = K - stride
    if trim > 0:
        y = y[:, :-trim]
    return y + b


def _elu(x):
    return jax.nn.elu(x)


def _lstm_layer(p, x):
    """Single LSTM layer over [B, T, C] via lax.scan (torch gate order
    i, f, g, o). p: {wi [C,4H], wh [H,4H], bi [4H], bh [4H]}."""
    H = p["wh"].shape[0]
    B = x.shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt @ p["wi"] + h @ p["wh"] + p["bi"] + p["bh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def _lstm_apply(p_layers: List[Params], x):
    """2-layer LSTM with residual skip (encodec SLSTM: y = x + lstm(x))."""
    y = x
    for p in p_layers:
        y = _lstm_layer(p, y)
    return x + y


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, k, cin, cout):
    scale = 1.0 / (k * cin) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k, cin, cout), minval=-scale, maxval=scale),
        "b": jax.random.uniform(kb, (cout,), minval=-scale, maxval=scale),
    }


def _lstm_init(key, cin, h):
    ks = jax.random.split(key, 4)
    s = 1.0 / h**0.5
    return {
        "wi": jax.random.uniform(ks[0], (cin, 4 * h), minval=-s, maxval=s),
        "wh": jax.random.uniform(ks[1], (h, 4 * h), minval=-s, maxval=s),
        "bi": jax.random.uniform(ks[2], (4 * h,), minval=-s, maxval=s),
        "bh": jax.random.uniform(ks[3], (4 * h,), minval=-s, maxval=s),
    }


def init_encodec(key) -> Params:
    keys = iter(jax.random.split(key, 64))
    enc: Params = {"init": _conv_init(next(keys), 7, 1, N_FILTERS)}
    ch = N_FILTERS
    enc["stages"] = []
    for r in reversed(RATIOS):
        enc["stages"].append(
            {
                "res_conv1": _conv_init(next(keys), 3, ch, ch // 2),
                "res_conv2": _conv_init(next(keys), 1, ch // 2, ch),
                "shortcut": _conv_init(next(keys), 1, ch, ch),
                "down": _conv_init(next(keys), 2 * r, ch, 2 * ch),
            }
        )
        ch *= 2
    enc["lstm"] = [_lstm_init(next(keys), ch, ch), _lstm_init(next(keys), ch, ch)]
    enc["final"] = _conv_init(next(keys), 7, ch, DIM)

    dec: Params = {"init": _conv_init(next(keys), 7, DIM, ch)}
    dec["lstm"] = [_lstm_init(next(keys), ch, ch), _lstm_init(next(keys), ch, ch)]
    dec["stages"] = []
    for r in RATIOS:
        dec["stages"].append(
            {
                "up": _conv_init(next(keys), 2 * r, ch, ch // 2),
                "res_conv1": _conv_init(next(keys), 3, ch // 2, ch // 4),
                "res_conv2": _conv_init(next(keys), 1, ch // 4, ch // 2),
                "shortcut": _conv_init(next(keys), 1, ch // 2, ch // 2),
            }
        )
        ch //= 2
    dec["final"] = _conv_init(next(keys), 7, ch, 1)

    codebooks = jax.random.normal(
        next(keys), (NUM_CODEBOOKS, CODEBOOK_SIZE, DIM)
    )
    return {"encoder": enc, "decoder": dec, "codebooks": codebooks}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def encode_latent(params: Params, wav: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] mono → [B, T, 128] latents (T = ceil(samples/320))."""
    enc = params["encoder"]
    x = wav[..., None]  # [B, S, 1]
    x = _causal_conv(x, enc["init"]["w"], enc["init"]["b"])
    for st, ratio in zip(enc["stages"], reversed(RATIOS)):
        res = _causal_conv(x, st["shortcut"]["w"], st["shortcut"]["b"])
        h = _elu(x)
        h = _causal_conv(h, st["res_conv1"]["w"], st["res_conv1"]["b"])
        h = _elu(h)
        h = _causal_conv(h, st["res_conv2"]["w"], st["res_conv2"]["b"])
        x = res + h
        x = _elu(x)
        x = _causal_conv(x, st["down"]["w"], st["down"]["b"], stride=ratio)
    x = _lstm_apply(enc["lstm"], x)
    x = _elu(x)
    return _causal_conv(x, enc["final"]["w"], enc["final"]["b"])


def rvq_encode(params: Params, latents: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 128] → [B, T, 8] codes (residual nearest-neighbour)."""
    cb = params["codebooks"]
    residual = latents
    codes = []
    for q in range(NUM_CODEBOOKS):
        e = cb[q]  # [1024, 128]
        # ||r - e||² = ||r||² - 2 r·e + ||e||²; argmin over e
        dots = jnp.einsum("btd,nd->btn", residual, e)
        dist = jnp.sum(e**2, -1)[None, None] - 2 * dots
        idx = jnp.argmin(dist, axis=-1)
        codes.append(idx)
        residual = residual - jnp.take(e, idx, axis=0)
    return jnp.stack(codes, axis=-1).astype(jnp.int32)


def rvq_decode(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 8] codes → [B, T, 128] quantized latents."""
    cb = params["codebooks"]
    out = jnp.zeros(codes.shape[:2] + (DIM,), cb.dtype)
    for q in range(NUM_CODEBOOKS):
        out = out + jnp.take(cb[q], codes[..., q], axis=0)
    return out


def decode_wave(params: Params, latents: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 128] quantized latents → [B, T*320] waveform."""
    dec = params["decoder"]
    x = _causal_conv(latents, dec["init"]["w"], dec["init"]["b"])
    x = _lstm_apply(dec["lstm"], x)
    for st, ratio in zip(dec["stages"], RATIOS):
        x = _elu(x)
        x = _causal_conv_transpose(x, st["up"]["w"], st["up"]["b"], ratio)
        res = _causal_conv(x, st["shortcut"]["w"], st["shortcut"]["b"])
        h = _elu(x)
        h = _causal_conv(h, st["res_conv1"]["w"], st["res_conv1"]["b"])
        h = _elu(h)
        h = _causal_conv(h, st["res_conv2"]["w"], st["res_conv2"]["b"])
        x = res + h
    x = _elu(x)
    x = _causal_conv(x, dec["final"]["w"], dec["final"]["b"])
    return x[..., 0]


def encode(params: Params, wav: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → [B, T, 8] codes — the `tokenize_audio` equivalent
    (reference: data/tokenizer.py:99-111). Waveforms are zero-padded on the
    right to a multiple of HOP so every conv stage sees a stride-divisible
    length (encodec pads the final partial frame per-stage instead; only
    the last frame of a non-aligned clip can differ)."""
    rem = wav.shape[-1] % HOP
    if rem:
        wav = jnp.pad(wav, ((0, 0), (0, HOP - rem)))
    return rvq_encode(params, encode_latent(params, wav))


def decode(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 8] → [B, T*320] waveform — `AudioTokenizer.decode`
    (reference: data/tokenizer.py:95-96)."""
    return decode_wave(params, rvq_decode(params, codes))


# ---------------------------------------------------------------------------
# Torch conversion (encodec pip checkpoint, weight-norm fused)
# ---------------------------------------------------------------------------

def _fuse_weight_norm(g, v):
    """weight_norm: w = g * v / ||v|| (norm over all dims but dim 0)."""
    import numpy as np

    v = np.asarray(v, np.float32)
    g = np.asarray(g, np.float32)
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return g * v / norm


def convert_encodec_state_dict(sd: Dict[str, Any]) -> Params:
    """Convert encodec_model_24khz state dict (numpy-ified, torch layouts:
    conv [Cout, Cin, K]) into our pytree, fusing weight norm.

    Module hierarchy per encodec's conv wrappers (SConv1d.conv = NormConv1d,
    NormConv1d.conv = weight-normed nn.Conv1d, so two `.conv` levels; same
    for SConvTranspose1d.convtr.convtr — visible in the reference's
    remove_encodec_weight_norm, data/tokenizer.py:41-60). Verified against
    a reconstructed torch model in tests/test_convert_parity.py."""
    import numpy as np

    def conv(prefix):
        # prefix addresses the SConv1d module; the raw kernel lives two
        # levels down at <prefix>.conv.conv
        base = f"{prefix}.conv.conv"
        if f"{base}.weight_g" in sd:
            w = _fuse_weight_norm(sd[f"{base}.weight_g"], sd[f"{base}.weight_v"])
        else:
            w = np.asarray(sd[f"{base}.weight"], np.float32)
        b = np.asarray(sd[f"{base}.bias"], np.float32)
        return {"w": np.transpose(w, (2, 1, 0)).copy(), "b": b}

    def convtr(prefix):
        base = f"{prefix}.convtr.convtr"
        if f"{base}.weight_g" in sd:
            w = _fuse_weight_norm(sd[f"{base}.weight_g"], sd[f"{base}.weight_v"])
        else:
            w = np.asarray(sd[f"{base}.weight"], np.float32)
        b = np.asarray(sd[f"{base}.bias"], np.float32)
        # torch convtranspose weight [Cin, Cout, K] → [K, Cin, Cout], with a
        # spatial flip: torch ConvTranspose1d is the gradient of conv
        # (out[n] += x[m]·w[k] for n = m·s + k), while lax.conv_transpose
        # with transpose_kernel=False correlates — flipping K makes them
        # equal (verified in tests/test_convert_parity.py)
        return {"w": np.transpose(w, (2, 0, 1))[::-1].copy(), "b": b}

    def lstm(prefix, layer):
        return {
            "wi": np.asarray(sd[f"{prefix}.lstm.weight_ih_l{layer}"], np.float32).T.copy(),
            "wh": np.asarray(sd[f"{prefix}.lstm.weight_hh_l{layer}"], np.float32).T.copy(),
            "bi": np.asarray(sd[f"{prefix}.lstm.bias_ih_l{layer}"], np.float32),
            "bh": np.asarray(sd[f"{prefix}.lstm.bias_hh_l{layer}"], np.float32),
        }

    # encoder module indices in encodec's SEANetEncoder.model Sequential:
    # 0 init conv; per stage [resblock, ELU, downsample] = (1,2,3)…(10,11,12);
    # 13 SLSTM; 14 ELU; 15 final conv
    enc = {"init": conv("encoder.model.0"), "stages": [], "lstm": [], "final": None}
    i = 1
    for r in reversed(RATIOS):
        enc["stages"].append(
            {
                "res_conv1": conv(f"encoder.model.{i}.block.1"),
                "res_conv2": conv(f"encoder.model.{i}.block.3"),
                "shortcut": conv(f"encoder.model.{i}.shortcut"),
                "down": conv(f"encoder.model.{i + 2}"),
            }
        )
        i += 3
    enc["lstm"] = [lstm(f"encoder.model.{i}", 0), lstm(f"encoder.model.{i}", 1)]
    enc["final"] = conv(f"encoder.model.{i + 2}")

    # decoder: 0 init conv; 1 SLSTM; per stage [ELU, convtr, resblock] =
    # (2,3,4)…(11,12,13); 14 ELU; 15 final conv
    dec = {"init": conv("decoder.model.0"), "stages": [], "lstm": [], "final": None}
    dec["lstm"] = [lstm("decoder.model.1", 0), lstm("decoder.model.1", 1)]
    i = 3
    for r in RATIOS:
        dec["stages"].append(
            {
                "up": convtr(f"decoder.model.{i}"),
                "res_conv1": conv(f"decoder.model.{i + 1}.block.1"),
                "res_conv2": conv(f"decoder.model.{i + 1}.block.3"),
                "shortcut": conv(f"decoder.model.{i + 1}.shortcut"),
            }
        )
        i += 3
    dec["final"] = conv(f"decoder.model.{i}")

    cb = np.stack(
        [
            np.asarray(sd[f"quantizer.vq.layers.{q}._codebook.embed"], np.float32)
            for q in range(NUM_CODEBOOKS)
        ]
    )
    return {"encoder": enc, "decoder": dec, "codebooks": cb}
