"""Vocos vocoder (EnCodec-codes → 24 kHz waveform) in JAX.

Re-implements the `charactr/vocos-encodec-24khz` architecture used by the
reference for waveform synthesis (utils/generation.py:89,147-151):

  codes → features: sum of the EnCodec quantizer's codebook vectors per
      frame (the quantizer "decode" path) → [B, T, 128]
  backbone: embed Conv1d(128→512, k7) + AdaLayerNorm conditioned on a
      bandwidth id (0..3; 6 kbps ⇒ id 2), then 8 ConvNeXt blocks
      (depthwise k7 conv → AdaLayerNorm → pointwise 512→1536 → GELU →
      pointwise 1536→512 → layer-scale γ → residual), final LayerNorm
  head: Linear(512 → n_fft+2) → (log-magnitude, phase) → complex STFT →
      inverse STFT (n_fft=1280, hop=320, Hann window, "same" padding:
      (n_fft-hop)/2 trimmed per side ⇒ T frames → T·hop samples) → waveform

Everything is channels-last [B, T, C] (TPU-friendly; convs lower to MXU
matmuls over the channel dims). The inverse STFT is jnp.fft.irfft +
scatter-free overlap-add (statically shifted hop-strips; TPU scatters
serialize) — an exact match of the vocos package's fold-based ISTFT
including the window-envelope normalization.

Weights load from a converted torch/safetensors checkpoint when available
(utils/checkpoint-style flat npz); random init otherwise.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# charactr/vocos-encodec-24khz hyperparameters
INPUT_CHANNELS = 128
DIM = 512
INTERMEDIATE_DIM = 1536
NUM_LAYERS = 8
N_FFT = 1280
HOP = 320
NUM_BANDWIDTHS = 4
NUM_CODEBOOKS = 8
CODEBOOK_SIZE = 1024


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def init_vocos(key) -> Params:
    ks = jax.random.split(key, NUM_LAYERS + 8)
    blocks = []
    for i in range(NUM_LAYERS):
        k1, k2, k3 = jax.random.split(ks[i], 3)
        blocks.append(
            {
                "dwconv": {
                    "w": _trunc_normal(k1, (7, 1, DIM)),  # [K, 1, C] depthwise
                    "b": jnp.zeros((DIM,)),
                },
                "norm": {  # AdaLayerNorm: per-bandwidth scale/shift tables
                    "scale": jnp.ones((NUM_BANDWIDTHS, DIM)),
                    "shift": jnp.zeros((NUM_BANDWIDTHS, DIM)),
                },
                "pwconv1": {
                    "w": _trunc_normal(k2, (DIM, INTERMEDIATE_DIM)),
                    "b": jnp.zeros((INTERMEDIATE_DIM,)),
                },
                "pwconv2": {
                    "w": _trunc_normal(k3, (INTERMEDIATE_DIM, DIM)),
                    "b": jnp.zeros((DIM,)),
                },
                "gamma": jnp.full((DIM,), 1e-6),
            }
        )
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "codebook_weights": jax.random.normal(
            ks[NUM_LAYERS], (NUM_CODEBOOKS, CODEBOOK_SIZE, INPUT_CHANNELS)
        ),
        "embed": {
            "w": _trunc_normal(ks[NUM_LAYERS + 1], (7, INPUT_CHANNELS, DIM)),
            "b": jnp.zeros((DIM,)),
        },
        "norm": {  # post-embed AdaLayerNorm
            "scale": jnp.ones((NUM_BANDWIDTHS, DIM)),
            "shift": jnp.zeros((NUM_BANDWIDTHS, DIM)),
        },
        "blocks": blocks,
        "final_norm": {"scale": jnp.ones((DIM,)), "bias": jnp.zeros((DIM,))},
        "head": {
            "w": _trunc_normal(ks[NUM_LAYERS + 2], (DIM, N_FFT + 2)),
            "b": jnp.zeros((N_FFT + 2,)),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def codes_to_features(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 8] int codes → [B, T, 128] features (codebook-vector sum).

    Matches EnCodec's RVQ decode (the reference calls
    vocos.codes_to_features, utils/generation.py:148-149).
    """
    cb = params["codebook_weights"]  # [8, 1024, 128]
    feats = jnp.zeros(codes.shape[:2] + (INPUT_CHANNELS,), cb.dtype)
    for q in range(NUM_CODEBOOKS):
        feats = feats + jnp.take(cb[q], codes[..., q], axis=0, mode="clip")
    return feats


def _conv1d_same(x: jnp.ndarray, w: jnp.ndarray, b, groups: int = 1):
    """x [B,T,Cin], w [K,Cin/groups,Cout] → [B,T,Cout], SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + b


def _ada_layer_norm(p, x, bandwidth_id, eps=1e-6):
    scale = p["scale"][bandwidth_id]
    shift = p["shift"][bandwidth_id]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + shift


def _layer_norm(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def backbone_apply(
    params: Params, feats: jnp.ndarray, bandwidth_id: jnp.ndarray,
    t_len=None,
) -> jnp.ndarray:
    """[B, T, 128] → [B, T, 512].

    t_len (scalar or [B], dynamic): rows ≥ t_len are re-zeroed after the
    embed conv and after EVERY block — biases and norm shifts make zero
    inputs nonzero, and without the re-mask those phantom values bleed
    back into the valid tail through each conv's receptive field. With
    the mask, every conv window that straddles the boundary sees exactly
    the zeros a SAME-padded exact-length run would see."""
    if t_len is None:
        mask = lambda x: x  # noqa: E731
    else:
        rows = jnp.arange(feats.shape[1])[None, :, None]
        valid = rows < jnp.reshape(jnp.atleast_1d(t_len), (-1, 1, 1))
        mask = lambda x: jnp.where(valid, x, 0.0)  # noqa: E731

    x = _conv1d_same(feats, params["embed"]["w"], params["embed"]["b"])
    x = mask(_ada_layer_norm(params["norm"], x, bandwidth_id))

    def block_body(x, bp):
        res = x
        h = _conv1d_same(x, bp["dwconv"]["w"], bp["dwconv"]["b"], groups=DIM)
        h = _ada_layer_norm(bp["norm"], h, bandwidth_id)
        h = jnp.dot(h, bp["pwconv1"]["w"]) + bp["pwconv1"]["b"]
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.dot(h, bp["pwconv2"]["w"]) + bp["pwconv2"]["b"]
        return mask(res + bp["gamma"] * h), None

    x, _ = jax.lax.scan(block_body, x, params["blocks"])
    return mask(_layer_norm(params["final_norm"], x))


def istft(
    spec: jnp.ndarray,
    n_fft: int = N_FFT,
    hop: int = HOP,
    padding: str = "same",
    frame_valid=None,
) -> jnp.ndarray:
    """Inverse STFT, Hann window.

    padding="same" matches the vocos package's ISTFT head (its default and
    what charactr/vocos-encodec-24khz ships): trim (n_fft - hop)//2 from
    each end → wave [B, T*hop]. padding="center" matches torch.istft
    (trim n_fft//2) → wave [B, (T-1)*hop].

    spec: complex [B, T, n_fft//2 + 1].
    """
    B, T, _ = spec.shape
    assert n_fft % hop == 0, "overlap-add assumes hop | n_fft"
    R = n_fft // hop  # overlapping frames per hop (4 for Vocos)
    win = jnp.hanning(n_fft + 1)[:-1]  # periodic Hann (torch default)
    # irfft as an explicit DFT matmul: XLA's TPU FFT lowering costs ~50 ms
    # for this shape; the equivalent [T,F]x[F,n_fft] matmuls are sub-ms on
    # the MXU and exact in fp32.
    #   x[n] = 1/N * sum_k w_k (Re X_k cos(2πkn/N) - Im X_k sin(2πkn/N)),
    #   w_k = 2 except w_0 = w_{N/2} = 1  (Hermitian one-sided spectrum)
    F_bins = n_fft // 2 + 1
    k = jnp.arange(F_bins, dtype=jnp.float32)[:, None]
    n = jnp.arange(n_fft, dtype=jnp.float32)[None, :]
    wk = jnp.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    ang = 2.0 * jnp.pi * k * n / n_fft
    c_re = wk * jnp.cos(ang)  # [F, n_fft]
    c_im = -wk * jnp.sin(ang)
    frames = (
        jnp.einsum("btf,fn->btn", jnp.real(spec).astype(jnp.float32), c_re,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("btf,fn->btn", jnp.imag(spec).astype(jnp.float32), c_im,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    ) * win  # [B, T, n_fft]

    out_len = n_fft + hop * (T - 1)
    # frame_valid [B, T] (dynamic): padded-bucket decodes mask phantom
    # frames out of BOTH the overlap-add numerator and the window-envelope
    # denominator — leaving them in the envelope attenuates the last
    # (n_fft - hop) valid samples even when their spectrum is zero
    if frame_valid is not None:
        fv = frame_valid.astype(frames.dtype)  # [B, T]
        frames = frames * fv[:, :, None]
    # scatter-free overlap-add: split each frame into R hop-sized strips and
    # sum the R statically-shifted strip tracks (TPU scatters serialize)
    strips = frames.reshape(B, T, R, hop)
    out_blocks = jnp.zeros((B, T + R - 1, hop), frames.dtype)
    env_strips = (win**2).reshape(R, hop)
    for j in range(R):
        out_blocks = out_blocks.at[:, j : j + T].add(strips[:, :, j])
    wave = out_blocks.reshape(B, out_len)
    if frame_valid is None:
        env_blocks = jnp.zeros((T + R - 1, hop))
        for j in range(R):
            env_blocks = env_blocks.at[j : j + T].add(
                jnp.broadcast_to(env_strips[j], (T, hop))
            )
        env = env_blocks.reshape(out_len)[None]
    else:
        env_blocks = jnp.zeros((B, T + R - 1, hop))
        for j in range(R):
            env_blocks = env_blocks.at[:, j : j + T].add(
                env_strips[j][None, None] * fv[:, :, None]
            )
        env = env_blocks.reshape(B, out_len)
    wave = wave / jnp.maximum(env, 1e-11)
    if padding == "same":
        pad = (n_fft - hop) // 2
    elif padding == "center":
        pad = n_fft // 2
    else:
        raise ValueError(f"unknown istft padding {padding!r}")
    return wave[:, pad : out_len - pad]


def head_apply(
    params: Params, x: jnp.ndarray, frame_valid=None
) -> jnp.ndarray:
    """[B, T, 512] → waveform [B, T*hop] via log-mag/phase ISTFT
    (same-padded, per the shipped Vocos head)."""
    h = jnp.dot(x, params["head"]["w"]) + params["head"]["b"]
    mag, phase = jnp.split(h, 2, axis=-1)
    # exp(clip(·, 100)) matches the reference head, but e^100 × 641 DFT bins
    # overflows fp32 (possible with untrained weights); the extra magnitude
    # clamp keeps the ISTFT finite and is a no-op for trained checkpoints.
    mag = jnp.minimum(jnp.exp(jnp.clip(mag, max=1e2)), 1e30)
    spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return istft(spec, frame_valid=frame_valid)


def vocos_decode(
    params: Params, codes: jnp.ndarray, bandwidth_id: int = 2,
    t_len=None,
) -> jnp.ndarray:
    """[B, T, 8] EnCodec codes → [B, samples] waveform @24 kHz.

    t_len (scalar or [B], dynamic — no recompile per value) marks the
    valid frame count: features beyond it are zeroed BEFORE the conv
    stack. This matters because code id 0 is a real codebook vector, not
    silence — zero-padded code rows would inject phantom features whose
    contamination the convs' receptive field (9 stacked k=7 ConvNeXt
    blocks ≈ ±27 frames) spreads back into the tail of the valid audio.
    Zero FEATURES are the conv stack's true zero boundary."""
    feats = codes_to_features(params, codes)
    fv = None
    if t_len is not None:
        rows = jnp.arange(codes.shape[1])[None, :, None]
        tl = jnp.reshape(jnp.atleast_1d(t_len), (-1, 1, 1))
        feats = jnp.where(rows < tl, feats, 0.0)
        fv = (rows[..., 0] < tl[..., 0])  # [B|1, T]
        fv = jnp.broadcast_to(fv, (codes.shape[0], codes.shape[1]))
    x = backbone_apply(params, feats, jnp.asarray(bandwidth_id), t_len=t_len)
    return head_apply(params, x, frame_valid=fv)


# Frame-count buckets for the jitted decode path (recompile per bucket, not
# per utterance length).
DECODE_BUCKETS = (256, 512, 1024, 2048)

_decode_jit = None


def vocos_decode_bucketed(
    params: Params, codes, bandwidth_id: int = 2
) -> "jnp.ndarray":
    """Jit-compiled decode with zero-padded frame buckets. The valid
    length rides in as a dynamic scalar so padded rows contribute ZERO
    features (see vocos_decode: zero codes are not silence)."""
    global _decode_jit
    import numpy as np

    if _decode_jit is None:
        _decode_jit = jax.jit(
            vocos_decode, static_argnames=("bandwidth_id",)
        )
    codes = np.asarray(codes)
    B, T, Q = codes.shape
    bucket = next((b for b in DECODE_BUCKETS if T <= b), None)
    if bucket is None:
        bucket = T  # beyond the largest bucket: compile exact size
    padded = np.zeros((B, bucket, Q), codes.dtype)
    padded[:, :T] = codes
    wave = _decode_jit(
        params, jnp.asarray(padded), bandwidth_id=bandwidth_id,
        t_len=jnp.asarray(T, jnp.int32),
    )
    return wave[:, : T * HOP]


# ---------------------------------------------------------------------------
# Torch weight conversion (charactr/vocos-encodec-24khz pytorch_model.bin)
# ---------------------------------------------------------------------------

def convert_vocos_state_dict(sd: Dict[str, Any]) -> Params:
    """Convert the HF Vocos torch state dict (numpy-ified) to our pytree.

    Torch layouts: Conv1d weight [Cout, Cin, K] → [K, Cin, Cout]; depthwise
    conv [C, 1, K] → [K, 1, C]; Linear [out, in] → [in, out]; AdaLayerNorm
    scale/shift are embedding tables [num_bw, C].
    """
    import numpy as np

    def conv_w(a):
        return np.ascontiguousarray(np.transpose(np.asarray(a, np.float32), (2, 1, 0)))

    def lin_w(a):
        return np.ascontiguousarray(np.asarray(a, np.float32).T)

    g = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731

    blocks = []
    for i in range(NUM_LAYERS):
        p = f"backbone.convnext.{i}"
        blocks.append(
            {
                "dwconv": {
                    "w": conv_w(g(f"{p}.dwconv.weight")),
                    "b": g(f"{p}.dwconv.bias"),
                },
                "norm": {
                    "scale": g(f"{p}.norm.scale.weight"),
                    "shift": g(f"{p}.norm.shift.weight"),
                },
                "pwconv1": {
                    "w": lin_w(g(f"{p}.pwconv1.weight")),
                    "b": g(f"{p}.pwconv1.bias"),
                },
                "pwconv2": {
                    "w": lin_w(g(f"{p}.pwconv2.weight")),
                    "b": g(f"{p}.pwconv2.bias"),
                },
                "gamma": g(f"{p}.gamma"),
            }
        )
    import numpy as np

    blocks = jax.tree.map(lambda *xs: np.stack(xs), *blocks)

    # EnCodec quantizer codebooks stored under feature_extractor
    cb = np.stack(
        [
            g(f"feature_extractor.encodec.quantizer.vq.layers.{q}._codebook.embed")
            for q in range(NUM_CODEBOOKS)
        ]
    )

    return {
        "codebook_weights": cb,
        "embed": {
            "w": conv_w(g("backbone.embed.weight")),
            "b": g("backbone.embed.bias"),
        },
        "norm": {
            "scale": g("backbone.norm.scale.weight"),
            "shift": g("backbone.norm.shift.weight"),
        },
        "blocks": blocks,
        "final_norm": {
            "scale": g("backbone.final_layer_norm.weight"),
            "bias": g("backbone.final_layer_norm.bias"),
        },
        "head": {
            "w": lin_w(g("head.out.weight")),
            "b": g("head.out.bias"),
        },
    }
