"""100-bin log-mel filterbank extractor (for the debug Transformer TTS).

JAX counterpart of the reference's BigVGAN-style extractor (data/fbank.py:
28-173, inert there because its lhotse base class is commented out):
24 kHz audio → STFT (n_fft 1024, hop 256, centered Hann) → 100-bin mel
(0..12 kHz) → log-clip. Implemented as an MXU-friendly framed matmul, no FFT
op (same trick as the Vocos ISTFT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import NUM_MEL_BINS

N_FFT = 1024
HOP = 256
SAMPLE_RATE = 24000
FMIN = 0.0
FMAX = 12000.0


def _hz_to_mel(f):
    return 2595.0 * jnp.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int = NUM_MEL_BINS,
    n_fft: int = N_FFT,
    sr: int = SAMPLE_RATE,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> jnp.ndarray:
    """Slaney-style triangular filters → [n_fft//2+1, n_mels]."""
    n_bins = n_fft // 2 + 1
    freqs = jnp.linspace(0, sr / 2, n_bins)
    mel_pts = jnp.linspace(
        _hz_to_mel(jnp.asarray(fmin)), _hz_to_mel(jnp.asarray(fmax)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz(mel_pts)
    lower = hz_pts[:-2][None, :]
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = freqs[:, None]
    up = (f - lower) / jnp.maximum(center - lower, 1e-9)
    down = (upper - f) / jnp.maximum(upper - center, 1e-9)
    fb = jnp.clip(jnp.minimum(up, down), 0.0, None)
    return fb


@functools.partial(jax.jit, static_argnames=())
def extract_fbank(wav: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → [B, T, 100] log-mel features (T = samples//HOP + 1)."""
    B, n = wav.shape
    pad = N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    T = 1 + (x.shape[1] - N_FFT) // HOP
    idx = jnp.arange(T)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]  # [B, T, N_FFT]
    win = jnp.hanning(N_FFT + 1)[:-1]
    frames = frames * win

    # rfft magnitude via DFT matmuls (TPU FFT lowering is slow)
    F_bins = N_FFT // 2 + 1
    k = jnp.arange(F_bins, dtype=jnp.float32)[:, None]
    t = jnp.arange(N_FFT, dtype=jnp.float32)[None, :]
    ang = 2.0 * jnp.pi * k * t / N_FFT
    c = jnp.cos(ang).T  # [N_FFT, F]
    s = -jnp.sin(ang).T
    re = jnp.einsum("btn,nf->btf", frames, c)
    im = jnp.einsum("btn,nf->btf", frames, s)
    power = re**2 + im**2

    mel = jnp.einsum("btf,fm->btm", power, mel_filterbank())
    return jnp.log(jnp.clip(mel, 1e-5, None))


def get_fbank_extractor():
    """Factory mirroring the reference's get_fbank_extractor
    (data/fbank.py:176-177)."""
    return extract_fbank
