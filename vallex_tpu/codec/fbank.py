"""100-bin log-mel filterbank extractor (for the debug Transformer TTS).

JAX counterpart of the reference's BigVGAN-style extractor (data/fbank.py:
28-173, inert there because its lhotse base class is commented out):
24 kHz audio → STFT (n_fft 1024, hop 256, Hann, reflect-padded by
(n_fft-hop)/2 as in data/fbank.py:103-108) → MAGNITUDE spectrum
(sqrt(re²+im²+1e-9), data/fbank.py:126) → 100-bin mel with librosa's
SLANEY scale and slaney area normalization (librosa_mel_fn defaults,
data/fbank.py:75-77) → log-clip at 1e-5 (spectral_normalize_torch).
Implemented as an MXU-friendly framed matmul, no FFT op (same trick as
the Vocos ISTFT).
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


def _hz_to_mel_slaney(f):
    """librosa htk=False: linear below 1 kHz, logarithmic above."""
    f = jnp.asarray(f, jnp.float32)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    logstep = jnp.log(6.4) / 27.0
    lin = f / f_sp
    log = min_log_hz / f_sp + jnp.log(jnp.maximum(f, 1e-10) / min_log_hz) / logstep
    return jnp.where(f >= min_log_hz, log, lin)


def _mel_to_hz_slaney(m):
    m = jnp.asarray(m, jnp.float32)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = jnp.log(6.4) / 27.0
    lin = m * f_sp
    log = min_log_hz * jnp.exp(logstep * (m - min_log_mel))
    return jnp.where(m >= min_log_mel, log, lin)


def mel_filterbank(
    n_mels: int = NUM_MEL_BINS,
    n_fft: int = N_FFT,
    sr: int = SAMPLE_RATE,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> jnp.ndarray:
    """Slaney-scale, slaney-NORMALIZED triangular filters →
    [n_fft//2+1, n_mels] — matches librosa.filters.mel(htk=False,
    norm='slaney'), the reference's librosa_mel_fn (data/fbank.py:75)."""
    n_bins = n_fft // 2 + 1
    freqs = jnp.linspace(0, sr / 2, n_bins)
    mel_pts = jnp.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    lower = hz_pts[:-2][None, :]
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = freqs[:, None]
    up = (f - lower) / jnp.maximum(center - lower, 1e-9)
    down = (upper - f) / jnp.maximum(upper - center, 1e-9)
    fb = jnp.clip(jnp.minimum(up, down), 0.0, None)
    # slaney area normalization: 2 / (hz[m+2] - hz[m])
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return fb * enorm[None, :]


@functools.partial(jax.jit, static_argnames=())
def extract_fbank(wav: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → [B, T, 100] log-mel features (T = samples//HOP for
    HOP-aligned inputs, matching the reference's (n_fft-hop)/2 reflect pad
    + center=False framing)."""
    B, n = wav.shape
    pad = (N_FFT - HOP) // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    T = 1 + (x.shape[1] - N_FFT) // HOP
    idx = jnp.arange(T)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]  # [B, T, N_FFT]
    win = jnp.hanning(N_FFT + 1)[:-1]
    frames = frames * win

    # rfft via DFT matmuls (TPU FFT lowering is slow)
    F_bins = N_FFT // 2 + 1
    k = jnp.arange(F_bins, dtype=jnp.float32)[:, None]
    t = jnp.arange(N_FFT, dtype=jnp.float32)[None, :]
    ang = 2.0 * jnp.pi * k * t / N_FFT
    c = jnp.cos(ang).T  # [N_FFT, F]
    s = -jnp.sin(ang).T
    re = jnp.einsum("btn,nf->btf", frames, c)
    im = jnp.einsum("btn,nf->btf", frames, s)
    # MAGNITUDE spectrum (reference: sqrt(power + 1e-9), data/fbank.py:126)
    mag = jnp.sqrt(re**2 + im**2 + 1e-9)

    mel = jnp.einsum("btf,fm->btm", mag, mel_filterbank())
    return jnp.log(jnp.clip(mel, 1e-5, None))


def get_fbank_extractor():
    """Factory mirroring the reference's get_fbank_extractor
    (data/fbank.py:176-177)."""
    return extract_fbank
