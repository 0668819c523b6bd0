"""Host-side audio I/O without libsndfile/torchaudio.

The reference loads enrollment audio with torchaudio
(utils/prompt_making.py:59); neither torchaudio nor soundfile ship in this
image, so WAV files are read with the stdlib `wave` module and resampled
with scipy's polyphase resampler. Stereo is downmixed to mono, matching the
reference (prompt_making.py:62-64).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np
from scipy.signal import resample_poly


def load_wav(path: str, target_sr: int = 24000) -> Tuple[np.ndarray, int]:
    """→ (mono float32 waveform in [-1, 1] at target_sr, target_sr).

    Uses the native C++ decoder+resampler when built (vallex_tpu.native);
    otherwise the stdlib/scipy path below."""
    from .. import native

    lib_out = native.load_wav(path)
    if lib_out is not None:
        data, sr = lib_out
        if sr != target_sr:
            res = native.resample(data, sr, target_sr)
            if res is not None:
                return res, target_sr
        else:
            return data, target_sr

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())

    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 3:
        # 24-bit PCM (a common studio-enrollment format): widen the
        # little-endian 3-byte samples to int32 and scale
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        as32 = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        as32 = (as32 << 8) >> 8  # sign-extend bit 23
        data = as32.astype(np.float32) / 8388608.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")

    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)

    if sr != target_sr:
        from math import gcd

        g = gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data, target_sr


def save_wav(path: str, wav: np.ndarray, sr: int = 24000) -> None:
    """Write mono float waveform as 16-bit PCM."""
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
