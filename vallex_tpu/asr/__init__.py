"""TPU-native ASR (Whisper) for transcript-less prompt making."""

from .whisper import (  # noqa: F401
    WhisperConfig,
    convert_hf_state_dict,
    detect_language,
    encode,
    greedy_decode,
    init_whisper,
    log_mel_spectrogram,
    transcribe_ids,
)
