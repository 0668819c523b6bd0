"""Whisper transcription for transcript-less `make_prompt`.

The reference runs openai-whisper medium (utils/prompt_making.py:87-109).
Here we use HuggingFace transformers' Whisper when local weights exist
(WHISPER_MODEL_DIR env or ./checkpoints/whisper-medium); this image has no
network egress, so without local weights a clear error asks the caller to
pass a transcript instead.
"""

from __future__ import annotations

import os
from typing import Tuple

_WHISPER_LANGS = {"en": "en", "zh": "zh", "ja": "ja"}


def _find_model_dir() -> str:
    for cand in (
        os.environ.get("WHISPER_MODEL_DIR"),
        "./checkpoints/whisper-medium",
    ):
        if cand and os.path.isdir(cand):
            return cand
    raise RuntimeError(
        "Whisper weights not found (no network egress in this environment). "
        "Either pass `transcript=` to make_prompt, or place a HF Whisper "
        "model at ./checkpoints/whisper-medium (or set WHISPER_MODEL_DIR)."
    )


def transcribe(audio_path: str) -> Tuple[str, str]:
    """→ (transcript text, detected language code in {en, zh, ja})."""
    model_dir = _find_model_dir()
    import torch  # CPU-only in this image
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    from .audio import load_wav

    wav, _ = load_wav(audio_path, target_sr=16000)
    processor = WhisperProcessor.from_pretrained(model_dir)
    model = WhisperForConditionalGeneration.from_pretrained(model_dir)
    model.eval()

    inputs = processor(wav, sampling_rate=16000, return_tensors="pt")
    with torch.no_grad():
        # language detection + decode (reference uses temperature=1.0,
        # best_of=5; HF generate with sampling disabled is the stable analog)
        ids = model.generate(inputs.input_features, max_new_tokens=200)
    text = processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    from ..frontend.langid import classify

    lang = classify(text)
    return text, _WHISPER_LANGS.get(lang, "en")
