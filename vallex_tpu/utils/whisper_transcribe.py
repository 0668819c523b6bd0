"""Whisper transcription for transcript-less `make_prompt`.

The reference runs openai-whisper medium (utils/prompt_making.py:87-109):
detect_language on the 30 s mel, then decode. Here the model runs as the
TPU-native JAX port (asr/whisper.py — jitted encoder, KV-cached greedy
decoder); HuggingFace is used only to read the checkpoint file and to
detokenize ids → text. This image has no network egress, so without local
weights (WHISPER_MODEL_DIR env or ./checkpoints/whisper-medium) a clear
error asks the caller to pass a transcript instead; the architecture itself
is verified against a reconstructed random-init torch Whisper in
tests/test_whisper.py.
"""

from __future__ import annotations

import os
from typing import Tuple

_WHISPER_LANGS = {"en": "en", "zh": "zh", "ja": "ja"}

_cached = None  # (params, cfg, tokenizer)


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


def _load_model():
    global _cached
    if _cached is not None:
        return _cached
    model_dir = _find_model_dir()
    import json

    import numpy as np

    from ..asr import whisper as W

    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    cfg = W.WhisperConfig(
        d_model=hc["d_model"],
        num_heads=hc["encoder_attention_heads"],
        encoder_layers=hc["encoder_layers"],
        decoder_layers=hc["decoder_layers"],
        vocab=hc["vocab_size"],
        max_source_positions=hc["max_source_positions"],
        max_target_positions=hc["max_target_positions"],
    )
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(
                os.path.join(model_dir, "pytorch_model.bin"),
                map_location="cpu", weights_only=True,
            ).items()
        }
    params = W.convert_hf_state_dict(
        {k: np.asarray(v) for k, v in sd.items()}, cfg
    )
    from transformers import WhisperTokenizer

    tokenizer = WhisperTokenizer.from_pretrained(model_dir)
    _cached = (params, cfg, tokenizer)
    return _cached


def transcribe(audio_path: str, *, seed: int = 0) -> Tuple[str, str]:
    """→ (transcript text, detected language code in {en, zh, ja}).

    Decodes with the reference's transcription settings —
    temperature=1.0, best_of=5 independent sample lanes ranked by average
    logprob, sample_len=150 (utils/prompt_making.py:46)."""
    params, cfg, tokenizer = _load_model()

    from ..asr import whisper as W
    from .audio import load_wav

    wav, _ = load_wav(audio_path, target_sr=16000)
    ids, lang = W.transcribe_ids(
        params, cfg, wav, temperature=1.0, best_of=5, sample_len=150,
        seed=seed,
    )
    text = tokenizer.decode(ids, skip_special_tokens=True).strip()
    return text, _WHISPER_LANGS.get(lang, "en")
