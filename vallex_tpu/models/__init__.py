"""Model zoo: VALL-E (flagship), VALL-F (decoder variant), debug TTS.

`get_model` mirrors the reference factory dispatch
(models/__init__.py:98-136): a name + hyperparameters → (init_fn, module).
"""

from __future__ import annotations

from typing import Optional

from ..config import ModelConfig
from . import transformer_tts, vallex, vallf


def get_model(
    model_name: str = "VALL-E", cfg: Optional[ModelConfig] = None
):
    """→ (init_fn(key, cfg) → params, module with the apply functions)."""
    cfg = cfg or ModelConfig()
    name = model_name.lower().replace("-", "")
    if name == "valle":
        return vallex.init_vallex, vallex
    if name == "vallf":
        return vallf.init_vallf, vallf
    if name == "transformer":
        return transformer_tts.init_transformer_tts, transformer_tts
    raise ValueError(f"unknown model {model_name!r}")


__all__ = ["get_model", "vallex", "vallf", "transformer_tts"]
