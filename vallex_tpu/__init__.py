"""TPU-native VALL-E X: zero-shot multilingual TTS in JAX/XLA/Pallas.

A from-scratch framework with the capabilities of Plachtaa/VALL-E-X
(reference mounted at /root/reference), redesigned for TPU: jit-compiled
bucketed AR decoding with a fused KV-cache attention step, a 7-stage NAR
pass, and a JAX Vocos vocoder.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    DEFAULT_ENGINE_CONFIG,
    DEFAULT_MODEL_CONFIG,
    EngineConfig,
    ModelConfig,
    SAMPLE_RATE,
)
