"""Inference engines: bucketed jit-compiled AR decode + 7-stage NAR."""

from .ar import AREngine, ar_generate
from .nar import NAREngine, nar_generate

__all__ = ["AREngine", "ar_generate", "NAREngine", "nar_generate"]
