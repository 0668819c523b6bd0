"""Prompted-features container (reference: data/input_strategies.py:16-35).

Pairs (prompt, target) feature tensors through collation; the lhotse-based
PromptedPrecomputedFeatures of the reference is fully commented out upstream
and intentionally not reproduced (the HDF5 pipeline in data/dataset.py is
the supported path)."""

from __future__ import annotations

from typing import Tuple


class PromptedFeatures:
    def __init__(self, prompts, features):
        self.prompts = prompts
        self.features = features

    def to(self, device):  # torch-API compatibility no-op
        return self

    def sum(self):
        return self.features.sum()

    @property
    def ndim(self):
        return self.features.ndim

    @property
    def data(self) -> Tuple:
        return (self.prompts, self.features)
