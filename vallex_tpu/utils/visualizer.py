"""Training-debug visualizer: per-utterance heatmap PNGs.

JAX counterpart of the reference visualizer (models/visualizer.py:26-106):
dumps encoder/decoder activations and target codes as matplotlib heatmaps
for the first few utterances of a batch.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def visualize(
    predicts,  # tuple of arrays, e.g. (encoder_out [B,S,D], decoder_out [B,T,D])
    batch: Dict[str, np.ndarray],  # expects "text_ids", "codes", "utt_ids"?
    output_dir: str,
    limit: int = 4,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    enc, dec = (np.asarray(p, np.float32) for p in predicts[:2])
    codes = np.asarray(batch.get("codes")) if "codes" in batch else None
    utt_ids = batch.get("utt_ids") or [f"utt{i}" for i in range(len(enc))]

    for b in range(min(limit, len(enc))):
        uid = utt_ids[b]
        for name, mat in (("encoder", enc[b]), ("decoder", dec[b])):
            fig = plt.figure(figsize=(16, 8))
            plt.imshow(mat.T, aspect="auto", origin="lower", cmap="viridis")
            plt.colorbar()
            plt.title(f"{uid} {name} output")
            plt.xlabel("frame")
            plt.ylabel("dim")
            fig.savefig(
                os.path.join(output_dir, f"{uid}_{name}.png"),
                bbox_inches="tight",
            )
            plt.close(fig)
        if codes is not None:
            fig = plt.figure(figsize=(16, 4))
            plt.imshow(
                codes[b].T, aspect="auto", origin="lower", cmap="magma"
            )
            plt.colorbar()
            plt.title(f"{uid} target codes")
            fig.savefig(
                os.path.join(output_dir, f"{uid}_codes.png"),
                bbox_inches="tight",
            )
            plt.close(fig)
