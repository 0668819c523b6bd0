"""Checkpoint I/O: torch `vallex-checkpoint.pt` → JAX pytree, plus native
orbax-style npz save/load.

The shipped checkpoint format is {"model": state_dict} with keys prefixed
ar_*/nar_* (reference: utils/generation.py:79-83). Linear kernels are
transposed to [in, out]; the NAR audio embeddings are stacked to
[8, 1025, D] (codebooks 1..7 padded with a zero EOS row); the NAR predict
heads are stacked to [7, D, 1024] (heads 0..5 arrive weight-tied to
embeddings 2..7 in the state dict; reference: models/vallex.py:254-264).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]


def _t(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a.T)


def convert_torch_state_dict(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig
) -> Params:
    """Convert a numpy-ified torch state dict into the model param pytree."""
    g = lambda k: np.asarray(sd[k], dtype=np.float32)  # noqa: E731

    def embedding(prefix: str) -> Dict[str, np.ndarray]:
        return {"weight": g(f"{prefix}.word_embeddings.weight")}

    def alpha(prefix: str) -> Dict[str, np.ndarray]:
        return {"alpha": g(f"{prefix}.alpha").reshape(())}

    def stack(prefix: str, adaptive: bool) -> Dict[str, Any]:
        L = cfg.num_layers
        layers: Dict[str, Any] = {
            "self_attn": {
                "in_proj_w": np.stack(
                    [_t(g(f"{prefix}.layers.{i}.self_attn.in_proj_weight")) for i in range(L)]
                ),
                "in_proj_b": np.stack(
                    [g(f"{prefix}.layers.{i}.self_attn.in_proj_bias") for i in range(L)]
                ),
                "out_w": np.stack(
                    [_t(g(f"{prefix}.layers.{i}.self_attn.out_proj.weight")) for i in range(L)]
                ),
                "out_b": np.stack(
                    [g(f"{prefix}.layers.{i}.self_attn.out_proj.bias") for i in range(L)]
                ),
            },
            "linear1": {
                "w": np.stack([_t(g(f"{prefix}.layers.{i}.linear1.weight")) for i in range(L)]),
                "b": np.stack([g(f"{prefix}.layers.{i}.linear1.bias") for i in range(L)]),
            },
            "linear2": {
                "w": np.stack([_t(g(f"{prefix}.layers.{i}.linear2.weight")) for i in range(L)]),
                "b": np.stack([g(f"{prefix}.layers.{i}.linear2.bias") for i in range(L)]),
            },
        }
        for norm in ("norm1", "norm2"):
            if adaptive:
                layers[norm] = {
                    "w": np.stack(
                        [_t(g(f"{prefix}.layers.{i}.{norm}.project_layer.weight")) for i in range(L)]
                    ),
                    "b": np.stack(
                        [g(f"{prefix}.layers.{i}.{norm}.project_layer.bias") for i in range(L)]
                    ),
                    "scale": np.stack(
                        [g(f"{prefix}.layers.{i}.{norm}.norm.weight") for i in range(L)]
                    ),
                    "bias": np.stack(
                        [g(f"{prefix}.layers.{i}.{norm}.norm.bias") for i in range(L)]
                    ),
                }
            else:
                layers[norm] = {
                    "scale": np.stack([g(f"{prefix}.layers.{i}.{norm}.weight") for i in range(L)]),
                    "bias": np.stack([g(f"{prefix}.layers.{i}.{norm}.bias") for i in range(L)]),
                }
        if adaptive:
            final = {
                "w": _t(g(f"{prefix}.norm.project_layer.weight")),
                "b": g(f"{prefix}.norm.project_layer.bias"),
                "scale": g(f"{prefix}.norm.norm.weight"),
                "bias": g(f"{prefix}.norm.norm.bias"),
            }
        else:
            final = {
                "scale": g(f"{prefix}.norm.weight"),
                "bias": g(f"{prefix}.norm.bias"),
            }
        return {"layers": layers, "norm": final}

    num_q = cfg.num_quantizers
    nar_audio = np.zeros(
        (num_q, cfg.num_audio_tokens + 1, cfg.d_model), np.float32
    )
    nar_audio[0] = g("nar_audio_embeddings.0.word_embeddings.weight")
    for j in range(1, num_q):
        nar_audio[j, : cfg.num_audio_tokens] = g(
            f"nar_audio_embeddings.{j}.word_embeddings.weight"
        )

    nar_predict = np.stack(
        [_t(g(f"nar_predict_layers.{j}.weight")) for j in range(num_q - 1)]
    )
    nar_stage = np.concatenate(
        [
            g(f"nar_stage_embeddings.{j}.word_embeddings.weight")
            for j in range(num_q - 1)
        ],
        axis=0,
    )

    return {
        "ar_text_embedding": embedding("ar_text_embedding"),
        "nar_text_embedding": embedding("nar_text_embedding"),
        "ar_audio_embedding": embedding("ar_audio_embedding"),
        "ar_text_position": alpha("ar_text_position"),
        "ar_audio_position": alpha("ar_audio_position"),
        "nar_text_position": alpha("nar_text_position"),
        "nar_audio_position": alpha("nar_audio_position"),
        "ar_decoder": stack("ar_decoder", adaptive=False),
        "nar_decoder": stack("nar_decoder", adaptive=True),
        "ar_predict_layer": {"w": _t(g("ar_predict_layer.weight"))},
        "nar_audio_embeddings": {"weight": nar_audio},
        "nar_predict_layers": {"w": nar_predict},
        "nar_stage_embeddings": {"weight": nar_stage},
        "ar_language_embedding": embedding("ar_language_embedding"),
        "nar_language_embedding": embedding("nar_language_embedding"),
    }


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Params:
    """Load the shipped `vallex-checkpoint.pt` (requires torch, CPU-only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    np_sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(np_sd, cfg)


# ---------------------------------------------------------------------------
# Native flat-npz checkpoints (no torch needed at serve time)
# ---------------------------------------------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Params:
    tree: Params = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_native(path: str, params: Params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(params))


def load_native(path: str) -> Params:
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


# ---------------------------------------------------------------------------
# Orbax checkpoints (training runs: sharded, async-capable)
# ---------------------------------------------------------------------------

def save_orbax(path: str, tree: Params) -> None:
    """Save a pytree (params or a whole TrainState) with orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Params) -> Params:
    """Restore a pytree saved by save_orbax (`like` supplies the structure)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
