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


def add_model_arguments(parser) -> None:
    """argparse group mirroring the reference's flags
    (models/__init__.py:18-95)."""
    parser.add_argument(
        "--model-name", type=str, default="VALL-E",
        help="VALL-E, VALL-F, Transformer.",
    )
    parser.add_argument("--decoder-dim", type=int, default=1024)
    parser.add_argument("--nhead", type=int, default=16)
    parser.add_argument("--num-decoder-layers", type=int, default=12)
    parser.add_argument("--norm-first", action="store_true", default=True)
    parser.add_argument("--add-prenet", action="store_true", default=False)
    parser.add_argument(
        "--prefix-mode", type=int, default=1, choices=(0, 1, 2, 4),
        help="NAR acoustic-prompt construction (reference "
             "models/vallex.py:307-365): 0 = none, 1 = prefix-at-beginning "
             "(shipped checkpoint), 2 = random window prepended, "
             "4 = dataset-provided PromptedFeatures prompt",
    )
    parser.add_argument("--share-embedding", action="store_true", default=True)
    parser.add_argument("--prepend-bos", action="store_true", default=True)
    parser.add_argument("--num-quantizers", type=int, default=8)
    parser.add_argument("--scale-factor", type=float, default=1.0)


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        d_model=args.decoder_dim,
        num_heads=args.nhead,
        num_layers=args.num_decoder_layers,
        ffn_dim=args.decoder_dim * 4,
        prefix_mode=args.prefix_mode,
        prepend_bos=args.prepend_bos,
        share_embedding=args.share_embedding,
        norm_first=args.norm_first,
        num_quantizers=args.num_quantizers,
    )
