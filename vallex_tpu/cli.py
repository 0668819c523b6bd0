"""Command-line serving surface (the reference's launch-ui operations, sans
browser): synthesize, long-text, make-prompt, continual, list-presets, bench.

Usage:
  python -m vallex_tpu.cli synthesize "Hello world." --prompt paimon -o out.wav
  python -m vallex_tpu.cli long-text "Para one. Para two." --mode fixed-prompt
  python -m vallex_tpu.cli make-prompt myvoice clip.wav --transcript "..."
  python -m vallex_tpu.cli list-presets
  python -m vallex_tpu.cli ui          # gradio app when gradio is installed
  python -m vallex_tpu.cli serve --port 8000 --quantize int8kv
"""

from __future__ import annotations

import argparse
import logging
import sys


def _load(args):
    from . import api

    cfg = ecfg = None
    if getattr(args, "config", None):
        import json

        from .config import EngineConfig, ModelConfig

        with open(args.config) as f:
            overrides = json.load(f)
        if "model" in overrides:
            cfg = ModelConfig(**overrides["model"])
        if "engine" in overrides:
            ecfg = EngineConfig(**overrides["engine"])
    return api.preload_models(
        args.checkpoints, random_weights=args.random_weights,
        cfg=cfg, ecfg=ecfg,
    )


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--checkpoints", default="./checkpoints")
    p.add_argument(
        "--random-weights", action="store_true",
        help="run with random weights (structure/benchmark mode)",
    )
    p.add_argument(
        "--config", default=None,
        help="JSON file with config overrides: "
             '{"model": {ModelConfig fields}, "engine": {EngineConfig '
             "fields}}",
    )
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the JAX backend (some environments pin jax_platforms "
             "at interpreter startup, ignoring JAX_PLATFORMS)",
    )


def main(argv=None) -> int:
    logging.basicConfig(
        format="%(asctime)s %(levelname)s [%(filename)s:%(lineno)d] %(message)s",
        level=logging.INFO,
    )
    parser = argparse.ArgumentParser(prog="vallex_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synthesize", help="text → wav")
    p.add_argument("text")
    p.add_argument("--prompt", default=None, help="preset/custom voice name")
    p.add_argument("--language", default="auto")
    p.add_argument("--accent", default="no-accent")
    p.add_argument("--best-of", type=int, default=1)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=-100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--output", default="out.wav")
    _add_common(p)

    p = sub.add_parser("long-text", help="paragraph → wav, sentence by sentence")
    p.add_argument("text")
    p.add_argument("--prompt", default=None)
    p.add_argument("--language", default="auto")
    p.add_argument("--accent", default="no-accent")
    p.add_argument(
        "--mode", default="sliding-window",
        choices=["fixed-prompt", "sliding-window"],
    )
    p.add_argument("-o", "--output", default="out.wav")
    _add_common(p)

    p = sub.add_parser("make-prompt", help="enrollment clip → .npz voice")
    p.add_argument("name")
    p.add_argument("audio", help="wav file, 3-10 s")
    p.add_argument("--transcript", default=None)
    p.add_argument("--out-dir", default="./customs")
    _add_common(p)

    p = sub.add_parser("list-presets", help="list bundled voice prompts")

    p = sub.add_parser("ui", help="launch the gradio web UI")
    p.add_argument("--port", type=int, default=7860)
    _add_common(p)

    p = sub.add_parser(
        "serve",
        help="HTTP synthesis server with dynamic micro-batching "
        "(POST /synthesize, GET /healthz, GET /presets)",
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--max-batch", type=int, default=None,
        help="requests coalesced into one batched decode; default follows "
        "the measured optimum for the quantize mode (8 with int8kv, else "
        "4 — int8/bf16 caches hit VMEM pressure at 8, PERFORMANCE.md)",
    )
    p.add_argument(
        "--max-wait-ms", type=float, default=30.0,
        help="how long a lone request waits for batch companions",
    )
    p.add_argument(
        "--max-rows", type=int, default=5,
        help="total decode-lane rows per best_of>1 batched call; the "
        "default keeps best_of>=3 requests on the single-request beam "
        "schedule (measured faster — tools/best_of_checks.py)",
    )
    p.add_argument(
        "--warmup", action="store_true",
        help="compile the serving programs (single + batched decode) "
        "before accepting traffic",
    )
    p.add_argument(
        "--quantize", default="none",
        choices=["none", "int8", "w8a8", "int8kv"],
        help="engine quantization (opt-in; A/B fidelity first)",
    )
    _add_common(p)

    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "list-presets":
        import os

        from .api import PROMPT_SEARCH_DIRS

        seen = set()
        for d in PROMPT_SEARCH_DIRS:
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    if f.endswith(".npz") and f[:-4] not in seen:
                        seen.add(f[:-4])
                        print(f[:-4])
        return 0

    if args.cmd == "synthesize":
        from . import api
        from .utils.audio import save_wav

        _load(args)
        wave = api.generate_audio(
            args.text, prompt=args.prompt, language=args.language,
            accent=args.accent, best_of=args.best_of,
            temperature=args.temperature, top_k=args.top_k, seed=args.seed,
        )
        save_wav(args.output, wave)
        print(f"wrote {args.output} ({len(wave) / 24000:.2f}s)")
        return 0

    if args.cmd == "long-text":
        from . import api
        from .utils.audio import save_wav

        _load(args)
        wave = api.generate_audio_from_long_text(
            args.text, prompt=args.prompt, language=args.language,
            accent=args.accent, mode=args.mode,
        )
        save_wav(args.output, wave)
        print(f"wrote {args.output} ({len(wave) / 24000:.2f}s)")
        return 0

    if args.cmd == "make-prompt":
        from . import api

        _load(args)
        out = api.make_prompt(
            args.name, args.audio, transcript=args.transcript,
            out_dir=args.out_dir,
        )
        print(f"wrote {out}")
        return 0

    if args.cmd == "ui":
        from .ui import launch_ui

        _load(args)
        launch_ui(port=args.port)
        return 0

    if args.cmd == "serve":
        from . import api
        from .api import _long_text_batch_size
        from .config import EngineConfig
        from .server import serve_forever

        ecfg = EngineConfig(quantize=args.quantize)
        api.preload_models(
            args.checkpoints, random_weights=args.random_weights,
            ecfg=ecfg,
        )
        max_batch = (
            args.max_batch if args.max_batch is not None
            else _long_text_batch_size(ecfg)
        )
        if args.warmup:
            from .server import warmup

            warmup(max_batch)
        serve_forever(
            args.host, args.port,
            max_batch=max_batch, max_wait_ms=args.max_wait_ms,
            max_rows=args.max_rows,
        )
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
