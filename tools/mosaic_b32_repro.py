"""Minimize the Mosaic compiler crash at batch=32 (PERFORMANCE.md: the
batched block kernel compiles and runs at B<=24; B=32 crashes the
compiler — previously unreproduced-minimized).

Two stages, each AOT-compiled only (.lower().compile()) so a crash is
captured without running anything:

1. `full`: the real ar_generate_batch program at R=32, shipped model
   size — confirms the crash still exists and records its signature.
2. `mini`: the same kernel entry (decode_block_fused) at a tiny model
   (NL=2, D=256, F=512) sweeping B over 24/28/32/40 — separates
   "B=32 per se" from total lane width (B*H*hd) and from program size.

Usage: python tools/mosaic_b32_repro.py [full|mini|both]
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vallex-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vallex_tpu.config import EngineConfig, ModelConfig
from vallex_tpu.engine import ar as AR
from vallex_tpu.models import vallex as V


def try_compile(label, fn):
    print(f"--- {label}: compiling ...", flush=True)
    try:
        fn()
        print(f"--- {label}: COMPILED OK", flush=True)
        return True
    except Exception:
        tb = traceback.format_exc()
        lines = tb.strip().splitlines()
        # the CLASSIFYING message lives at the exception head (e.g.
        # RESOURCE_EXHAUSTED / scoped-VMEM), the tail carries the
        # allocation table — print both
        head = "\n".join(
            ln for ln in lines
            if "Error" in ln or "EXHAUSTED" in ln or "exceed" in ln.lower()
            or "vmem" in ln.lower() or "Mosaic" in ln
        )[:2000]
        tail = "\n".join(lines[-12:])
        print(f"--- {label}: CRASH\n{head}\n…\n{tail}", flush=True)
        return False


def build_batch_lowered(params, cfg, e, R):
    rng = np.random.RandomState(7)
    reqs = []
    for r in range(R):
        S = 16 + (r % 5)
        text = rng.randint(5, 60, size=S).astype(np.int32)
        lang = np.zeros(S, np.int32)
        prompt = rng.randint(0, 1024, size=100).astype(np.int32)
        reqs.append((text, lang, prompt))
    pb = AR.pad_batched_requests(
        reqs, cfg.eos_id, cfg.num_quantizers, e.text_buckets,
        e.audio_buckets,
    )
    lowered = AR.ar_generate_batch.lower(
        params, cfg,
        jnp.asarray(pb["text"]), jnp.asarray(pb["lang"]),
        jnp.asarray(pb["x_lens"]),
        jnp.asarray(pb["prompt_pad"]), jnp.asarray(pb["prompt_lens"]),
        jnp.asarray(pb["caps"]),
        jnp.asarray(3, jnp.int32),
        jnp.asarray(1, jnp.int32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        s_text=pb["s_text"], p_audio=pb["p_audio"], t_gen=pb["t_gen"],
        compute_dtype=e.compute_dtype, greedy=True,
        quantize=e.quantize, decode_steps=8, plain_sampling=True,
    )
    return lowered


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("mini", "both"):
        # tiny model: isolates B from program size. H*hd = 256 lanes/row.
        cfg = ModelConfig(d_model=256, num_heads=4, num_layers=2,
                          ffn_dim=512)
        params = V.init_vallex(jax.random.PRNGKey(0), cfg)
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(1024,),
            decode_mode="megakernel", decode_steps=8, speculative="off",
        )
        for B in (24, 28, 32, 40):
            lowered = build_batch_lowered(params, cfg, e, B)
            try_compile(f"mini B={B} (lanes={B * 256})",
                        lowered.compile)

    if which in ("full", "both"):
        cfg = ModelConfig()
        params = V.init_vallex(jax.random.PRNGKey(0), cfg)
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(1024,),
            decode_mode="megakernel", decode_steps=8, speculative="off",
        )
        for B in (32,):
            lowered = build_batch_lowered(params, cfg, e, B)
            try_compile(f"full B={B} (lanes={B * 1024})",
                        lowered.compile)


if __name__ == "__main__":
    main()
