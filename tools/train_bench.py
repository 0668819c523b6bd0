"""Training-throughput microbench: full-size model, one chip, flash vs mask.

Usage:
    python tools/train_bench.py [--batches 8,16] [--steps 6] [--flash both]

Measures ms/step of the jitted train_step (AR + one NAR stage + AdamW,
bf16 compute, remat) at the shipped model size (d=1024, 12+12 layers) over
an S=128 text / T=600 frame bucket, and reports audio frames/s and the
matmul-FLOP utilization. Steps are chained on-device (state carry) and
fetched once at the end — the axon execution tunnel does not block in
block_until_ready, so per-step host syncs would add an RTT each.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def model_flops_per_step(B: int, S: int, T: int, cfg) -> float:
    """Matmul FLOPs of one fwd+bwd step (2x fwd due to remat), both stacks."""
    D, F, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers

    def stack(tokens):
        lin = tokens * (4 * D * D + 2 * D * F) * 2  # qkv+out+ffn, mul+add
        attn = 2 * tokens * tokens / 1 * D * 2  # scores + values (per batch elt)
        return lin + attn

    ar_tokens = S + T + 1
    nar_tokens = S + T
    fwd = L * (stack(B * ar_tokens) + stack(B * nar_tokens))
    # heads: AR 1025-way + NAR 1024-way over T frames
    heads = 2 * B * (T + 1) * cfg.d_model * 1025 * 2
    # bwd ~2x fwd matmuls; remat adds ~1x fwd
    return (fwd + heads) * (1 + 2 + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--flash", type=str, default="both",
                    choices=("both", "on", "off"))
    ap.add_argument("--remat", type=str, default="on",
                    choices=("both", "on", "off", "dots"))
    ap.add_argument("--seq", type=str, default="128,600", help="S,T")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vallex-jax-cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vallex_tpu.config import ModelConfig
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    cfg = ModelConfig()
    params = init_vallex(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    S, T = (int(x) for x in args.seq.split(","))
    flashes = {"both": (False, True), "on": (True,), "off": (False,)}[
        args.flash
    ]
    remats = {"both": (True, False), "on": (True,), "off": (False,),
              "dots": ("dots",)}[args.remat]

    results = []
    for B in (int(x) for x in args.batches.split(",")):
        rng = np.random.RandomState(0)
        batch = {
            "text_ids": jnp.asarray(rng.randint(5, 99, (B, S)), jnp.int32),
            "lang_ids": jnp.zeros((B, S), jnp.int32),
            "text_lens": jnp.full((B,), S - 8, jnp.int32),
            "codes": jnp.asarray(rng.randint(0, 1024, (B, T, 8)), jnp.int32),
            "audio_lens": jnp.full((B,), T - 16, jnp.int32),
        }
        for use_flash in flashes:
          for remat in remats:
            state = init_train_state(params, opt)
            kw = dict(cfg=cfg, optimizer=opt, dtype="bfloat16",
                      use_flash=use_flash, remat=remat)
            state, m = train_step(state, batch, jax.random.PRNGKey(1), **kw)
            _ = float(m["loss"])  # forces the compile + first run
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, m = train_step(
                    state, batch, jax.random.PRNGKey(2 + i), **kw
                )
            loss = float(m["loss"])  # one host fetch syncs the whole chain
            dt = (time.perf_counter() - t0) / args.steps
            fps = B * T / dt
            mfu = model_flops_per_step(B, S, T, cfg) / dt / 394e12
            row = {
                "batch": B, "flash": use_flash, "remat": remat,
                "ms_per_step": dt * 1e3,
                "frames_per_s": fps, "audio_sec_per_s": fps / 75.0,
                "mfu_vs_394tflops_bf16": mfu, "loss": loss,
            }
            results.append(row)
            print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
