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
    ap.add_argument("--packed", action="store_true",
                    help="sequence packing A/B: the same variable-length "
                         "utterances unpacked (static T bucket) vs packed "
                         "2/row (collate_packed); reports REAL frames/s")
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

    if args.packed:
        from vallex_tpu.data.dataset import collate_packed

        results = []
        for B in (int(x) for x in args.batches.split(",")):
            rng = np.random.RandomState(0)
            lens_a = rng.randint(150, T - 10, size=B)
            lens_t = rng.randint(40, S - 8, size=B)
            samples = [{
                "utt_id": f"u{i}",
                "text_tokens": rng.randint(5, 99, (lens_t[i],)).astype(
                    np.int32
                ),
                "text_tokens_lens": int(lens_t[i]),
                "language": 0,
                "audio_features": rng.randint(
                    0, 1024, (8, lens_a[i])
                ).astype(np.int32),
                "audio_features_lens": int(lens_a[i]),
            } for i in range(B)]
            real_frames = int(lens_a.sum())

            # unpacked: the static-bucket batch these utterances would use
            text_ids = np.full((B, S), 3, np.int32)
            codes = np.zeros((B, T, 8), np.int32)
            for i, s in enumerate(samples):
                text_ids[i, : lens_t[i]] = s["text_tokens"]
                codes[i, : lens_a[i]] = s["audio_features"].T
            unpacked = {
                "text_ids": jnp.asarray(text_ids),
                "lang_ids": jnp.zeros((B, S), jnp.int32),
                "text_lens": jnp.asarray(lens_t, jnp.int32),
                "codes": jnp.asarray(codes),
                "audio_lens": jnp.asarray(lens_a, jnp.int32),
            }
            packed = {
                k: jnp.asarray(v)
                for k, v in collate_packed(samples, pack=2).items()
                if k != "utt_ids"
            }
            Wa = packed["p_audio_in"].shape[1]
            for name, batch, kw_extra in (
                ("unpacked", unpacked, dict(use_flash=True)),
                ("packed", packed, dict(use_flash=True, packed=True)),
            ):
                state = init_train_state(params, opt)
                kw = dict(cfg=cfg, optimizer=opt, dtype="bfloat16",
                          remat=True, **kw_extra)
                state, m = train_step(
                    state, batch, jax.random.PRNGKey(1), **kw
                )
                _ = float(m["loss"])
                t0 = time.perf_counter()
                for i in range(args.steps):
                    state, m = train_step(
                        state, batch, jax.random.PRNGKey(2 + i), **kw
                    )
                loss = float(m["loss"])
                dt = (time.perf_counter() - t0) / args.steps
                row = {
                    "mode": name, "utterances": B,
                    "rows": int(batch["p_audio_in"].shape[0]) if
                    name == "packed" else B,
                    "row_width": Wa if name == "packed" else T,
                    "ms_per_step": dt * 1e3,
                    "real_frames_per_s": real_frames / dt,
                    "loss": loss,
                }
                results.append(row)
                print(json.dumps(row))
        return results

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
