"""Real-TPU checks for the decode kernels (not run under pytest — tests
force CPU; this exercises the Mosaic-compiled kernels on the chip).

1. Block (K-step) vs single-step fused megakernel: exact token parity,
   greedy AND stochastic, at the shipped model size.
2. Verify megakernel (speculative decode): teacher-forced logits vs the
   single-step kernel on identical fed tokens — argmax must agree.
3. Speculative engine path vs plain greedy: early token agreement.
4. Per-step timing.

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
            # stochastic bf16 K=8 would otherwise route through
            # speculative SAMPLING, which is distribution-exact but not
            # bitwise vs per-token — the strict block-vs-single gate
            # needs it off (greedy spec keeps its own div>=10 gate)
            e = EngineConfig(
                text_buckets=(128,), audio_buckets=(1024,),
                decode_mode="megakernel", decode_steps=steps,
                quantize=quant,
                speculative="off" if not greedy else "auto",
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

    # ---- speculative SAMPLING (bf16 sampled): runs + sane output --------
    # bitwise parity is impossible by construction (different RNG
    # consumption); the distribution-exactness of the accept/resample
    # math is Monte-Carlo-verified in tests/test_speculative_sampling.py
    e_ss = EngineConfig(
        text_buckets=(128,), audio_buckets=(1024,),
        decode_mode="megakernel", decode_steps=8, quantize="none",
        speculative="on",
    )
    eng_ss = AREngine(params, cfg, e_ss)
    gen_ss, _ = eng_ss.generate(
        text, lang, prompt, top_k=-100, temperature=1.0, seed=42
    )
    t0 = time.time()
    gen_ss2, _ = eng_ss.generate(
        text, lang, prompt, top_k=-100, temperature=1.0, seed=43
    )
    wall = time.time() - t0
    print(
        f"speculative sampling (bf16): gen_len={len(gen_ss)} "
        f"second-run wall={wall:.3f}s "
        f"({wall / max(len(gen_ss2), 1) * 1000:.3f} ms/frame)"
    )

    # ---- in-kernel filtered sampling (top-k/top-p bisection filter) ------
    # top_p → 0 keeps ONLY the argmax token, so the filtered stochastic
    # block path (in-kernel filtered_keep_mask + Gumbel draw over the one
    # surviving lane) must reproduce the greedy sequence bitwise.
    e_f = EngineConfig(
        text_buckets=(128,), audio_buckets=(1024,),
        decode_mode="megakernel", decode_steps=8, quantize="int8",
        speculative="off",
    )
    eng_f = AREngine(params, cfg, e_f)
    gen_g, _ = eng_f.generate(
        text, lang, prompt, top_k=1, temperature=1.0, seed=42
    )
    gen_p, _ = eng_f.generate(
        text, lang, prompt, top_k=-100, top_p=1e-6, temperature=1.0,
        seed=42,
    )
    same_f = len(gen_g) == len(gen_p) and (gen_g == gen_p).all()
    print(f"filtered top_p->0 == greedy: exact={bool(same_f)} "
          f"(len {len(gen_g)} vs {len(gen_p)})")
    filtered_ok = bool(same_f)
    # top_k=50 filtered runs on the fused path at near-plain speed
    gen_k, _ = eng_f.generate(
        text, lang, prompt, top_k=50, temperature=1.0, seed=42
    )
    t0 = time.time()
    gen_k2, _ = eng_f.generate(
        text, lang, prompt, top_k=50, temperature=1.0, seed=43
    )
    wall = time.time() - t0
    print(
        f"filtered top_k=50 int8: gen_len={len(gen_k)} wall={wall:.3f}s "
        f"({wall / max(len(gen_k2), 1) * 1000:.3f} ms/frame)"
    )
    filtered_ok = filtered_ok and len(gen_k) > 0

    # ---- beams: block kernel (B>1 shared-prefix schedule) vs single-step --
    beam_results = {}
    for steps in (1, 8):
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(1024,),
            decode_mode="megakernel", decode_steps=steps, quantize="int8",
            best_of=5,
        )
        eng = AREngine(params, cfg, e)
        gen, _ = eng.generate(
            text, lang, prompt, top_k=-100, temperature=1.0, seed=42
        )
        beam_results[steps] = gen
        t0 = time.time()
        gen2, _ = eng.generate(
            text, lang, prompt, top_k=-100, temperature=1.0, seed=43
        )
        wall = time.time() - t0
        print(
            f"steps={steps} beams=5 stochastic int8: gen_len={len(gen)} "
            f"second-run wall={wall:.3f}s "
            f"({wall / max(len(gen2), 1) * 1000:.3f} ms/frame)"
        )

    ok = True
    ok = ok and len(gen_ss) > 0 and len(gen_ss2) > 0
    ok = ok and filtered_ok
    a, b = beam_results[1], beam_results[8]
    same = len(a) == len(b) and (a == b).all()
    n = min(len(a), len(b))
    div = n
    if not same and n and (a[:n] != b[:n]).any():
        div = int(np.argmax(a[:n] != b[:n]))
    print(f"parity beams=5 stochastic: K=1 len={len(a)} K=8 len={len(b)} "
          f"exact={same} first_div={div}/{n}")
    # cross-kernel (step vs block) comparison: the two B>1 schedules fold
    # the same bf16 cache in different chunk orders, so rare near-tie
    # sample flips are expected; the strict cross-lane correctness gate is
    # the teacher-forced check below. Require only early agreement here.
    ok = ok and (same or div >= 10)

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
            ok = ok and (same or div >= 10)
        else:
            ok = ok and same
    # ---- verify kernel: teacher-forced logits vs single-step kernel ------
    import jax.numpy as jnp

    from vallex_tpu.models import layers as L
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV
    from vallex_tpu.ops.decode_attention import pack_cache

    key = jax.random.PRNGKey(0)
    NL, B, H, D, F = 2, 1, 4, 256, 512
    hd = D // H
    s_text, K, C1 = 128, 8, 640
    N = B * H * hd
    dt = jnp.bfloat16
    lys = [
        L.init_encoder_layer(k, D, F, adaptive=False)
        for k in jax.random.split(key, NL)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *lys)
    fnorm = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    wpred = jax.random.normal(jax.random.PRNGKey(9), (D, 1025)) * 0.05
    emb = jax.random.normal(jax.random.PRNGKey(10), (1026, D))
    lw = DS.pack_layer_weights(
        stacked, dtype=dt, final_norm=fnorm, predict_w=wpred,
        audio_embedding=emb,
    )
    c0 = jax.random.normal(jax.random.PRNGKey(2), (NL, B, H, C1, hd)).astype(dt)
    v0 = jax.random.normal(jax.random.PRNGKey(3), (NL, B, H, C1, hd)).astype(dt)
    ck1 = jnp.stack([pack_cache(c0[i]) for i in range(NL)])
    cv1 = jnp.stack([pack_cache(v0[i]) for i in range(NL)])
    ckB = jnp.zeros((NL, C1 + K, N), dt).at[:, :C1].set(ck1)
    cvB = jnp.zeros((NL, C1 + K, N), dt).at[:, :C1].set(cv1)
    x_len, pos0 = jnp.asarray(100), 3
    fed = jnp.asarray([7, 500, 200, 999, 3, 42, 877, 101], jnp.int32)
    cks, cvs = ck1, cv1
    slog = []
    for t in range(K):
        logits, _, _, cks, cvs = DS._call_kernel(
            lw, cks, cvs, jnp.zeros((B, D), dt),
            fed[t][None], jnp.asarray(0, jnp.int32),
            jnp.asarray(1, jnp.int32),
            jnp.asarray([[1.0, 1.0]], jnp.float32),
            x_len, jnp.asarray(pos0 + t),
            s_text=s_text, num_heads=H, fused=True, vocab=1025,
        )
        slog.append(np.asarray(logits[0]))
    vlog, _, _ = DV.decode_verify(
        fed, lw, ckB, cvB, x_len, jnp.asarray(pos0),
        jnp.asarray(1.0, jnp.float32), steps=K, s_text=s_text, num_heads=H,
    )
    vlog = np.asarray(vlog)
    max_d, agree = 0.0, True
    for t in range(K):
        max_d = max(max_d, float(np.abs(vlog[t, :1025] - slog[t][:1025]).max()))
        agree = agree and (
            vlog[t, :1025].argmax() == slog[t][:1025].argmax()
        )
    print(f"verify kernel teacher-forced: max|dlogits|={max_d:.4f} "
          f"argmax agree={agree}")
    ok = ok and agree and max_d < 0.05

    # ---- B>1 shared-prefix schedule, DIVERGENT lanes, teacher-forced -----
    # Greedy engine beams are identical per lane, and the stochastic
    # engine check can flip on near-ties; this is the strict cross-lane
    # correctness gate for the Mosaic-compiled B>1 block kernel: distinct
    # per-beam generated rows + distinct fed tokens, compared against the
    # single-step kernel lane by lane at realistic dims.
    from vallex_tpu.ops import decode_block as DBm

    B5, NLb, Hb, Db = 5, 2, cfg.num_heads, cfg.d_model
    hdb = Db // Hb
    s_text_b, Kb = 256, 8
    plen_b, pos_b = 150, 300
    C1b = s_text_b + 1024
    lys_b = [
        L.init_encoder_layer(k, Db, 4 * Db, adaptive=False)
        for k in jax.random.split(jax.random.PRNGKey(21), NLb)
    ]
    stacked_b = jax.tree.map(lambda *xs: jnp.stack(xs), *lys_b)
    lw_b = DS.pack_layer_weights(
        stacked_b, dtype=jnp.bfloat16,
        final_norm={"scale": jnp.ones((Db,)), "bias": jnp.zeros((Db,))},
        predict_w=jax.random.normal(jax.random.PRNGKey(22), (Db, 1025)) * 0.05,
        audio_embedding=jax.random.normal(jax.random.PRNGKey(23), (1026, Db)),
    )
    Nb = B5 * Db
    ck4b = jax.random.normal(
        jax.random.PRNGKey(24), (NLb, B5, Hb, C1b, hdb)
    ).astype(jnp.bfloat16)
    cv4b = jax.random.normal(
        jax.random.PRNGKey(25), (NLb, B5, Hb, C1b, hdb)
    ).astype(jnp.bfloat16)
    pref_b = s_text_b + plen_b + 1
    ck4b = ck4b.at[:, :, :, :pref_b].set(ck4b[:, :1, :, :pref_b])
    cv4b = cv4b.at[:, :, :, :pref_b].set(cv4b[:, :1, :, :pref_b])
    ckBb = jnp.zeros((NLb, C1b + 128, Nb), jnp.bfloat16)
    cvBb = jnp.zeros((NLb, C1b + 128, Nb), jnp.bfloat16)
    ckBb = ckBb.at[:, :C1b].set(
        jnp.stack([pack_cache(ck4b[i]) for i in range(NLb)])
    )
    cvBb = cvBb.at[:, :C1b].set(
        jnp.stack([pack_cache(cv4b[i]) for i in range(NLb)])
    )
    xlb = jnp.asarray(100, jnp.int32)
    tokb = jnp.asarray([7, 500, 901, 64, 1000], jnp.int32)
    ytok_b, *_ = DBm.decode_block_fused(
        tokb, jnp.zeros((B5,), jnp.float32), jnp.zeros((B5,), bool),
        jnp.zeros((B5,), jnp.float32), lw_b, ckBb, cvBb, xlb,
        jnp.asarray(pos_b), jnp.asarray(plen_b, jnp.int32),
        seed=jnp.asarray(1, jnp.int32),
        remaining=jnp.asarray(2**30, jnp.int32),
        temperature=jnp.asarray(1.0, jnp.float32),
        pe_alpha=jnp.asarray(1.0, jnp.float32),
        steps=Kb, s_text=s_text_b, num_heads=Hb, vocab=1025, eos=1024,
        stochastic=False,
    )
    cks_b, cvs_b = ckBb[:, :C1b], cvBb[:, :C1b]
    toks_b = tokb
    fed_ref_b = []
    for t in range(Kb):
        fed_ref_b.append(np.asarray(toks_b))
        _, tok_out_b, _, cks_b, cvs_b = DS._call_kernel(
            lw_b, cks_b, cvs_b, jnp.zeros((B5, Db), jnp.bfloat16),
            toks_b, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray([[1.0, 1.0]], jnp.float32),
            xlb, jnp.asarray(pos_b + t),
            s_text=s_text_b, num_heads=Hb, fused=True, vocab=1025,
        )
        toks_b = tok_out_b[:, 0]
    same_b = (np.asarray(ytok_b) == np.stack(fed_ref_b)).all()
    print(f"beams divergent-lane teacher-forced (B=5): exact={bool(same_b)}")
    ok = ok and bool(same_b)

    print("TPU CHECKS", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
