"""Single-chip multi-request batched AR decode (engine/ar.py::
ar_generate_batch) vs per-request single runs.

Requests pack along the lane axis and share one weight stream; each has
its own text length, prompt length, PE phase, EOS bookkeeping and length
cap. Greedy decode must produce EXACTLY the same tokens as running each
request alone through the verified single-request engine.
"""

import importlib

import numpy as np
import pytest
import jax

from vallex_tpu.config import EngineConfig, ModelConfig
from vallex_tpu.engine import ar as AR
from vallex_tpu.models import vallex as V

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier


D, H, NL = 256, 4, 2
CFG = ModelConfig(d_model=D, num_heads=H, num_layers=NL, ffn_dim=2 * D)


@pytest.fixture(scope="module")
def params():
    return V.init_vallex(jax.random.PRNGKey(11), CFG)


def _interpret(monkeypatch):
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call
    monkeypatch.setattr(
        pl_mod, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    from vallex_tpu.ops import decode_block as DB
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV

    importlib.reload(DS)
    importlib.reload(DB)
    importlib.reload(DV)
    importlib.reload(AR)


def _reload():
    from vallex_tpu.ops import decode_block as DB
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV

    importlib.reload(DS)
    importlib.reload(DB)
    importlib.reload(DV)
    importlib.reload(AR)


def _requests():
    rng = np.random.RandomState(5)
    reqs = []
    for S, Tp in ((12, 17), (9, 150), (14, 0)):
        text = rng.randint(5, 100, size=S).astype(np.int32)
        lang = np.zeros(S, np.int32)
        prompt = (
            rng.randint(0, 1024, size=Tp).astype(np.int32) if Tp else None
        )
        reqs.append((text, lang, prompt))
    return reqs


def test_api_generate_audio_batch(monkeypatch):
    """Public batched API end-to-end (AR batch → batched NAR → Vocos) vs
    per-request generate_audio — waveforms must match."""
    _interpret(monkeypatch)
    try:
        from vallex_tpu import api

        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
        )
        cfg = ModelConfig(
            d_model=D, num_heads=H, num_layers=NL, ffn_dim=2 * D
        )
        api.preload_models(
            "/tmp/nonexistent-ck", random_weights=True, cfg=cfg, ecfg=e
        )
        texts = ["Hi there.", "Go now."]
        prompts = ["paimon", None]
        waves = api.generate_audio_batch(
            texts, prompts, top_k=1, seed=5
        )
        for text, prompt, wave_b in zip(texts, prompts, waves):
            wave_s = api.generate_audio(
                text, prompt, top_k=1, best_of=1, seed=5
            )
            assert wave_b.shape == wave_s.shape, (
                wave_b.shape, wave_s.shape,
            )
            np.testing.assert_allclose(wave_b, wave_s, atol=1e-4)
    finally:
        api._bundle = None
        monkeypatch.undo()
        _reload()


def test_long_text_batch_size_uses_measured_optimum():
    from vallex_tpu import api

    assert api._long_text_batch_size(EngineConfig(quantize="int8kv")) == 8
    for q in ("none", "int8", "w8a8"):
        assert api._long_text_batch_size(EngineConfig(quantize=q)) == 4


def test_long_text_batched_chunking_exact(monkeypatch):
    """Long-text fixed-prompt batching chunks sentences at the measured
    batch optimum — with more sentences than one chunk, the chunking math
    must still yield exactly the per-sentence greedy codes. (quantize=none
    keeps the batched-equals-single guarantee bitwise; int8kv derives its
    KV scales batch-wide, so its exactness is vs synthesize_batch, covered
    by test_int8kv_runs_all_paths.)"""
    _interpret(monkeypatch)
    try:
        from vallex_tpu import api
        from vallex_tpu.frontend.sentence import split_text_into_sentences

        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
            top_k=1,
        )
        cfg = ModelConfig(
            d_model=D, num_heads=H, num_layers=NL, ffn_dim=2 * D
        )
        bundle = api.preload_models(
            "/tmp/nonexistent-ck", random_weights=True, cfg=cfg, ecfg=e
        )
        # 5 short sentences -> chunks of 4 + 1 with BATCH=4
        text = "Go on. " * 5
        sentences = split_text_into_sentences(text)
        assert len(sentences) == 5
        wave_lt = api.generate_audio_from_long_text(
            text, prompt="paimon", mode="fixed-prompt", seed=0
        )
        # per-sentence greedy singles, concatenated, single vocoder pass
        audio_prompt, text_prompt, lang_pr = api._load_prompt("paimon")
        parts = []
        for sent in sentences:
            tid, lid = api._prepare_text(
                bundle, sent, text_prompt, lang_pr, "auto", "no-accent"
            )
            codes, _ = bundle.pipeline.synthesize(
                tid, lid, audio_prompt, best_of=1, top_k=1, seed=0,
                return_wave=False,
            )
            parts.append(codes)
        wave_s = api.codes_to_wave(bundle, np.concatenate(parts, axis=0))
        np.testing.assert_allclose(wave_lt, wave_s, atol=1e-4)
    finally:
        api._bundle = None
        monkeypatch.undo()
        _reload()


def test_int8kv_runs_all_paths(params, monkeypatch):
    """int8 KV cache mode (quantize='int8kv'): static per-(layer, head)
    scales fold into q / the output accumulator, the cache and in-kernel
    K/V writes go int8. Functional check across single / beams / batched;
    quality is measured on hardware by tools/quant_fidelity.py."""
    _interpret(monkeypatch)
    try:
        rng = np.random.RandomState(5)
        S = 12
        text = rng.randint(5, 100, size=S).astype(np.int32)
        lang = np.zeros(S, np.int32)
        prompt = rng.randint(0, 1024, size=150).astype(np.int32)
        outs = {}
        for q in ("int8", "int8kv"):
            e = EngineConfig(
                text_buckets=(128,), audio_buckets=(512,),
                compute_dtype="float32", decode_mode="megakernel",
                decode_steps=4, quantize=q, speculative="off",
            )
            eng = AR.AREngine(params, CFG, e)
            gen, _ = eng.generate(
                text, lang, prompt, top_k=1, temperature=1.0, seed=3
            )
            outs[q] = gen
        # int8-KV noise is small: greedy must track plain-int8 for a while
        a, b = outs["int8"], outs["int8kv"]
        n = min(len(a), len(b))
        div = int(np.argmax(a[:n] != b[:n])) if (a[:n] != b[:n]).any() else n
        assert div >= 10, f"int8kv diverged from int8 at frame {div}"

        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, quantize="int8kv", best_of=3,
            speculative="off",
        )
        eng = AR.AREngine(params, CFG, e)
        gen, _ = eng.generate(
            text, lang, prompt, top_k=1, temperature=1.0, seed=3
        )
        assert len(gen) > 0
        outs_b = eng.generate_batch(
            [(text, lang, prompt), (text[:9], lang[:9], None)],
            top_k=1, temperature=1.0, seed=3,
        )
        assert all(len(o) > 0 for o in outs_b)
    finally:
        monkeypatch.undo()
        _reload()


def test_batched_matches_single_requests(params, monkeypatch):
    _interpret(monkeypatch)
    try:
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
        )
        eng = AR.AREngine(params, CFG, e)
        reqs = _requests()
        batched = eng.generate_batch(reqs, top_k=1, temperature=1.0, seed=3)
        assert len(batched) == len(reqs)
        for r, (text, lang, prompt) in enumerate(reqs):
            single, _ = eng.generate(
                text, lang, prompt, top_k=1, temperature=1.0, seed=3,
                best_of=1,
            )
            np.testing.assert_array_equal(
                batched[r], single,
                err_msg=f"request {r} diverged from its single run",
            )
    finally:
        monkeypatch.undo()
        _reload()


def test_batched_filtered_greedy_matches_plain(params, monkeypatch):
    """The batched engine accepts filtered sampling (top_k > 1 /
    top_p < 1) through the in-kernel bisection filter. Greedy (top_k=1)
    with top_p < 1 routes filtered=True; the shift-right nucleus keeps the
    argmax token, so outputs must equal the plain batched greedy run.
    (The stochastic filtered path needs on-core PRNG — hardware-checked by
    tools/tpu_checks.py.)"""
    _interpret(monkeypatch)
    try:
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
        )
        eng = AR.AREngine(params, CFG, e)
        reqs = _requests()
        plain = eng.generate_batch(reqs, top_k=1, temperature=1.0, seed=3)
        filt = eng.generate_batch(
            reqs, top_k=1, top_p=0.9, temperature=1.0, seed=3
        )
        assert len(plain) == len(filt)
        for r in range(len(reqs)):
            np.testing.assert_array_equal(
                plain[r], filt[r],
                err_msg=f"request {r}: filtered greedy != plain greedy",
            )
    finally:
        monkeypatch.undo()
        _reload()


def test_beam_batched_best_of_exactness(params, monkeypatch):
    """best_of ACROSS requests (beams>1 in ar_generate_batch) is exactly
    R x B independent lane rows plus a per-request argmax: running the
    same requests expanded B times at beams=1 must produce bit-identical
    rows, and the returned best sample must be the numpy argmax of the
    expanded rows' length-normalized logprobs. Greedy here (the in-kernel
    PRNG has no interpret-mode lowering on CPU); the stochastic
    beam-diversity + selection check runs on hardware
    (tools/best_of_checks.py)."""
    import jax.numpy as jnp

    _interpret(monkeypatch)
    try:
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
        )
        reqs = _requests()[:2]
        B = 3

        def run(requests, beams):
            pb = AR.pad_batched_requests(
                requests, CFG.eos_id, CFG.num_quantizers,
                e.text_buckets, e.audio_buckets,
            )
            return [
                np.asarray(o) for o in AR.ar_generate_batch(
                    params, CFG,
                    jnp.asarray(pb["text"]), jnp.asarray(pb["lang"]),
                    jnp.asarray(pb["x_lens"]),
                    jnp.asarray(pb["prompt_pad"]),
                    jnp.asarray(pb["prompt_lens"]),
                    jnp.asarray(pb["caps"]),
                    jnp.asarray(3, jnp.int32),  # seed
                    jnp.asarray(1, jnp.int32),  # top_k=1: greedy
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(1.0, jnp.float32),
                    s_text=pb["s_text"], p_audio=pb["p_audio"],
                    t_gen=pb["t_gen"],
                    compute_dtype="float32", greedy=True,
                    quantize="none", decode_steps=4, plain_sampling=True,
                    beams=beams, length_penalty=1.0,
                )
            ]
        y_best, len_best, avg_lp = run(reqs, B)
        expanded = [r for r in reqs for _ in range(B)]
        y_all, len_all, avg_all = run(expanded, 1)
        assert avg_lp.shape == (2, B) and avg_all.shape == (2 * B, 1)
        # identical lane rows -> identical per-row scores
        np.testing.assert_allclose(
            avg_lp.reshape(-1), avg_all.reshape(-1), rtol=1e-6
        )
        for r in range(2):
            pick = int(np.argmax(avg_lp[r]))
            row = r * B + pick
            np.testing.assert_array_equal(y_best[r], y_all[row])
            assert len_best[r] == len_all[row]
    finally:
        monkeypatch.undo()
        _reload()


def test_engine_generate_batch_best_of(params, monkeypatch):
    """AREngine.generate_batch(best_of=B) greedy: beams are clones, so
    best_of must degenerate to exactly the best_of=1 tokens (the
    stochastic beam-membership check runs on hardware —
    tools/best_of_checks.py, the in-kernel PRNG has no CPU interpret
    lowering)."""
    _interpret(monkeypatch)
    try:
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, speculative="off",
        )
        eng = AR.AREngine(params, CFG, e)
        reqs = _requests()[:2]
        B = 3
        g_best = eng.generate_batch(
            reqs, best_of=B, top_k=1, temperature=1.0, seed=3
        )
        g_one = eng.generate_batch(
            reqs, best_of=1, top_k=1, temperature=1.0, seed=3
        )
        for r in range(2):
            np.testing.assert_array_equal(g_best[r], g_one[r])
    finally:
        monkeypatch.undo()
        _reload()
