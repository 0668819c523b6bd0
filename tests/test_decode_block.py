"""K-step block megakernel (ops/decode_block.py) vs single-step fused path.

The block kernel runs K decode steps per pallas_call with in-kernel beam
bookkeeping; it must produce the SAME tokens, generated length and
accumulated logprobs as the verified single-step fused megakernel
(identical per-step PRNG seeds make even the stochastic path exact).
"""

import importlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def _generate(
    params, steps, *, greedy, beams=1, seed=3, prompt=None,
    speculative="off",
):
    rng = np.random.RandomState(5)
    S = 12
    text = rng.randint(5, 100, size=S).astype(np.int32)
    lang = np.zeros(S, np.int32)
    e = EngineConfig(
        text_buckets=(128,), audio_buckets=(512,),
        compute_dtype="float32", decode_mode="megakernel",
        decode_steps=steps, best_of=beams, speculative=speculative,
    )
    eng = AR.AREngine(params, CFG, e)
    gen, buf = eng.generate(
        text, lang, prompt,
        top_k=1 if greedy else -100, temperature=1.0, seed=seed,
    )
    return gen, buf


# NOTE: the stochastic (Gumbel/on-core-PRNG) path has no CPU interpret
# lowering (prng_seed); its block-vs-single parity is checked on real TPU by
# tools/tpu_checks.py. CPU tests cover the greedy path, which exercises the
# same bookkeeping and attention math.
@pytest.mark.parametrize("greedy", [True])
def test_block_matches_single_step(params, monkeypatch, greedy):
    _interpret(monkeypatch)
    try:
        gen1, buf1 = _generate(params, 1, greedy=greedy)
        gen4, buf4 = _generate(params, 4, greedy=greedy)
        assert gen1.shape == gen4.shape, (gen1.shape, gen4.shape)
        np.testing.assert_array_equal(gen1, gen4)
        np.testing.assert_array_equal(buf1[: len(buf4)], buf4[: len(buf1)])
    finally:
        monkeypatch.undo()
        _reload()


def test_block_filtered_greedy_matches_plain(params, monkeypatch):
    """top_k=1 with top_p<1 routes through the in-kernel bisection filter
    (filtered=True, ops/sampling.py::filtered_keep_mask) in greedy mode;
    the shift-right nucleus always keeps the argmax token, so the filtered
    fused block path must emit EXACTLY the plain greedy tokens. (The
    stochastic filtered path needs on-core PRNG — checked on hardware by
    tools/tpu_checks.py: top_p→0 filtered sampling == greedy bitwise.)"""
    _interpret(monkeypatch)
    try:
        rng = np.random.RandomState(5)
        S = 12
        text = rng.randint(5, 100, size=S).astype(np.int32)
        lang = np.zeros(S, np.int32)
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", decode_mode="megakernel",
            decode_steps=4, best_of=1, speculative="off",
        )
        eng = AR.AREngine(params, CFG, e)
        gen_plain, _ = eng.generate(
            text, lang, None, top_k=1, top_p=1.0, temperature=1.0, seed=3
        )
        gen_filt, _ = eng.generate(
            text, lang, None, top_k=1, top_p=0.9, temperature=1.0, seed=3
        )
        np.testing.assert_array_equal(gen_plain, gen_filt)
    finally:
        monkeypatch.undo()
        _reload()


def test_speculative_matches_plain_greedy(params, monkeypatch):
    """Greedy speculative decoding (int8 draft + bf16 verify) must emit
    EXACTLY the tokens of the per-token greedy path — acceptance logic,
    EOS forcing and cache rewind included."""
    _interpret(monkeypatch)
    try:
        gen1, buf1 = _generate(params, 1, greedy=True, speculative="off")
        gens, bufs = _generate(params, 4, greedy=True, speculative="auto")
        assert gen1.shape == gens.shape, (gen1.shape, gens.shape)
        np.testing.assert_array_equal(gen1, gens)
    finally:
        monkeypatch.undo()
        _reload()


def test_speculative_matches_plain_greedy_with_prompt(params, monkeypatch):
    _interpret(monkeypatch)
    try:
        rng = np.random.RandomState(9)
        prompt = rng.randint(0, 1024, size=17).astype(np.int32)
        gen1, _ = _generate(
            params, 1, greedy=True, prompt=prompt, speculative="off"
        )
        gens, _ = _generate(
            params, 4, greedy=True, prompt=prompt, speculative="auto"
        )
        np.testing.assert_array_equal(gen1, gens)
    finally:
        monkeypatch.undo()
        _reload()


def test_block_matches_single_step_with_prompt_and_beams(params, monkeypatch):
    _interpret(monkeypatch)
    try:
        rng = np.random.RandomState(9)
        prompt = rng.randint(0, 1024, size=17).astype(np.int32)
        gen1, _ = _generate(params, 1, greedy=True, beams=3, prompt=prompt)
        gen4, _ = _generate(params, 4, greedy=True, beams=3, prompt=prompt)
        np.testing.assert_array_equal(gen1, gen4)
    finally:
        monkeypatch.undo()
        _reload()


def test_block_beams_long_prompt_shared_prefix(params, monkeypatch):
    """Beams with a >=128-frame prompt drive the B>1 shared-prefix DMA
    schedule (lane-sliced text + 128-row shared prompt sub-blocks + tail
    sub-blocks) — must match the single-step path exactly."""
    _interpret(monkeypatch)
    try:
        rng = np.random.RandomState(21)
        prompt = rng.randint(0, 1024, size=150).astype(np.int32)
        gen1, _ = _generate(params, 1, greedy=True, beams=3, prompt=prompt)
        gen4, _ = _generate(params, 4, greedy=True, beams=3, prompt=prompt)
        np.testing.assert_array_equal(gen1, gen4)
    finally:
        monkeypatch.undo()
        _reload()


def test_beams_divergent_lanes_shared_prefix(params, monkeypatch):
    """Kernel-level check with DIVERGENT beam lanes: greedy engine beams
    are identical (same argmax per beam), so the engine tests can't see a
    cross-lane indexing bug in the B>1 shared-prefix schedule. Here the
    generated-region cache rows and fed tokens DIFFER per beam; the block
    kernel must track per-step decode_step_fused on every lane."""
    _interpret(monkeypatch)
    try:
        import jax.numpy as jnp

        from vallex_tpu.models import layers as L
        from vallex_tpu.ops import decode_block as DB
        from vallex_tpu.ops import decode_step as DS
        from vallex_tpu.ops.decode_attention import pack_cache

        key = jax.random.PRNGKey(0)
        NL_, B, H_, D_, F_ = 2, 3, 4, 256, 512
        hd = D_ // H_
        s_text, K = 128, 4
        plen, pos0 = 150, 300  # n_sh = 1 shared prompt sub-block
        t_audio = 512
        C1 = s_text + t_audio
        lys = [
            L.init_encoder_layer(k, D_, F_, adaptive=False)
            for k in jax.random.split(key, NL_)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *lys)
        fnorm = {"scale": jnp.ones((D_,)), "bias": jnp.zeros((D_,))}
        wpred = jax.random.normal(jax.random.PRNGKey(9), (D_, 1025)) * 0.05
        emb = jax.random.normal(jax.random.PRNGKey(10), (1026, D_))
        lw = DS.pack_layer_weights(
            stacked, dtype=jnp.float32, final_norm=fnorm, predict_w=wpred,
            audio_embedding=emb,
        )
        # cache: prefix rows (text + audio <= plen) IDENTICAL across
        # beams (engine invariant); generated rows distinct per beam
        ck4 = jax.random.normal(jax.random.PRNGKey(2), (NL_, B, H_, C1, hd))
        cv4 = jax.random.normal(jax.random.PRNGKey(3), (NL_, B, H_, C1, hd))
        pref = s_text + plen + 1
        ck4 = ck4.at[:, :, :, :pref].set(ck4[:, :1, :, :pref])
        cv4 = cv4.at[:, :, :, :pref].set(cv4[:, :1, :, :pref])
        N = B * H_ * hd
        ckB = jnp.zeros((NL_, C1 + 128, N), jnp.float32)
        cvB = jnp.zeros((NL_, C1 + 128, N), jnp.float32)
        ckB = ckB.at[:, :C1].set(
            jnp.stack([pack_cache(ck4[i]) for i in range(NL_)])
        )
        cvB = cvB.at[:, :C1].set(
            jnp.stack([pack_cache(cv4[i]) for i in range(NL_)])
        )
        x_len = jnp.asarray(100, jnp.int32)
        tok0 = jnp.asarray([7, 500, 901], jnp.int32)  # divergent feeds

        ytok, *_ = DB.decode_block_fused(
            tok0, jnp.zeros((B,), jnp.float32),
            jnp.zeros((B,), bool), jnp.zeros((B,), jnp.float32),
            lw, ckB, cvB, x_len, jnp.asarray(pos0),
            jnp.asarray(plen, jnp.int32),
            seed=jnp.asarray(1, jnp.int32),
            remaining=jnp.asarray(2**30, jnp.int32),
            temperature=jnp.asarray(1.0, jnp.float32),
            pe_alpha=jnp.asarray(1.0, jnp.float32),
            steps=K, s_text=s_text, num_heads=H_, vocab=1025, eos=1024,
            stochastic=False,
        )
        # reference: per-step single-step fused kernel on the same state
        cks = ckB[:, :C1]
        cvs = cvB[:, :C1]
        toks = tok0
        fed_ref = []
        for t in range(K):
            fed_ref.append(np.asarray(toks))
            logits, tok_out, _, cks, cvs = DS._call_kernel(
                lw, cks, cvs, jnp.zeros((B, D_), jnp.float32),
                toks, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
                jnp.asarray([[1.0, 1.0]], jnp.float32),
                x_len, jnp.asarray(pos0 + t),
                s_text=s_text, num_heads=H_, fused=True, vocab=1025,
            )
            toks = tok_out[:, 0]
        np.testing.assert_array_equal(
            np.asarray(ytok), np.stack(fed_ref),
        )
    finally:
        monkeypatch.undo()
        _reload()


def test_step_logits_output_consistent(params, monkeypatch):
    """The block kernel's per-step logits output (the draft side of
    speculative sampling) must be the distribution each step sampled
    from: in greedy mode, argmax(step_logits[j]) == the token fed at
    step j+1."""
    _interpret(monkeypatch)
    try:
        import jax.numpy as jnp

        from vallex_tpu.models import layers as L
        from vallex_tpu.ops import decode_block as DB
        from vallex_tpu.ops import decode_step as DS
        from vallex_tpu.ops.decode_attention import pack_cache

        key = jax.random.PRNGKey(0)
        NL_, B, H_, D_, F_ = 2, 1, 4, 256, 512
        hd = D_ // H_
        s_text, K = 128, 4
        plen, pos0 = 20, 100
        C1 = s_text + 512
        lys = [
            L.init_encoder_layer(k, D_, F_, adaptive=False)
            for k in jax.random.split(key, NL_)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *lys)
        lw = DS.pack_layer_weights(
            stacked, dtype=jnp.float32,
            final_norm={"scale": jnp.ones((D_,)), "bias": jnp.zeros((D_,))},
            predict_w=jax.random.normal(jax.random.PRNGKey(9), (D_, 1025))
            * 0.05,
            audio_embedding=jax.random.normal(
                jax.random.PRNGKey(10), (1026, D_)
            ),
        )
        N = B * H_ * hd
        ck4 = jax.random.normal(jax.random.PRNGKey(2), (NL_, B, H_, C1, hd))
        cv4 = jax.random.normal(jax.random.PRNGKey(3), (NL_, B, H_, C1, hd))
        ckB = jnp.zeros((NL_, C1 + 128, N), jnp.float32).at[:, :C1].set(
            jnp.stack([pack_cache(ck4[i]) for i in range(NL_)])
        )
        cvB = jnp.zeros((NL_, C1 + 128, N), jnp.float32).at[:, :C1].set(
            jnp.stack([pack_cache(cv4[i]) for i in range(NL_)])
        )
        ytok, next_tok, _, _, _, _, _, slog = DB.decode_block_fused(
            jnp.asarray([7], jnp.int32), jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), bool), jnp.zeros((1,), jnp.float32),
            lw, ckB, cvB, jnp.asarray(100, jnp.int32), jnp.asarray(pos0),
            jnp.asarray(plen, jnp.int32),
            seed=jnp.asarray(1, jnp.int32),
            remaining=jnp.asarray(2**30, jnp.int32),
            temperature=jnp.asarray(1.0, jnp.float32),
            pe_alpha=jnp.asarray(1.0, jnp.float32),
            steps=K, s_text=s_text, num_heads=H_, vocab=1025, eos=1024,
            stochastic=False,
        )
        slog = np.asarray(slog)  # [K, 1, VP]
        fed = np.asarray(ytok[:, 0])
        nxt = int(next_tok[0])
        greedy = np.argmax(slog[:, 0, :1025], axis=-1)
        np.testing.assert_array_equal(greedy[:-1], fed[1:])
        assert greedy[-1] == nxt
    finally:
        monkeypatch.undo()
        _reload()


def _reload():
    from vallex_tpu.ops import decode_block as DB
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV

    importlib.reload(DS)
    importlib.reload(DB)
    importlib.reload(DV)
    importlib.reload(AR)
