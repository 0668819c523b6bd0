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


def _reload():
    from vallex_tpu.ops import decode_block as DB
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV

    importlib.reload(DS)
    importlib.reload(DB)
    importlib.reload(DV)
    importlib.reload(AR)
