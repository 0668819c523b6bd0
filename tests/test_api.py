"""Public API tests: preload, preset compatibility, end-to-end synthesis."""

import numpy as np
import pytest

from vallex_tpu import api
from vallex_tpu.config import EngineConfig, ModelConfig

TINY = ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=256)
ECFG = EngineConfig(
    text_buckets=(64, 128),
    audio_buckets=(128, 256, 512),
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("empty_ckpts")
    return api.preload_models(
        str(ckpt), random_weights=True, cfg=TINY, ecfg=ECFG
    )


def test_preload_requires_checkpoint_by_default(tmp_path):
    with pytest.raises(FileNotFoundError):
        api.preload_models(str(tmp_path))


def test_preset_npz_format_loads(bundle):
    """All 41 shipped preset voices must load in the reference npz format."""
    import os

    presets = os.listdir(api.PROMPT_SEARCH_DIRS[-1])
    assert len(presets) == 41
    audio, text, lang = api._load_prompt("paimon")
    assert audio.ndim == 2 and audio.shape[1] == 8
    assert text.ndim == 1 and len(text) > 0
    assert lang in ("en", "zh", "ja")


def test_generate_audio_end_to_end(bundle):
    wave = api.generate_audio("Hi there.", prompt=None, language="en", top_k=1)
    assert wave.ndim == 1
    assert len(wave) > 0
    assert np.isfinite(wave).all()


def test_generate_audio_with_preset_prompt(bundle):
    wave = api.generate_audio(
        "Hello.", prompt="paimon", language="en", top_k=1
    )
    assert wave.ndim == 1 and len(wave) > 0


@pytest.mark.slow
def test_generate_audio_max_duration(bundle):
    """max_duration caps generated audio (random weights never emit EOS,
    so uncapped generation runs to the 16*text_len frame cap)."""
    from vallex_tpu.config import ENCODEC_FRAME_RATE
    from vallex_tpu.codec.vocos import HOP

    text = "The quick brown fox jumps over the lazy dog near the river."
    capped = api.generate_audio(
        text, language="en", top_k=1, max_duration=1.0
    )
    free = api.generate_audio(text, language="en", top_k=1)
    assert len(capped) == ENCODEC_FRAME_RATE * HOP  # exactly 1 s of frames
    assert len(free) > len(capped)
    assert np.isfinite(capped).all()
    # (no waveform-prefix equality: NAR attention is bidirectional over the
    # full sequence, so a different capped length changes every frame)


def test_generate_audio_accent_control(bundle):
    w1 = api.generate_audio("Hello.", language="en", accent="中文", top_k=1)
    w2 = api.generate_audio("Hello.", language="en", accent="no-accent", top_k=1)
    # accent changes the language embedding → different tokens/waveform
    assert (len(w1) != len(w2)) or not np.allclose(w1, w2)


@pytest.mark.slow
def test_long_text_fixed_prompt(bundle):
    wave = api.generate_audio_from_long_text(
        "One sentence here. Another one there.",
        prompt="paimon",
        mode="fixed-prompt",
    )
    assert wave.ndim == 1 and len(wave) > 0


def test_make_prompt_roundtrip(bundle, tmp_path):
    from vallex_tpu.utils.audio import save_wav

    wav = (0.1 * np.sin(np.arange(24000) * 0.05)).astype(np.float32)
    p = str(tmp_path / "clip.wav")
    save_wav(p, wav)
    out = api.make_prompt(
        "testvoice", p, transcript="A test clip.", out_dir=str(tmp_path)
    )
    data = np.load(out)
    assert data["audio_tokens"].shape[2] == 8
    assert data["audio_tokens"].shape[1] == 75  # 1 s → 75 frames
    assert int(data["lang_code"]) == 2  # en
    # and it can be used as a prompt by path
    wave = api.generate_audio("Testing.", prompt=out, top_k=1)
    assert len(wave) > 0


def test_make_prompt_rejects_long_audio(bundle, tmp_path):
    from vallex_tpu.utils.audio import save_wav

    wav = np.zeros(24000 * 16, np.float32)
    p = str(tmp_path / "long.wav")
    save_wav(p, wav)
    with pytest.raises(ValueError, match="15 seconds"):
        api.make_prompt("x", p, transcript="hi", out_dir=str(tmp_path))


def test_seed_scalar_matches_prngkey(bundle):
    """ar_generate accepts a raw int32 seed (built into a PRNG key inside
    the program — engine/pipeline.py avoids the ~1 ms host-side PRNGKey);
    the emitted tokens must be identical to passing jax.random.PRNGKey(seed)."""
    import jax
    import jax.numpy as jnp

    from vallex_tpu.engine.ar import ar_generate

    b = api._bundle
    tok, lang = api._prepare_text(
        b, "Seed check.", np.zeros((0,), np.int32), None, "en"
    )
    S = len(tok)
    s_text = 64
    text_pad = np.zeros((1, s_text), np.int32)
    text_pad[0, :S] = tok
    lang_pad = np.zeros((1, s_text), np.int32)
    lang_pad[0, :S] = lang
    prompt_pad = np.full((1, 127), b.cfg.eos_id, np.int32)

    def run(rng):
        res = ar_generate(
            b.params, b.cfg,
            jnp.asarray(text_pad), jnp.asarray(lang_pad),
            jnp.asarray(S, jnp.int32),
            jnp.asarray(prompt_pad), jnp.asarray(0, jnp.int32),
            rng,
            jnp.asarray(-100, jnp.int32), jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.9, jnp.float32),
            gen_limit=jnp.asarray(24, jnp.int32),
            s_text=s_text, p_audio=128, t_audio=256, beams=1,
            compute_dtype="float32", decode_mode="xla",
        )
        n = int(res.gen_len)
        return np.asarray(res.tokens)[int(res.best_beam), 1 : 1 + n]

    a = run(jnp.asarray(42, jnp.int32))
    key = run(jax.random.PRNGKey(42))
    assert len(a) > 0
    np.testing.assert_array_equal(a, key)


def test_stream_long_text_matches_nonstreaming_length(bundle):
    """stream_audio_from_long_text yields one wave per sentence with the
    same token sequences as generate_audio_from_long_text (same seeds), so
    the concatenated sample count must match exactly (vocoding runs per
    sentence, but length is gen_frames * HOP either way)."""
    text = "First thing. Second thing. Third thing."
    full = api.generate_audio_from_long_text(
        text, prompt="paimon", mode="sliding-window", seed=3
    )
    parts = list(api.stream_audio_from_long_text(
        text, prompt="paimon", mode="sliding-window", seed=3
    ))
    assert len(parts) == 3  # one yield per sentence
    assert all(np.isfinite(p).all() for p in parts)
    assert sum(len(p) for p in parts) == len(full)


def test_generate_audio_code_switched_mix(bundle):
    """Code-switched zh/en input goes through language='mix' (reference:
    generation.py:96-138 detects per-span languages; lang prompt falls
    back to en) and must synthesize end-to-end."""
    wave = api.generate_audio(
        "我喜欢 machine learning 和语音合成。", prompt="paimon", top_k=1,
    )
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()


def test_empty_text_raises_clearly(bundle):
    with pytest.raises(ValueError, match="[Ee]mpty text"):
        api.generate_audio("", prompt=None, language="en", top_k=1)


def test_text_past_largest_bucket_auto_extends(bundle):
    """Text longer than the largest configured text bucket must
    auto-extend (one extra compile at 128-granularity) rather than fail —
    the reference accepts any length up to its ~22 s audio ceiling."""
    long_text = (
        "The quick brown fox jumps over the lazy dog and keeps running. "
        * 4
    )
    wave = api.generate_audio(
        long_text, prompt=None, language="en", top_k=1, max_duration=0.5
    )
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()


def test_long_text_language_mix_prompt_swap(bundle):
    """language='mix' (user-tagged text, the reference's contract for
    code-switched input) with the sliding-window prompt swap used to
    crash with KeyError('mix') when the swap assigned 'mix' as the next
    sentence's prompt language — it must fall back to 'en' like
    generate_audio's prologue. RandomState(1).rand()<0.5, so the first
    swap definitely triggers."""
    text = (
        "[EN]First sentence here[EN]。[ZH]第二句在这里[ZH]。"
        "[EN]Third one closes[EN]。"
    )
    wave = api.generate_audio_from_long_text(
        text, prompt="paimon", language="mix", mode="sliding-window",
        seed=1,
    )
    assert wave.ndim == 1 and len(wave) > 0
    parts = list(api.stream_audio_from_long_text(
        text, prompt="paimon", language="mix", mode="sliding-window",
        seed=1,
    ))
    assert sum(len(p) for p in parts) == len(wave)


def test_overlong_prompt_raises_clearly(bundle):
    """A voice prompt too long for the largest audio bucket must raise a
    clear ValueError, not crash with a numpy broadcast error or silently
    emit garbage from a negative generation cap."""
    too_long = np.zeros((ECFG.audio_buckets[-1] - 1, 8), np.int32)
    with pytest.raises(ValueError, match="voice prompt"):
        bundle.pipeline.synthesize(
            np.arange(5, dtype=np.int32), np.zeros(5, np.int32), too_long,
            top_k=1, return_wave=False,
        )


def test_empty_batch_returns_empty(bundle):
    assert api.generate_audio_batch([], None) == []


def test_engines_share_one_packed_cache(bundle):
    assert bundle.ar.packed_cache is bundle.pipeline.packed_cache


def test_prompt_device_buffers_cached(bundle):
    pipe = api._bundle.pipeline
    pipe._prompt_cache.clear()
    for seed in (0, 1):
        api.generate_audio("Cache the prompt.", prompt="paimon",
                           top_k=1, seed=seed, max_duration=0.3)
    assert len(pipe._prompt_cache) == 1  # same prompt+buckets → one entry
