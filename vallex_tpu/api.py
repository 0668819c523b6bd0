"""Public synthesis API — the reference's L5 surface, TPU-native.

Mirrors utils/generation.py and utils/prompt_making.py:
  preload_models()                     (generation.py:50-89)
  generate_audio(text, prompt, language, accent)      (generation.py:91-152)
  generate_audio_from_long_text(..., mode)            (generation.py:154-276)
  make_prompt(name, audio_prompt_path, transcript)    (prompt_making.py:57-84)

Voice prompts use the reference's exact `.npz` format (keys `audio_tokens`
(1,T,8) int64, `text_tokens` (1,S) int64, `lang_code` int32), so the 41
shipped preset voices load unchanged.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .config import (
    ENCODEC_FRAME_RATE as FRAME_RATE,
    NUM_QUANTIZERS,
    SAMPLE_RATE,
    EngineConfig,
    ModelConfig,
    code2lang,
    lang2code,
    lang2token,
    langdropdown2token,
    model_language_id,
    token2lang,
)
from .engine import AREngine, NAREngine
from .engine.pipeline import SynthesisPipeline
from .frontend import PhonemeTokenizer, get_text_token_collater
from .frontend.langid import classify
from .frontend.sentence import split_text_into_sentences

logger = logging.getLogger(__name__)

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")

# preset search paths, first hit wins (reference: generation.py:103-110)
PROMPT_SEARCH_DIRS = [
    "./presets",
    "./customs",
    os.path.join(_ASSET_DIR, "presets"),
]
if os.environ.get("VALLEX_PRESETS_DIR"):
    PROMPT_SEARCH_DIRS.insert(0, os.environ["VALLEX_PRESETS_DIR"])


@dataclass
class ModelBundle:
    params: Dict[str, Any]
    cfg: ModelConfig
    ecfg: EngineConfig
    ar: AREngine
    nar: NAREngine
    pipeline: Optional[SynthesisPipeline] = None
    vocos_params: Optional[Dict[str, Any]] = None
    encodec_params: Optional[Dict[str, Any]] = None
    tokenizer: PhonemeTokenizer = field(default_factory=PhonemeTokenizer)
    collater: Any = field(default_factory=get_text_token_collater)
    random_weights: bool = False


_bundle: Optional[ModelBundle] = None
_bundle_seed: Optional[int] = None  # init seed of a random-weights bundle


def preload_models(
    checkpoint_dir: str = "./checkpoints",
    *,
    random_weights: bool = False,
    cfg: Optional[ModelConfig] = None,
    ecfg: Optional[EngineConfig] = None,
    seed: int = 0,
) -> ModelBundle:
    """Build/load the model stack.

    Load order: native npz (`vallex-jax.npz`) → shipped torch checkpoint
    (`vallex-checkpoint.pt`, converted on the fly) → random init (only when
    random_weights=True — useful for benchmarks and structural testing).
    """
    global _bundle
    import jax

    # persistent compilation cache: a restarted process (server, CLI,
    # bench) reuses compiled decode programs instead of paying minutes of
    # fresh XLA/Mosaic compiles. A repo-local .jax_cache (shipped
    # pre-warmed for the bench/serving configs, still writable for new
    # shapes) wins over the /tmp default so a FRESH container starts
    # warm; VALLEX_COMPILE_CACHE overrides the location; set it empty to
    # disable.
    repo_cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    cache_dir = os.environ.get(
        "VALLEX_COMPILE_CACHE",
        repo_cache if os.path.isdir(repo_cache)
        else "/tmp/vallex-jax-cache",
    )
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # noqa: BLE001 (older jax: best-effort)
            pass

    cfg = cfg or ModelConfig()
    ecfg = ecfg or EngineConfig()

    # RE-PRELOAD with the same random-init model but a different engine
    # config (the bench sweeps quantize modes/buckets): reuse the
    # previous bundle's device params, codec params and — the expensive
    # part — its PackedWeightsCache, so each quantize mode's ~300 MB
    # packed weight set is prepared once per process instead of once per
    # preload (~20 s each through the tunnel). Checkpoint-backed loads
    # never reuse (a newly converted checkpoint must win over an earlier
    # random init).
    global _bundle_seed
    if (
        _bundle is not None
        and _bundle.random_weights
        and random_weights
        and seed == _bundle_seed
        and _bundle.cfg == cfg
        and _bundle.ecfg.compute_dtype == ecfg.compute_dtype
        and not os.path.exists(os.path.join(checkpoint_dir, "vallex-jax.npz"))
        and not os.path.exists(
            os.path.join(checkpoint_dir, "vallex-checkpoint.pt")
        )
    ):
        params = _bundle.params
        packed_cache = _bundle.pipeline.packed_cache
        _bundle = ModelBundle(
            params=params,
            cfg=cfg,
            ecfg=ecfg,
            ar=AREngine(params, cfg, ecfg, packed_cache=packed_cache),
            nar=NAREngine(params, cfg, ecfg),
            pipeline=SynthesisPipeline(
                params, cfg, ecfg, _bundle.vocos_params,
                packed_cache=packed_cache,
            ),
            vocos_params=_bundle.vocos_params,
            encodec_params=_bundle.encodec_params,
            random_weights=True,
        )
        return _bundle

    native = os.path.join(checkpoint_dir, "vallex-jax.npz")
    torch_ckpt = os.path.join(checkpoint_dir, "vallex-checkpoint.pt")
    vocos_native = os.path.join(checkpoint_dir, "vocos-jax.npz")
    encodec_native = os.path.join(checkpoint_dir, "encodec-jax.npz")

    from .utils import checkpoint as CK

    if os.path.exists(native):
        params = CK.load_native(native)
        rand = False
    elif os.path.exists(torch_ckpt):
        logger.info("converting torch checkpoint %s", torch_ckpt)
        params = CK.load_torch_checkpoint(torch_ckpt, cfg)
        CK.save_native(native, params)
        rand = False
    elif random_weights:
        logger.warning("no checkpoint found — using RANDOM weights")
        from .models.vallex import init_vallex

        params = init_vallex(jax.random.PRNGKey(seed), cfg)
        rand = True
        _bundle_seed = seed
    else:
        raise FileNotFoundError(
            f"No checkpoint in {checkpoint_dir}. Place the reference's "
            "vallex-checkpoint.pt there (see README) or pass "
            "random_weights=True for a structure-only run."
        )

    import jax.numpy as jnp

    if ecfg.compute_dtype == "bfloat16":
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    params = jax.device_put(params)

    from .codec import vocos as VC

    if os.path.exists(vocos_native):
        vocos_params = jax.device_put(CK.load_native(vocos_native))
    elif rand:
        vocos_params = jax.device_put(VC.init_vocos(jax.random.PRNGKey(1)))
    else:
        vocos_params = None

    encodec_params = None
    if os.path.exists(encodec_native):
        encodec_params = jax.device_put(CK.load_native(encodec_native))
    elif rand:
        from .codec import encodec as EC

        encodec_params = jax.device_put(EC.init_encodec(jax.random.PRNGKey(2)))

    # ONE packed-weight cache shared by every engine over these params —
    # private caches would pin duplicate ~300 MB packed sets on device
    from .engine.ar import PackedWeightsCache

    packed_cache = PackedWeightsCache(params)
    _bundle = ModelBundle(
        params=params,
        cfg=cfg,
        ecfg=ecfg,
        ar=AREngine(params, cfg, ecfg, packed_cache=packed_cache),
        nar=NAREngine(params, cfg, ecfg),
        pipeline=SynthesisPipeline(
            params, cfg, ecfg, vocos_params, packed_cache=packed_cache
        ),
        vocos_params=vocos_params,
        encodec_params=encodec_params,
        random_weights=rand,
    )
    return _bundle


def _require_bundle() -> ModelBundle:
    if _bundle is None:
        raise RuntimeError("call preload_models() first")
    return _bundle


def _find_prompt(prompt: str) -> str:
    if os.path.exists(prompt):
        return prompt
    for d in PROMPT_SEARCH_DIRS:
        p = os.path.join(d, prompt + ".npz")
        if os.path.exists(p):
            return p
    raise ValueError(f"Cannot find prompt {prompt}")


@functools.lru_cache(maxsize=256)
def _read_prompt_npz(path: str, mtime: float):
    """Disk read + parse, cached by (path, mtime): presets are re-used
    across every utterance of a session and the per-call .npz read costs
    ~2 ms. mtime keys the cache so a re-made custom prompt reloads."""
    data = np.load(path)
    audio = np.asarray(data["audio_tokens"], np.int32).reshape(
        -1, NUM_QUANTIZERS
    )
    text = np.asarray(data["text_tokens"], np.int32).reshape(-1)
    lang_pr = code2lang[int(data["lang_code"])]
    audio.setflags(write=False)
    text.setflags(write=False)
    return audio, text, lang_pr


def _load_prompt(prompt: Optional[str]):
    """→ (audio_tokens [T,8] int32, text_tokens [S] int32, lang code str)."""
    if prompt is None:
        return (
            np.zeros((0, NUM_QUANTIZERS), np.int32),
            np.zeros((0,), np.int32),
            None,
        )
    path = _find_prompt(prompt)
    return _read_prompt_npz(path, os.path.getmtime(path))


def _prepare_text(
    bundle: ModelBundle,
    text: str,
    text_prompt: np.ndarray,  # [Sp]
    lang_pr: Optional[str],
    language: str = "auto",
    accent: str = "no-accent",
):
    """Text + prompt text → (text_ids [S], per-position lang_ids [S])
    following the reference prologue (generation.py:96-138)."""
    text = text.replace("\n", "").strip(" ")
    if language == "auto":
        language = classify(text)
    lang_token = lang2token[language]
    lang = token2lang[lang_token]
    text = lang_token + text + lang_token
    if lang_pr is None:
        lang_pr = lang if lang != "mix" else "en"

    phone_tokens, langs = bundle.tokenizer.tokenize(text=f"_{text}".strip())
    text_ids, _ = bundle.collater([phone_tokens])
    text_ids = np.concatenate([text_prompt[None], text_ids], axis=1)[0]
    enroll = len(text_prompt)

    # per-position language ids (accent override: generation.py:137-138)
    if accent == "no-accent":
        text_langs = [model_language_id[l] for l in langs]
    else:
        accent_lang = token2lang[langdropdown2token[accent]]
        text_langs = [model_language_id[accent_lang]] * len(langs)
    lang_ids = np.concatenate(
        [
            np.full(enroll, model_language_id[lang_pr], np.int32),
            np.asarray(text_langs, np.int32),
        ]
    )
    return text_ids.astype(np.int32), lang_ids


def _synthesize_async(
    bundle: ModelBundle,
    text: str,
    audio_prompt: np.ndarray,  # [Tp, 8]
    text_prompt: np.ndarray,  # [Sp]
    lang_pr: Optional[str],
    language: str = "auto",
    accent: str = "no-accent",
    best_of: Optional[int] = None,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    seed: int = 0,
    return_wave: bool = False,
):
    """Dispatch one sentence's synthesis and return the PendingSynthesis
    handle WITHOUT the end-of-utterance host sync — the long-text loops
    dispatch sentence i+1 before fetching sentence i, hiding the ~20-30 ms
    tunnel round trip behind device compute (engine/pipeline.py)."""
    text_ids, lang_ids = _prepare_text(
        bundle, text, text_prompt, lang_pr, language, accent
    )
    return bundle.pipeline.synthesize_async(
        text_ids,
        lang_ids,
        audio_prompt if len(audio_prompt) else None,
        best_of=best_of,
        temperature=temperature,
        top_k=top_k,
        seed=seed,
        return_wave=return_wave and bundle.vocos_params is not None,
    )


def codes_to_wave(bundle: ModelBundle, codes: np.ndarray) -> np.ndarray:
    """[T, 8] codes → waveform via the JAX Vocos vocoder."""
    if bundle.vocos_params is None:
        raise RuntimeError(
            "Vocos weights unavailable (convert charactr/vocos-encodec-24khz "
            "to checkpoints/vocos-jax.npz)"
        )
    import jax.numpy as jnp

    from .codec.vocos import vocos_decode_bucketed

    wave = vocos_decode_bucketed(
        bundle.vocos_params, codes[None], bandwidth_id=2
    )
    return np.asarray(wave[0])


def generate_audio(
    text: str,
    prompt: Optional[str] = None,
    language: str = "auto",
    accent: str = "no-accent",
    *,
    best_of: Optional[int] = None,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
    max_duration: Optional[float] = None,
) -> np.ndarray:
    """Synthesize one utterance → float waveform @ 24 kHz
    (reference: generation.py:91-152; top_k/top_p are the reference
    model's sampling knobs, models/vallex.py:836-853). max_duration
    (seconds) caps the generated audio length — a serving knob beyond
    the reference's EOS-only stopping."""
    bundle = _require_bundle()
    audio_prompt, text_prompt, lang_pr = _load_prompt(prompt)
    text_ids, lang_ids = _prepare_text(
        bundle, text, text_prompt, lang_pr, language, accent
    )
    codes, wave = bundle.pipeline.synthesize(
        text_ids, lang_ids,
        audio_prompt if len(audio_prompt) else None,
        best_of=best_of, temperature=temperature, top_k=top_k,
        top_p=top_p, seed=seed,
        return_wave=bundle.vocos_params is not None,
        max_gen_frames=(
            None if max_duration is None
            else max(1, int(max_duration * FRAME_RATE))
        ),
    )
    if wave is None:
        return codes_to_wave(bundle, codes)
    return wave


def generate_audio_batch(
    texts: List[str],
    prompts: Optional[List[Optional[str]]] = None,
    language: str = "auto",
    accent: str = "no-accent",
    *,
    best_of: Optional[int] = None,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
) -> List[np.ndarray]:
    """Synthesize SEVERAL independent utterances in one batched pass on a
    single chip (green-field beyond the reference): all requests share
    every decode step's weight stream, so aggregate throughput scales with
    the batch until cache DMA dominates (engine/ar.py::ar_generate_batch).
    Requests may use different texts, languages and voice prompts; greedy,
    unfiltered sampling AND filtered sampling (top_k > 1 / 0 < top_p < 1,
    the reference's knob — models/vallex.py:836-853) all run the fused
    kernel path. best_of > 1 decodes that many samples per request on
    the shared lane axis and keeps each request's best by
    length-normalized logprob (the reference UI's signature quality
    mode, launch-ui.py:295). → list of float waveforms @ 24 kHz, one
    per text."""
    bundle = _require_bundle()
    if not texts:
        return []
    if prompts is None:
        prompts = [None] * len(texts)
    if len(prompts) != len(texts):
        raise ValueError("prompts must match texts (or be None)")
    requests = []
    for text, prompt in zip(texts, prompts):
        audio_prompt, text_prompt, lang_pr = _load_prompt(prompt)
        text_ids, lang_ids = _prepare_text(
            bundle, text, text_prompt, lang_pr, language, accent
        )
        requests.append((
            text_ids, lang_ids,
            audio_prompt if len(audio_prompt) else None,
        ))
    results = bundle.pipeline.synthesize_batch(
        requests, best_of=best_of or bundle.ecfg.best_of,
        temperature=temperature, top_k=top_k, top_p=top_p,
        seed=seed,
        return_wave=bundle.vocos_params is not None,
    )
    waves = []
    for codes, wave in results:
        waves.append(
            wave if wave is not None else codes_to_wave(bundle, codes)
        )
    return waves


def _slid_prompt_triple(bundle, sent, codes, language):
    """Sliding-window prompt after one sentence (reference:
    generation.py:264-269, the p<0.5 branch): (audio, text, lang) prompt
    built from this sentence's text + its last ≤225 generated frames.
    Both long-text loops pre-draw the p=0.5 coin (same rand stream as
    the reference's per-sentence draw) to know whether the NEXT
    dispatch depends on THIS sentence's codes, and share this
    construction for the slide case."""
    lang = classify(sent) if language == "auto" else language
    lang_token = lang2token[lang]
    s_text = lang_token + sent.replace("\n", "").strip(" ") + lang_token
    phone_tokens, _ = bundle.tokenizer.tokenize(f"_{s_text}".strip())
    # "mix" is a span marker, not a prompt language — the model has no
    # language id for it (same fallback as generate_audio, line ~237)
    return (
        codes[-225:] if len(codes) > 225 else codes,
        np.asarray(phone_tokens, np.int32),
        lang if lang != "mix" else "en",
    )


def _long_text_batch_size(ecfg: EngineConfig) -> int:
    """Sentence-batch size for fixed-prompt long text: the measured
    single-chip optimum (PERFORMANCE.md) is batch 8 with the int8 KV cache
    (61x/chip) and batch 4 otherwise (bf16/int8 caches hit VMEM pressure
    at 8)."""
    return 8 if getattr(ecfg, "quantize", "none") == "int8kv" else 4


def generate_audio_from_long_text(
    text: str,
    prompt: Optional[str] = None,
    language: str = "auto",
    accent: str = "no-accent",
    mode: str = "sliding-window",
    *,
    best_of: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """Long-text synthesis by sentence (reference: generation.py:154-276).

    mode='fixed-prompt': every sentence reuses the original prompt.
    mode='sliding-window': with p=0.5 per sentence, the prompt is replaced
    by the previous sentence's generated codes + text (generation.py:264-269).
    """
    bundle = _require_bundle()
    if prompt is None:
        mode = "sliding-window"
    sentences = split_text_into_sentences(text)
    audio_prompt, text_prompt, lang_pr = _load_prompt(prompt)

    # fixed-prompt sentences are independent given the (fixed) prompt —
    # synthesize them through the single-chip batched path so they share
    # every decode step's weight stream (~1.8x faster at batch 4; exact
    # for greedy, distributionally equivalent for sampling)
    e = bundle.ecfg
    resolved_best_of = best_of or e.best_of
    if (
        mode == "fixed-prompt"
        and len(sentences) > 1
        and resolved_best_of == 1
        and bundle.pipeline.decode_mode == "megakernel"
    ):
        requests = []
        for sent in sentences:
            text_ids, lang_ids = _prepare_text(
                bundle, sent, text_prompt, lang_pr, language, accent
            )
            requests.append((
                text_ids, lang_ids,
                audio_prompt if len(audio_prompt) else None,
            ))
        batched_codes: List[np.ndarray] = []
        BATCH = _long_text_batch_size(e)
        for i in range(0, len(requests), BATCH):
            chunk = requests[i : i + BATCH]
            if len(chunk) == 1:
                codes, _ = bundle.pipeline.synthesize(
                    chunk[0][0], chunk[0][1], chunk[0][2],
                    best_of=1, seed=seed + i, return_wave=False,
                )
                batched_codes.append(codes)
            else:
                for codes, _ in bundle.pipeline.synthesize_batch(
                    chunk, seed=seed + i, return_wave=False
                ):
                    batched_codes.append(codes)
        return codes_to_wave(
            bundle, np.concatenate(batched_codes, axis=0)
        )

    # Sequential loop with dispatch/fetch double-buffering: sentence i+1's
    # dispatch depends on i's CODES only when the sliding coin (pre-drawn,
    # host-side — the draw order matches the unoverlapped loop exactly, so
    # token streams are seed-identical) says "slide"; otherwise i+1 is
    # dispatched BEFORE i's end-of-utterance host sync, hiding the tunnel
    # round trip + frontend work behind device compute.
    rng = np.random.RandomState(seed)
    all_codes: List[np.ndarray] = []
    fixed = (audio_prompt, text_prompt, lang_pr)
    cur = fixed
    pending = None  # previous sentence's PendingSynthesis
    for i, sent in enumerate(sentences):
        logger.info("synthesize sentence %d/%d", i + 1, len(sentences))
        h = _synthesize_async(
            bundle, sent, cur[0], cur[1], cur[2], language, accent,
            best_of=best_of, seed=seed + i, return_wave=False,
        )
        coin = rng.rand() if mode == "sliding-window" else 1.0
        if pending is not None:
            all_codes.append(pending.result()[0])
            pending = None
        if coin < 0.5:
            # next sentence's prompt needs THIS sentence's codes: the
            # data dependency forbids overlap — sync now
            codes = h.result()[0]
            all_codes.append(codes)
            cur = _slid_prompt_triple(bundle, sent, codes, language)
        else:
            if mode == "sliding-window":
                cur = fixed
            pending = h
    if pending is not None:
        all_codes.append(pending.result()[0])
    codes = np.concatenate(all_codes, axis=0)
    return codes_to_wave(bundle, codes)


def stream_audio_from_long_text(
    text: str,
    prompt: Optional[str] = None,
    language: str = "auto",
    accent: str = "no-accent",
    mode: str = "sliding-window",
    *,
    best_of: Optional[int] = None,
    seed: int = 0,
):
    """Long-text synthesis as a generator: yields each sentence's waveform
    the moment it is ready, so time-to-first-audio is ONE sentence instead
    of the whole paragraph (a serving capability beyond the reference,
    whose long-text path returns only the final concatenation —
    generation.py:154-276). Token sequences are identical to
    generate_audio_from_long_text under the same seed/mode; only the
    vocoder runs per sentence instead of once over the concatenated
    codes, so waveforms can differ within the vocoder's small conv
    receptive field at sentence boundaries."""
    bundle = _require_bundle()
    if bundle.vocos_params is None:
        raise RuntimeError(
            "streaming synthesis needs the Vocos vocoder (convert "
            "charactr/vocos-encodec-24khz to checkpoints/vocos-jax.npz)"
        )
    if prompt is None:
        mode = "sliding-window"
    sentences = split_text_into_sentences(text)
    audio_prompt, text_prompt, lang_pr = _load_prompt(prompt)
    e = bundle.ecfg
    resolved_best_of = best_of or e.best_of

    if (
        mode == "fixed-prompt"
        and len(sentences) > 1
        and resolved_best_of == 1
        and bundle.pipeline.decode_mode == "megakernel"
    ):
        # batched fast path (see generate_audio_from_long_text): yield as
        # each batched chunk completes
        requests = []
        for sent in sentences:
            text_ids, lang_ids = _prepare_text(
                bundle, sent, text_prompt, lang_pr, language, accent
            )
            requests.append((
                text_ids, lang_ids,
                audio_prompt if len(audio_prompt) else None,
            ))
        # the FIRST sentence runs alone so the stream's first audio lands
        # after one sentence's decode, not a whole batch's; the remainder
        # batches. (Chunk geometry therefore differs from the
        # non-streaming path: greedy outputs are identical, sampled ones
        # equally distributed but not seed-identical.)
        _, wave = bundle.pipeline.synthesize(
            requests[0][0], requests[0][1], requests[0][2],
            best_of=1, seed=seed, return_wave=True,
        )
        yield wave
        rest = requests[1:]
        BATCH = _long_text_batch_size(e)
        for i in range(0, len(rest), BATCH):
            chunk = rest[i : i + BATCH]
            if len(chunk) == 1:
                _, wave = bundle.pipeline.synthesize(
                    chunk[0][0], chunk[0][1], chunk[0][2],
                    best_of=1, seed=seed + 1 + i, return_wave=True,
                )
                yield wave
            else:
                for _, wave in bundle.pipeline.synthesize_batch(
                    chunk, seed=seed + 1 + i, return_wave=True
                ):
                    yield wave
        return

    # Double-buffered sequential loop (see generate_audio_from_long_text):
    # sentence i+1 is dispatched before sentence i's host sync whenever
    # the pre-drawn sliding coin allows it. The wave comes fused from the
    # pipeline's single program (AR→NAR→Vocos, one sync) instead of a
    # separate codes_to_wave dispatch — token streams stay seed-identical;
    # waveforms can differ from the batch path only within the vocoder's
    # conv receptive field at sentence boundaries (as documented above).
    rng = np.random.RandomState(seed)
    fixed = (audio_prompt, text_prompt, lang_pr)
    cur = fixed
    pending = None
    for i, sent in enumerate(sentences):
        logger.info("stream sentence %d/%d", i + 1, len(sentences))
        h = _synthesize_async(
            bundle, sent, cur[0], cur[1], cur[2], language, accent,
            best_of=best_of, seed=seed + i, return_wave=True,
        )
        coin = rng.rand() if mode == "sliding-window" else 1.0
        if pending is not None:
            yield pending.result()[1]
            pending = None
        if coin < 0.5:
            codes, wave = h.result()
            yield wave
            cur = _slid_prompt_triple(bundle, sent, codes, language)
        else:
            if mode == "sliding-window":
                cur = fixed
            pending = h
    if pending is not None:
        yield pending.result()[1]


# ---------------------------------------------------------------------------
# Prompt making (reference: utils/prompt_making.py)
# ---------------------------------------------------------------------------

def make_prompt(
    name: str,
    audio_prompt_path: str,
    transcript: Optional[str] = None,
    *,
    out_dir: str = "./customs",
) -> str:
    """Enrollment clip → .npz voice prompt (reference: prompt_making.py:57-84).

    Without a transcript, Whisper transcription is attempted via local HF
    weights; if unavailable, a transcript is required (this image has no
    network access for model downloads).
    """
    bundle = _require_bundle()
    if bundle.encodec_params is None:
        raise RuntimeError(
            "EnCodec weights unavailable (convert encodec_24khz to "
            "checkpoints/encodec-jax.npz)"
        )
    from .utils.audio import load_wav

    wav, sr = load_wav(audio_prompt_path, target_sr=SAMPLE_RATE)
    if len(wav) / SAMPLE_RATE > 15:
        raise ValueError("Prompt too long, expect length below 15 seconds")

    if transcript is None:
        from .utils.whisper_transcribe import transcribe

        transcript, lang = transcribe(audio_prompt_path)
        text = f"{lang2token[lang]}{transcript}{lang2token[lang]}"
    else:
        lang = classify(transcript)
        lang_token = lang2token[lang]
        text = lang_token + transcript.replace("\n", "") + lang_token

    import jax.numpy as jnp

    from .codec.encodec import encode

    codes = np.asarray(encode(bundle.encodec_params, jnp.asarray(wav[None])))

    phone_tokens, langs = bundle.tokenizer.tokenize(text=f"_{text}".strip())
    text_ids, _ = bundle.collater([phone_tokens])

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez(
        out,
        audio_tokens=codes.astype(np.int64),
        text_tokens=text_ids.astype(np.int64),
        lang_code=np.int32(lang2code[lang]),
    )
    return out


def continual(
    text: str,
    audio_codes: np.ndarray,  # [T, 8] full EnCodec codes of the utterance
    language: str = "auto",
) -> np.ndarray:
    """Acoustic continuation: keep codebook 0, re-render codebooks 1..7 of
    the suffix conditioned on a prefix of min(T/2, 225) frames
    (reference: models/vallex.py:688-787 — which skips language embeddings).
    Returns codes [T - prefix, 8] for the suffix.
    """
    bundle = _require_bundle()
    text_ids, lang_ids = _prepare_text(
        bundle, text, np.zeros((0,), np.int32), None, language, "no-accent"
    )
    from .engine.ar import _bucket
    from .engine.nar import nar_generate, nar_use_flash

    import jax.numpy as jnp

    T = len(audio_codes)
    prefix_len = min(T // 2, 3 * 75)
    e = bundle.ecfg
    s_text = _bucket(len(text_ids), e.text_buckets)
    t_audio = _bucket(T, e.audio_buckets)

    text_pad = np.zeros((1, s_text), np.int32)
    text_pad[0, : len(text_ids)] = text_ids
    codes_in = np.zeros((1, t_audio, NUM_QUANTIZERS), np.int32)
    codes_in[0, :T] = audio_codes

    out = nar_generate(
        bundle.params, bundle.cfg,
        jnp.asarray(text_pad), jnp.asarray(text_pad * 0),
        jnp.asarray(len(text_ids), jnp.int32),
        jnp.asarray(codes_in),
        jnp.asarray(T, jnp.int32), jnp.asarray(prefix_len, jnp.int32),
        s_text=s_text, t_audio=t_audio,
        compute_dtype=e.compute_dtype,
        add_lang=False,
        use_flash=nar_use_flash(bundle.cfg),
    )
    return np.asarray(out[0, prefix_len:T])
