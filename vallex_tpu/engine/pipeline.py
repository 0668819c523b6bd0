"""Device-resident synthesis pipeline: AR → NAR → Vocos without host syncs.

Through the remote-execution tunnel every host round-trip costs ~30 ms; the
naive flow (AR result to numpy → build NAR inputs → NAR result to numpy →
Vocos) pays three of them per utterance. Here every phase handoff stays on
device — the NAR input assembly and the prompt-region shift before the
vocoder are jitted — and the host syncs exactly once, at the end, to trim
the waveform to the generated length.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..ops.decode_step import ABLK
from .ar import (
    ARResult,
    PackedWeightsCache,
    _bucket,
    ar_generate,
    ar_generate_batch,
    pad_batched_requests,
    validate_prompt_len,
)
from .nar import nar_generate, nar_use_flash

Params = Dict[str, Any]


def _seed32(seed) -> jnp.ndarray:
    """Fold an arbitrary Python/numpy integer seed into the int32 range
    expected by the in-program PRNGKey construction. Seeds < 2**31 map to
    themselves (identical stream to passing jax.random.PRNGKey(seed));
    larger values (time_ns()-style seeds) fold deterministically instead
    of overflowing int32."""
    return jnp.asarray(int(seed) & 0x7FFFFFFF, jnp.int32)


@functools.lru_cache(maxsize=4096)
def _dev_scalar(val, dtype: str) -> jnp.ndarray:
    """Device-cached scalar put. Each eager jnp.asarray(x, dtype) costs
    ~0.3-0.5 ms of submission through the execution tunnel; sampling knobs
    and bucket lengths repeat across calls, so the device buffers are
    cached (immutable, a few bytes each)."""
    return jnp.asarray(val, dtype)


@functools.partial(jax.jit, static_argnames=("t_audio", "eos"))
def _assemble_nar_input(
    ar_tokens: jnp.ndarray,  # [B, t_audio] best-beam buffer (BOS+prompt+gen)
    best: jnp.ndarray,  # []
    prompt_codes_pad: jnp.ndarray,  # [1, t_audio, 8] prompt rows filled
    *,
    t_audio: int,
    eos: int,
):
    """→ codes_in [1, t_audio, 8]: cb0 from the AR buffer (BOS stripped),
    cb1..7 from the prompt rows."""
    # the AR buffer may carry K slack rows past t_audio (block/speculative
    # decode write windows) — only the first t_audio positions matter here
    y = ar_tokens[best][:t_audio]
    cb0 = jnp.concatenate([y[1:], jnp.full((1,), eos, y.dtype)])
    return prompt_codes_pad.at[..., 0].set(cb0[None])


@functools.partial(jax.jit, static_argnames=())
def _shift_out_prompt(
    codes: jnp.ndarray, prompt_len: jnp.ndarray, gen_len: jnp.ndarray
):
    """Roll the prompt region out so row 0 is the first generated frame, and
    zero the rows beyond gen_len — rolled padding would otherwise feed
    arbitrary codebook sums into the vocoder (with random test weights the
    exp(log-mag) head overflows and the NaNs bleed back through the ISTFT
    overlap-add into the valid tail)."""
    shifted = jnp.roll(codes, -prompt_len, axis=1)
    rows = jnp.arange(shifted.shape[1])[None, :, None]
    return jnp.where(rows < gen_len, shifted, 0)


@functools.partial(jax.jit, static_argnames=("t_audio",))
def _assemble_nar_input_batch(
    y_gen: jnp.ndarray,  # [R, t_gen + K] generated cb0, aligned at col 0
    prompt_codes_pad: jnp.ndarray,  # [R, t_audio, 8] prompt rows filled
    prompt_lens: jnp.ndarray,  # [R]
    *,
    t_audio: int,
):
    """Per-request NAR input: audio position j carries the prompt's codes
    for j < plen_r and the request's generated cb0 at j - plen_r after."""
    R = y_gen.shape[0]
    rows = jnp.arange(t_audio)[None, :]  # [1, TA]
    gen_idx = jnp.clip(
        rows - prompt_lens[:, None], 0, y_gen.shape[1] - 1
    )
    cb0_gen = jnp.take_along_axis(y_gen, gen_idx, axis=1)  # [R, TA]
    in_prompt = rows < prompt_lens[:, None]
    cb0 = jnp.where(
        in_prompt, prompt_codes_pad[..., 0], cb0_gen
    ).astype(jnp.int32)
    return prompt_codes_pad.at[..., 0].set(cb0)


@jax.jit
def _shift_out_prompt_batch(
    codes: jnp.ndarray,  # [R, TA, 8]
    prompt_lens: jnp.ndarray,  # [R]
    gen_lens: jnp.ndarray,  # [R]
):
    """Per-request prompt shift-out: row i ← row i + plen_r, rows beyond
    each request's gen_len zeroed (see _shift_out_prompt)."""
    TA = codes.shape[1]
    rows = jnp.arange(TA)[None, :]
    src = jnp.clip(rows + prompt_lens[:, None], 0, TA - 1)
    shifted = jnp.take_along_axis(codes, src[..., None], axis=1)
    return jnp.where(rows[..., None] < gen_lens[:, None, None], shifted, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "s_text", "t_audio", "compute_dtype", "use_flash",
        "with_wave",
    ),
)
def _nar_tail(
    params: Params,
    vocos_params: Optional[Params],
    cfg: ModelConfig,
    ar_tokens: jnp.ndarray,  # [B, t_audio(+slack)] AR y-buffer
    best: jnp.ndarray,  # [] best-beam index
    gen_len: jnp.ndarray,  # [] generated frames
    prompt_codes_pad: jnp.ndarray,  # [1, t_audio, 8]
    text_pad: jnp.ndarray,  # [1, s_text]
    lang_pad: jnp.ndarray,  # [1, s_text]
    x_len: jnp.ndarray,  # []
    prompt_len: jnp.ndarray,  # []
    *,
    s_text: int,
    t_audio: int,
    compute_dtype: str,
    use_flash: bool,
    with_wave: bool,
):
    """Everything after the AR stage — NAR input assembly, the 7 NAR
    stages, the prompt shift-out and (optionally) the Vocos vocoder — as
    ONE jitted program. One dispatch instead of ~6: every eager op or
    separate jit call costs ~0.3-1 ms of host-side submission through the
    execution tunnel, a per-utterance fixed cost that dominates
    short-sentence serving (the reference's real workload,
    generation.py:191-228)."""
    codes_in = _assemble_nar_input(
        ar_tokens, best, prompt_codes_pad, t_audio=t_audio, eos=cfg.eos_id
    )
    gl = gen_len.astype(jnp.int32)
    codes = nar_generate(
        params, cfg, text_pad, lang_pad, x_len,
        codes_in, prompt_len + gl, prompt_len,
        s_text=s_text, t_audio=t_audio,
        compute_dtype=compute_dtype, use_flash=use_flash,
    )
    gen_codes = _shift_out_prompt(codes, prompt_len, gl)
    if not with_wave:
        return gen_codes, None
    from ..codec.vocos import vocos_decode

    # t_len=gl: rows past gen_len hold code 0, which is a REAL codebook
    # vector — without the valid-length mask its phantom features bleed
    # ~27 frames back into the tail of the real audio (see vocos_decode)
    return gen_codes, vocos_decode(
        vocos_params, gen_codes, bandwidth_id=2, t_len=gl
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "s_text", "t_audio", "compute_dtype", "use_flash",
        "with_wave",
    ),
)
def _nar_tail_batch(
    params: Params,
    vocos_params: Optional[Params],
    cfg: ModelConfig,
    y_gen: jnp.ndarray,  # [R, t_gen + K] generated cb0
    gen_len: jnp.ndarray,  # [R]
    prompt_codes_pad: jnp.ndarray,  # [R, t_audio, 8]
    prompt_lens: jnp.ndarray,  # [R]
    text_pad: jnp.ndarray,  # [R, s_text]
    lang_pad: jnp.ndarray,  # [R, s_text]
    x_lens: jnp.ndarray,  # [R]
    *,
    s_text: int,
    t_audio: int,
    compute_dtype: str,
    use_flash: bool,
    with_wave: bool,
):
    """Batched post-AR tail as one program (see _nar_tail)."""
    codes_in = _assemble_nar_input_batch(
        y_gen, prompt_codes_pad, prompt_lens, t_audio=t_audio
    )
    gl = gen_len.astype(jnp.int32)
    codes = nar_generate(
        params, cfg, text_pad, lang_pad, x_lens,
        codes_in, prompt_lens + gl, prompt_lens,
        s_text=s_text, t_audio=t_audio,
        compute_dtype=compute_dtype, use_flash=use_flash,
    )
    gen_codes = _shift_out_prompt_batch(codes, prompt_lens, gl)
    if not with_wave:
        return gen_codes, None
    from ..codec.vocos import vocos_decode

    # per-request valid lengths (see _nar_tail: zero codes are not silence)
    return gen_codes, vocos_decode(
        vocos_params, gen_codes, bandwidth_id=2, t_len=gl
    )


class PendingSynthesis:
    """Handle to a dispatched (but not yet fetched) synthesis.

    JAX dispatch is asynchronous: by the time synthesize_async returns,
    the device is already working and the ONLY remaining cost is the
    end-of-utterance host sync (~20-30 ms through the execution tunnel).
    Dispatching the NEXT utterance before calling result() overlaps that
    mandatory round trip (plus the next utterance's host-side frontend
    work) with this utterance's compute — the double-buffering that takes
    the sentence-by-sentence serving path (the reference's real workload,
    generation.py:191-228) below the single-stream RTF floor."""

    __slots__ = ("_gl", "_codes", "_wave", "_timer")

    def __init__(self, gen_len, gen_codes, wave_dev, timer):
        self._gl = gen_len
        self._codes = gen_codes
        self._wave = wave_dev
        self._timer = timer

    def result(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """→ (codes [T_gen, 8], wave or None). ONE batched device_get —
        each extra transfer through the execution tunnel costs a full
        round trip — with host-side trimming to the generated length."""
        with self._timer.phase("sync"):
            if self._wave is not None:
                gl, codes_all, wave_all = jax.device_get(
                    (self._gl, self._codes, self._wave)
                )
            else:
                gl, codes_all = jax.device_get((self._gl, self._codes))
        gen_len = int(gl)
        codes_np = codes_all[0, :gen_len]
        if self._wave is not None:
            from ..codec.vocos import HOP

            return codes_np, wave_all[0, : gen_len * HOP]
        return codes_np, None


class SynthesisPipeline:
    """AR + NAR (+ optional Vocos) with device-resident phase handoff."""

    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        ecfg: EngineConfig,
        vocos_params: Optional[Params] = None,
        packed_cache: Optional[PackedWeightsCache] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        self.vocos_params = vocos_params
        from ..utils.profiling import PhaseTimer

        self.timer = PhaseTimer()
        mode = getattr(ecfg, "decode_mode", "auto")
        if mode == "auto":
            mode = (
                "megakernel" if jax.default_backend() not in ("cpu",) else "xla"
            )
        self.decode_mode = mode
        # SHARE the packed-weight cache with any sibling engine over the
        # same params (api.preload_models passes one cache to both the
        # pipeline and the AREngine): two private caches would pin two
        # identical ~300 MB packed/quantized weight sets on device
        self.packed_cache = packed_cache or PackedWeightsCache(params)
        self._prompt_cache: Dict[Tuple, Tuple] = {}

    def _prompt_dev(self, prompt: np.ndarray, p_audio: int, t_audio: int):
        """Device-resident prompt buffers, cached by content + bucket.
        Preset voices repeat across a session; rebuilding + re-uploading
        the [1, p_audio-1] cb0 pad and the [1, t_audio, 8] code pad per
        utterance costs two eager puts (~0.3-0.5 ms each) plus the host
        copies — a per-call fixed cost in the short-sentence path. The
        EOS padding of unwritten slots matters (they must not count as
        generated frames — see AREngine.generate)."""
        cfg = self.cfg
        key = (prompt.tobytes(), p_audio, t_audio)
        hit = self._prompt_cache.get(key)
        if hit is None:
            Tp = len(prompt)
            prompt_pad = np.full((1, p_audio - 1), cfg.eos_id, np.int32)
            prompt_pad[0, :Tp] = prompt[:, 0]
            codes_pad = np.zeros(
                (1, t_audio, cfg.num_quantizers), np.int32
            )
            codes_pad[0, :Tp] = prompt
            if len(self._prompt_cache) >= 64:
                self._prompt_cache.clear()
            hit = (jnp.asarray(prompt_pad), jnp.asarray(codes_pad))
            self._prompt_cache[key] = hit
        return hit

    def _packed_args(self, *, plain_sampling, greedy, best_of, quantize,
                     decode_steps, speculative):
        """Device-cached packed megakernel weights (see
        AREngine._packed_args for the gating rationale)."""
        if self.decode_mode != "megakernel":
            return None, None
        need_draft = bool(
            speculative and (plain_sampling or greedy) and decode_steps > 1
            and best_of == 1 and quantize == "none"
        )
        return self.packed_cache.get(
            self.ecfg.compute_dtype, quantize, need_draft
        )

    def synthesize(
        self,
        text_ids: np.ndarray,  # [S]
        lang_ids: np.ndarray,  # [S]
        prompt_codes: Optional[np.ndarray] = None,  # [Tp, 8]
        *,
        best_of: Optional[int] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        seed: int = 0,
        return_wave: bool = True,
        max_gen_frames: Optional[int] = None,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """→ (codes [T_gen, 8], wave or None). max_gen_frames caps the
        generated length (75 frames/s) and right-sizes the audio bucket."""
        return self.synthesize_async(
            text_ids, lang_ids, prompt_codes,
            best_of=best_of, top_k=top_k, top_p=top_p,
            temperature=temperature, seed=seed, return_wave=return_wave,
            max_gen_frames=max_gen_frames,
        ).result()

    def synthesize_async(
        self,
        text_ids: np.ndarray,  # [S]
        lang_ids: np.ndarray,  # [S]
        prompt_codes: Optional[np.ndarray] = None,  # [Tp, 8]
        *,
        best_of: Optional[int] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        seed: int = 0,
        return_wave: bool = True,
        max_gen_frames: Optional[int] = None,
    ) -> PendingSynthesis:
        """Dispatch the full AR → NAR → Vocos program and return WITHOUT
        the end-of-utterance host sync (see PendingSynthesis): callers
        that know their next utterance can dispatch it before fetching
        this one, hiding the tunnel round trip behind device compute."""
        e = self.ecfg
        cfg = self.cfg
        best_of = best_of or e.best_of
        top_k = e.top_k if top_k is None else top_k
        top_p = e.top_p if top_p is None else top_p
        temperature = e.temperature if temperature is None else temperature

        S = len(text_ids)
        s_text = _bucket(S, e.text_buckets)
        prompt = (
            np.zeros((0, cfg.num_quantizers), np.int32)
            if prompt_codes is None
            else np.asarray(prompt_codes, np.int32)
        )
        Tp = len(prompt)
        validate_prompt_len(Tp, e.audio_buckets)
        p_audio = _bucket(Tp + 1, e.audio_buckets)
        want = 16 * S if max_gen_frames is None else min(16 * S, max_gen_frames)
        t_audio = _bucket(
            min(Tp + 1 + want + 1, e.audio_buckets[-1]), e.audio_buckets,
            granularity=512,
        )
        p_audio = min(p_audio, t_audio)

        text_pad = np.zeros((1, s_text), np.int32)
        text_pad[0, :S] = text_ids
        lang_pad = np.zeros((1, s_text), np.int32)
        lang_pad[0, :S] = lang_ids
        prompt_pad_dev, prompt_codes_dev = self._prompt_dev(
            prompt, p_audio, t_audio
        )

        # --- AR (device) ---------------------------------------------------
        timer = self.timer
        plain = bool((top_k <= 0 or top_k == 1) and top_p >= 1.0)
        quantize = getattr(e, "quantize", "none")
        decode_steps = getattr(e, "decode_steps", 1)
        speculative = getattr(e, "speculative", "auto") in (
            "auto", "on", True,
        )
        packed, packed_draft = self._packed_args(
            plain_sampling=plain, greedy=bool(top_k == 1), best_of=best_of,
            quantize=quantize, decode_steps=decode_steps,
            speculative=speculative,
        )
        # put shared inputs ONCE (text/lang/lengths feed both AR and the
        # NAR tail — re-putting them costs ~0.3-0.5 ms each); sampling
        # knobs go through the _dev_scalar cache
        text_dev = jnp.asarray(text_pad)
        lang_dev = jnp.asarray(lang_pad)
        xlen_dev = _dev_scalar(S, "int32")
        plen_dev = _dev_scalar(Tp, "int32")
        with timer.phase("ar"):
            res: ARResult = ar_generate(
                self.params, cfg,
                text_dev, lang_dev, xlen_dev,
                prompt_pad_dev, plen_dev,
                _seed32(seed),
                _dev_scalar(int(top_k), "int32"),
                _dev_scalar(float(top_p), "float32"),
                _dev_scalar(float(temperature), "float32"),
                gen_limit=(
                    None if max_gen_frames is None
                    else _dev_scalar(int(max_gen_frames), "int32")
                ),
                s_text=s_text, p_audio=p_audio, t_audio=t_audio,
                beams=best_of, compute_dtype=e.compute_dtype,
                length_penalty=e.length_penalty,
                decode_mode=self.decode_mode,
                plain_sampling=plain,
                greedy=bool(top_k == 1),
                quantize=quantize,
                decode_steps=decode_steps,
                speculative=speculative,
                packed=packed, packed_draft=packed_draft,
            )

        # --- NAR + shift + Vocos: one fused program (device handoff) --------
        with_wave = return_wave and self.vocos_params is not None
        with timer.phase("tail"):
            gen_codes, wave_dev = _nar_tail(
                self.params,
                self.vocos_params if with_wave else None,
                cfg, res.tokens, res.best_beam, res.gen_len,
                prompt_codes_dev, text_dev, lang_dev,
                xlen_dev, plen_dev,
                s_text=s_text, t_audio=t_audio,
                compute_dtype=e.compute_dtype,
                use_flash=nar_use_flash(cfg),
                with_wave=with_wave,
            )

        # the host sync (the wall time of the whole utterance) lives in
        # PendingSynthesis.result(), so callers can overlap it
        return PendingSynthesis(
            res.gen_len, gen_codes, wave_dev if with_wave else None, timer
        )

    def synthesize_batch(
        self,
        requests,  # list of (text_ids [S], lang_ids [S], prompt [Tp,8]|None)
        *,
        best_of: int = 1,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        seed: int = 0,
        return_wave: bool = True,
    ):
        """Batched multi-request synthesis on one chip: the AR decode packs
        all requests along the lane axis (engine/ar.py::ar_generate_batch)
        so the per-step weight stream is paid ONCE for the batch; NAR and
        Vocos run batched; one host sync at the end. Filtered sampling
        (top_k > 1 / 0 < top_p < 1) runs the in-kernel bisection filter.
        best_of > 1 packs R x best_of samples on the lane axis and keeps
        only each request's best for the NAR/Vocos tail (the reference
        UI's signature mode, launch-ui.py:295, batched across requests).
        → list of (codes [T_r, 8], wave_r or None)."""
        e = self.ecfg
        cfg = self.cfg
        top_k = e.top_k if top_k is None else top_k
        top_p = e.top_p if top_p is None else top_p
        temperature = e.temperature if temperature is None else temperature
        plain = bool((top_k <= 0 or top_k == 1) and top_p >= 1.0)
        if self.decode_mode != "megakernel":
            raise RuntimeError(
                "batched synthesis runs the Pallas block kernel "
                "(decode_mode='megakernel'); on CPU tests use interpret "
                "mode (see tests/test_batch_decode.py)"
            )
        R = len(requests)
        if R == 1:
            # the batched kernel packs requests in lanes and needs R >= 2;
            # a lone request is exactly the single-request pipeline
            t, lg, p = requests[0]
            codes, wave = self.synthesize(
                t, lg, p, best_of=best_of, top_k=top_k, top_p=top_p,
                temperature=temperature, seed=seed,
                return_wave=return_wave,
            )
            return [(codes, wave)]
        pb = pad_batched_requests(
            requests, cfg.eos_id, cfg.num_quantizers,
            e.text_buckets, e.audio_buckets,
        )
        s_text, p_audio, t_gen = pb["s_text"], pb["p_audio"], pb["t_gen"]
        prompts = pb["prompts"]
        Tp_max = max(len(p) for p in prompts)
        t_audio = _bucket(
            min(Tp_max + 1 + 16 * int(max(pb["x_lens"])) + 1,
                e.audio_buckets[-1]),
            e.audio_buckets, granularity=512,
        )
        text_pad, lang_pad = pb["text"], pb["lang"]
        x_lens, prompt_lens = pb["x_lens"], pb["prompt_lens"]
        prompt_pad, caps = pb["prompt_pad"], pb["caps"]
        prompt_codes_pad = np.zeros(
            (R, t_audio, cfg.num_quantizers), np.int32
        )
        for r, pr in enumerate(prompts):
            if len(pr):
                prompt_codes_pad[r, : len(pr)] = pr

        timer = self.timer
        text_dev = jnp.asarray(text_pad)
        lang_dev = jnp.asarray(lang_pad)
        x_lens_dev = jnp.asarray(x_lens)
        plens_dev = jnp.asarray(prompt_lens)
        quantize = getattr(e, "quantize", "none")
        packed, _ = self.packed_cache.get(e.compute_dtype, quantize, False)
        with timer.phase("ar"):
            y_gen, gen_len, _ = ar_generate_batch(
                self.params, cfg,
                text_dev, lang_dev, x_lens_dev,
                jnp.asarray(prompt_pad), plens_dev,
                jnp.asarray(caps),
                _seed32(seed),
                _dev_scalar(int(top_k), "int32"),
                _dev_scalar(float(temperature), "float32"),
                _dev_scalar(float(top_p), "float32"),
                s_text=s_text, p_audio=p_audio, t_gen=t_gen,
                compute_dtype=e.compute_dtype,
                greedy=bool(top_k == 1),
                quantize=quantize,
                decode_steps=max(2, getattr(e, "decode_steps", 8)),
                plain_sampling=plain,
                packed=packed,
                beams=int(best_of),
                length_penalty=e.length_penalty,
            )

        # --- NAR + shift + Vocos: one fused program --------------------------
        with_wave = return_wave and self.vocos_params is not None
        with timer.phase("tail"):
            gen_codes, wave_dev = _nar_tail_batch(
                self.params,
                self.vocos_params if with_wave else None,
                cfg, y_gen, gen_len,
                jnp.asarray(prompt_codes_pad), plens_dev,
                text_dev, lang_dev, x_lens_dev,
                s_text=s_text, t_audio=t_audio,
                compute_dtype=e.compute_dtype,
                use_flash=nar_use_flash(cfg),
                with_wave=with_wave,
            )

        # ONE batched device_get (see synthesize: every extra tunnel
        # transfer is a full round trip)
        with timer.phase("sync"):
            if with_wave:
                lens, codes_np, waves = jax.device_get(
                    (gen_len, gen_codes, wave_dev)
                )
            else:
                lens, codes_np = jax.device_get((gen_len, gen_codes))
        lens = lens.astype(np.int64)
        out = []
        if with_wave:
            from ..codec.vocos import HOP

            for r in range(R):
                out.append(
                    (codes_np[r, : lens[r]], waves[r, : lens[r] * HOP])
                )
        else:
            for r in range(R):
                out.append((codes_np[r, : lens[r]], None))
        return out
