"""Benchmark: end-to-end synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full pipeline (text frontend → AR Pallas decode → 7-stage NAR →
Vocos vocoder → waveform) at the shipped model size (2×150M params, d=1024)
on a ~11 s utterance with a preset voice prompt. Weights are random when the
converted checkpoint is absent (this image has no network egress) — the
compute graph, shapes and step counts are identical to real-weight serving,
so RTF is representative.

vs_baseline is measured against the driver's north-star target
RTF ≤ 0.05 (≥20× real-time, BASELINE.json): vs_baseline = 0.05 / RTF.

Budget robustness: measurements are ordered headline → short_rtf →
stream_rtf → extras (the sentence workload is the reference's real one,
generation.py:191-228, so its keys must land even on a tight budget), every
completed run updates a shared state dict, and a SIGALRM watchdog fires
shortly before the budget expires to emit the JSON line with whatever keys
completed — a budget kill can no longer lose the whole artifact. The
persistent compilation cache lives in-repo (.jax_cache/, committed
pre-warmed) so a fresh driver container skips the multi-minute cold
Mosaic/XLA compiles that exhausted BENCH_r04's budget before any secondary
config ran.
"""

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# shared mutable state: the watchdog emits from here at any moment
STATE = {"value": None, "detail": {}}
_EMITTED = False


def emit(final=False):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    rtf = STATE["value"]
    result = {
        "metric": "rtf",
        "value": round(rtf, 4) if rtf else None,
        "unit": "wall-sec per audio-sec (full pipeline, 1 chip, int8 weights)",
        "vs_baseline": round(0.05 / rtf, 3) if rtf else None,
        "detail": STATE["detail"],
    }
    if not final:
        # the SIGALRM watchdog emitted before the LAST secondary config
        # finished — every key present was fully measured; only the
        # remaining extras were dropped
        result["detail"]["extras_truncated_by_budget"] = True
    print(json.dumps(result), flush=True)


def _watchdog(signum, frame):
    emit(final=False)
    os._exit(0)


def main():
    import jax
    import numpy as np  # noqa: F401

    # persistent compilation cache, shipped IN the repo pre-warmed: repeat
    # bench runs — including the driver's, in a fresh container on the same
    # image — skip the 2-4 min of remote Mosaic/XLA compiles per decode
    # program (works with the remote-compile tunnel too: the cache stores
    # client-side executables keyed by HLO)
    try:
        cache_dir = os.path.join(REPO, ".jax_cache")
        if not os.path.isdir(cache_dir) or not os.access(cache_dir, os.W_OK):
            cache_dir = "/tmp/vallex-jax-cache"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vallex_tpu import api
    from vallex_tpu.config import SAMPLE_RATE, EngineConfig

    text = (
        "The quick brown fox jumps over the lazy dog while the curious "
        "cat watches from a sunny window sill nearby."
    )

    def measure(quantize: str, *, best_of=1, top_k=1, runs=(1, 2, 3),
                utterance=None, max_duration=None, audio_buckets=(1024,),
                on_run=None):
        ecfg = EngineConfig(
            text_buckets=(256,), audio_buckets=audio_buckets,
            quantize=quantize,
        )
        api.preload_models("./checkpoints", random_weights=True, ecfg=ecfg)
        utterance = utterance or text
        # warm-up: compile every program in the pipeline
        api.generate_audio(
            utterance, prompt="paimon", top_k=top_k, best_of=best_of, seed=0,
            max_duration=max_duration,
        )
        # pair each run's wall with ITS duration: sampled runs can hit
        # EOS at different frames, so min(times)/last_dur would mismatch
        times, rtfs, dur = [], [], None
        for seed in runs:
            t0 = time.time()
            wave = api.generate_audio(
                utterance, prompt="paimon", top_k=top_k, best_of=best_of,
                seed=seed, max_duration=max_duration,
            )
            dt = time.time() - t0
            times.append(dt)
            dur = len(wave) / SAMPLE_RATE
            rtfs.append(dt / dur)
            if on_run is not None:
                # publish incrementally: a budget kill between runs still
                # leaves the best-so-far in the emitted artifact
                on_run(min(times), sorted(times)[len(times) // 2], dur,
                       min(rtfs))
        times.sort()
        p50 = times[len(times) // 2]
        return min(times), p50, dur, min(rtfs)

    def measure_stream(quantize="int8kv", n_sent=8, runs=(1, 2)):
        """Sentence-by-sentence single-stream serving with dispatch/fetch
        double-buffering (api.stream_audio_from_long_text): sentence i+1
        is dispatched before sentence i's end-of-utterance host sync, so
        the ~25-30 ms tunnel round trip that dominates the lone-sentence
        p50 is hidden behind device compute in steady state. This is the
        reference's real long-text workload (generation.py:191-228) as a
        stream; RTF = wall / total audio over the whole stream, INCLUDING
        the unoverlappable first-sentence sync and any sliding-prompt
        data-dependency stalls (p=0.5 per sentence). Deliberately the
        SAME engine config as short_rtf (int8kv, 512 buckets, greedy —
        the measured-best sentence-workload config): every program is
        then already compiled by the short_rtf warm-up."""
        ecfg = EngineConfig(
            text_buckets=(256,), audio_buckets=(512,), quantize=quantize,
            top_k=1,
        )
        api.preload_models("./checkpoints", random_weights=True, ecfg=ecfg)
        text = "Hi there, good morning to you. " * n_sent
        for _ in api.stream_audio_from_long_text(
            text, prompt="paimon", mode="sliding-window", seed=0
        ):
            pass  # warm-up: compile + prompt-bucket programs
        best = None
        for seed in runs:
            t0 = time.time()
            total = 0
            for w in api.stream_audio_from_long_text(
                text, prompt="paimon", mode="sliding-window", seed=seed
            ):
                total += len(w)
            rtf = (time.time() - t0) / (total / SAMPLE_RATE)
            best = rtf if best is None else min(best, rtf)
            STATE["detail"]["stream_rtf"] = round(best, 4)
        return best

    def measure_batch(R, quantize="int8", runs=(1, 2, 3)):
        """Multi-request batched serving (api.generate_audio_batch): R
        independent texts share every decode step's weight stream on one
        chip. Returns aggregate RTF = wall / total audio seconds."""
        ecfg = EngineConfig(
            text_buckets=(256,), audio_buckets=(1024,), quantize=quantize
        )
        api.preload_models("./checkpoints", random_weights=True, ecfg=ecfg)
        texts = ([
            text,
            "A gentle rain fell over the quiet harbor as fishing boats "
            "rocked slowly against the wooden pier in the early light.",
            "Bright autumn leaves drifted across the empty playground "
            "while children laughed beyond the old stone wall nearby.",
            "The midnight train rolled through the sleeping valley "
            "carrying letters and parcels to towns along the coast.",
        ] * 6)[:R]
        prompts = ["paimon"] * R
        api.generate_audio_batch(texts, prompts, top_k=1, seed=0)
        best = None
        for seed in runs:
            t0 = time.time()
            waves = api.generate_audio_batch(
                texts, prompts, top_k=1, seed=seed
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        total = sum(len(w) for w in waves) / SAMPLE_RATE
        return best / total

    # int8 (W8A16) is the serving configuration — per-output-channel weight
    # quantization halves the decode loop's HBM weight traffic; bf16 is the
    # strict mode (greedy and unfiltered sampling both run as speculative
    # decode: int8 draft + one bf16 verify pass — token-exact for greedy,
    # distribution-exact for sampling).
    #
    # Order: HEADLINE first (it is the artifact's value field), then the
    # sentence-workload keys short_rtf and stream_rtf (the reference's real
    # serving shape — these must land even on a tight budget), then the
    # remaining configs while the budget lasts. See PERFORMANCE.md for the
    # full measured tables from warm-cache sessions.
    t_start = time.time()
    BUDGET_S = float(os.environ.get("VALLEX_BENCH_BUDGET_S", "360"))
    signal.signal(signal.SIGALRM, _watchdog)
    signal.signal(signal.SIGTERM, _watchdog)
    signal.alarm(max(30, int(BUDGET_S) - 15))

    detail = STATE["detail"]

    def on_headline(wall, p50, dur, rtf):
        STATE["value"] = wall / dur
        detail.update(
            audio_seconds=round(dur, 2),
            wall_seconds=round(wall, 3),
            xrt=round(dur / wall, 1),
            p50_ms=round(p50 * 1000.0, 1),
        )

    wall, p50, dur, _ = measure("int8", runs=(1, 2, 3), on_run=on_headline)
    rtf = wall / dur
    STATE["value"] = rtf

    def within_budget():
        return time.time() - t_start < BUDGET_S

    def on_short(_wall, p50_s, dur_s, s_rtf):
        detail["short_rtf"] = round(s_rtf, 4)
        detail["short_audio_seconds"] = round(dur_s, 2)
        detail["short_p50_ms"] = round(p50_s * 1000.0, 1)

    # short utterance (~2 s): sentence-level serving, where fixed
    # per-utterance costs dominate (the reference's real workload,
    # generation.py:191-228 synthesizes sentence by sentence). Random
    # weights never emit EOS, so the 2 s stop is enforced with the
    # max_duration cap; a right-sized 512-frame bucket with the int8 KV
    # cache (measured best for the sentence workload: short 0.052 vs
    # 0.054, stream 0.035 vs 0.037-0.042 under plain int8) matches what
    # a short-sentence serving config would use. Runs unconditionally
    # right after the headline: the watchdog bounds the worst case.
    measure(
        "int8kv", utterance="Hi there, good morning.", runs=(1, 2, 3),
        max_duration=2.0, audio_buckets=(512,), on_run=on_short,
    )
    # sentence STREAM: the same short-sentence workload as short_rtf
    # but as consecutive sentences with dispatch/fetch overlap — the
    # per-sentence tunnel round trip hides behind the next sentence's
    # compute (see measure_stream's methodology note). Also
    # unconditional: short_rtf's warm-up compiled all of its programs.
    measure_stream("int8kv")

    if within_budget():
        _, _, _, bf16_rtf = measure("none")
        detail["bf16_rtf"] = round(bf16_rtf, 4)
        detail["bf16_xrt"] = round(1.0 / bf16_rtf, 1)
    if within_budget():
        # reference-UI signature mode: best_of=5 beams (launch-ui.py:295),
        # served with the int8 KV cache (the measured-best beam config)
        _, _, _, b5_rtf = measure("int8kv", best_of=5, runs=(1, 2))
        detail["best_of5_rtf"] = round(b5_rtf, 4)
    if within_budget():
        # batched serving: 8 streams on one chip, int8 KV cache
        batch8kv_rtf = measure_batch(8, quantize="int8kv", runs=(1, 2))
        detail["batch8_int8kv_agg_rtf"] = round(batch8kv_rtf, 4)
        detail["batch8_int8kv_xrt"] = round(1.0 / batch8kv_rtf, 1)
    if within_budget():
        # sampled serving (reference default top_k=-100 => unfiltered)
        _, _, _, sm_rtf = measure("int8", top_k=-100, runs=(3, 3))
        detail["sampled_rtf"] = round(sm_rtf, 4)
    if within_budget():
        # int8 + int8 KV cache, single request: the best measured
        # single-stream config (halves per-step cache DMA on top of int8)
        _, _, _, kv_rtf = measure("int8kv", runs=(1, 2))
        detail["int8kv_rtf"] = round(kv_rtf, 4)
    if within_budget():
        # bf16 strict SAMPLED mode via speculative sampling; seed 3 runs
        # to the length cap under random weights (a stable ~11 s
        # utterance — early-EOS seeds would let fixed costs dominate)
        _, _, _, bfsm_rtf = measure("none", top_k=-100, runs=(3, 3))
        detail["bf16_sampled_rtf"] = round(bfsm_rtf, 4)
    if within_budget():
        # the batched-serving knee (PERFORMANCE.md: medians of 3 sessions
        # are 0.0154 / 0.0161 / 0.0173 at 8/16/24)
        b16 = measure_batch(16, quantize="int8kv", runs=(1, 2))
        detail["batch16_int8kv_agg_rtf"] = round(b16, 4)
    if within_budget():
        b24 = measure_batch(24, quantize="int8kv", runs=(1, 2))
        detail["batch24_int8kv_agg_rtf"] = round(b24, 4)

    signal.alarm(0)
    emit(final=True)


if __name__ == "__main__":
    main()
