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
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    # persistent compilation cache: repeat bench runs skip the 3-4 min of
    # program compiles (works with the remote-compile tunnel too — the cache
    # stores client-side executables keyed by HLO)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vallex-jax-cache")
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
                utterance=None, max_duration=None, audio_buckets=(1024,)):
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
        times.sort()
        p50 = times[len(times) // 2]
        return min(times), p50, dur, min(rtfs)

    def measure_stream(quantize="int8", n_sent=8, runs=(1, 2)):
        """Sentence-by-sentence single-stream serving with dispatch/fetch
        double-buffering (api.stream_audio_from_long_text): sentence i+1
        is dispatched before sentence i's end-of-utterance host sync, so
        the ~25-30 ms tunnel round trip that dominates the lone-sentence
        p50 is hidden behind device compute in steady state. This is the
        reference's real long-text workload (generation.py:191-228) as a
        stream; RTF = wall / total audio over the whole stream, INCLUDING
        the unoverlappable first-sentence sync and any sliding-prompt
        data-dependency stalls (p=0.5 per sentence). Deliberately the
        SAME engine config as short_rtf (int8, 512 buckets, greedy):
        every program is then already compiled by the short_rtf warm-up
        — int8kv/512 would be a fresh multi-minute Mosaic compile."""
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
        ] * 2)[:R]
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
    # The HEADLINE config is measured first, then secondary configs are
    # added while a time budget lasts: a cold compile cache costs ~2-4 min
    # of remote Mosaic/XLA compiles PER distinct decode program through
    # the tunnel, and the bench must always emit its JSON line inside the
    # driver's window. Detail keys are present for whatever completed
    # (everything, on a warm cache — see PERFORMANCE.md for the full
    # measured tables).
    t_start = time.time()
    BUDGET_S = float(os.environ.get("VALLEX_BENCH_BUDGET_S", "360"))

    wall, p50, dur, _ = measure("int8", runs=(1, 2, 3, 4, 5))
    rtf = wall / dur
    detail = {
        "audio_seconds": round(dur, 2),
        "wall_seconds": round(wall, 3),
        "xrt": round(dur / wall, 1),
        "p50_ms": round(p50 * 1000.0, 1),
    }

    def within_budget():
        return time.time() - t_start < BUDGET_S

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
        # short utterance (~2 s): sentence-level serving, where fixed
        # per-utterance costs dominate (the reference's real workload,
        # generation.py:191-228 synthesizes sentence by sentence). Random
        # weights never emit EOS, so the 2 s stop is enforced with the
        # max_duration cap; a right-sized 512-frame bucket matches what a
        # short-sentence serving config would use
        _, p50_s, dur_s, s_rtf = measure(
            "int8", utterance="Hi there, good morning.", runs=(1, 2, 3),
            max_duration=2.0, audio_buckets=(512,),
        )
        detail["short_rtf"] = round(s_rtf, 4)
        detail["short_audio_seconds"] = round(dur_s, 2)
        detail["short_p50_ms"] = round(p50_s * 1000.0, 1)
    if within_budget():
        # sentence STREAM: the same short-sentence workload as short_rtf
        # but as consecutive sentences with dispatch/fetch overlap — the
        # per-sentence tunnel round trip hides behind the next sentence's
        # compute (see measure_stream's methodology note)
        detail["stream_rtf"] = round(measure_stream("int8"), 4)
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

    result = {
        "metric": "rtf",
        "value": round(rtf, 4),
        "unit": "wall-sec per audio-sec (full pipeline, 1 chip, int8 weights)",
        "vs_baseline": round(0.05 / rtf, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
