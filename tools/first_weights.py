"""Day-one trained-weights playbook: convert → verify → golden → quant A/B.

The one command to run the day `vallex-checkpoint.pt` (and optionally the
vocos/encodec/whisper weights) lands in `./checkpoints`:

    python tools/first_weights.py                 # real checkpoint
    python tools/first_weights.py --dry-run       # reconstructed torch VALLE
    python tools/first_weights.py --dry-run --small   # CPU-sized (tests)

Steps (each PASS/FAIL/SKIP in the report, FIRST_WEIGHTS_REPORT.md):

1. CONVERT   torch checkpoint {"model": state_dict}
             (reference load contract: utils/generation.py:79-83)
             → native vallex-jax.npz via utils/checkpoint; plus
             vocos/encodec state dicts if *.pt files are present.
2. PARITY    against the actual reference torch model
             (/root/reference/models/vallex.py) loaded with the SAME
             weights: per-layer AR prefill activations, NAR stage
             activations, and end-to-end greedy token parity through
             VALLE.inference — the determinism property the reference
             itself pins (data/tokenizer.py:114-127 is the same idea for
             EnCodec).
3. GOLDENS   synthesize golden utterances per language with a preset
             prompt (greedy, bf16 strict mode) → <ckpt>/goldens/*.wav +
             codes .npy, the fixtures future changes regress against.
4. QUANT A/B int8 / int8kv / w8a8 vs bf16: teacher-forced logits
             (generation-level first-divergence frame over seeds) with
             explicit accept thresholds. Emits a serving-default
             recommendation; it does NOT silently change
             EngineConfig.quantize — flip it in your serving config once
             the report says ACCEPT.

Dry-run mode exercises every step today (no network egress in this image):
it instantiates the reference's own torch VALLE with random init, saves it
in the reference checkpoint format, and runs the identical pipeline — so
the day real weights land this is a ~10 minute task, not a debugging
session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_DIR = os.environ.get("VALLEX_REFERENCE_DIR", "/root/reference")

GOLDEN_TEXTS = [
    ("en", "The quick brown fox jumps over the lazy dog."),
    ("zh", "你好，欢迎使用语音合成系统。"),
    ("ja", "こんにちは、音声合成へようこそ。"),
]

# Quantized-serving acceptance thresholds (trained weights): the quantized
# mode must track the bf16 strict mode for at least ACCEPT_PREFIX_FRAMES
# greedy frames (median over seeds) AND diverge on no more than
# ACCEPT_DIVERGENCE_PCT of positions over the full utterance.
ACCEPT_PREFIX_FRAMES = 300  # 4 s of audio
ACCEPT_DIVERGENCE_PCT = 5.0


class Report:
    def __init__(self):
        self.rows = []

    def add(self, step: str, status: str, detail: str = ""):
        self.rows.append((step, status, detail))
        print(f"[{status:4s}] {step}: {detail}", flush=True)

    def write(self, path: str, extra: str = ""):
        lines = ["# First-weights report", ""]
        lines.append(f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')}")
        lines.append("")
        lines.append("| step | status | detail |")
        lines.append("|---|---|---|")
        for step, status, detail in self.rows:
            lines.append(f"| {step} | {status} | {detail} |")
        if extra:
            lines.append("")
            lines.append(extra)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"report → {path}", flush=True)

    @property
    def failed(self) -> bool:
        return any(s == "FAIL" for _, s, _ in self.rows)


def _model_kwargs(cfg):
    return dict(
        norm_first=True, add_prenet=False, prefix_mode=1,
        share_embedding=True, nar_scale_factor=1.0, prepend_bos=True,
        num_quantizers=cfg.num_quantizers,
    )


def build_reference_model(cfg, seed: int = 7):
    """Instantiate the reference's own torch VALLE (models/vallex.py)."""
    import torch

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from models.vallex import VALLE  # the reference implementation

    torch.manual_seed(seed)
    m = VALLE(
        cfg.d_model, cfg.num_heads, cfg.num_layers, **_model_kwargs(cfg)
    )
    m.eval()
    return m


def step_convert(ckpt_dir: str, cfg, report: Report):
    """Torch checkpoint → native npz params (+ vocos/encodec if present)."""
    import numpy as np

    from vallex_tpu.utils import checkpoint as CK

    pt = os.path.join(ckpt_dir, "vallex-checkpoint.pt")
    if not os.path.exists(pt):
        report.add("convert", "FAIL", f"{pt} not found")
        return None
    params = CK.load_torch_checkpoint(pt, cfg)
    native = os.path.join(ckpt_dir, "vallex-jax.npz")
    CK.save_native(native, params)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    report.add("convert", "PASS", f"{n/1e6:.1f} M params → {native}")

    for name, conv_mod, conv_fn, out in (
        ("vocos", "vallex_tpu.codec.vocos", "convert_vocos_state_dict",
         "vocos-jax.npz"),
        ("encodec", "vallex_tpu.codec.encodec", "convert_encodec_state_dict",
         "encodec-jax.npz"),
    ):
        src = os.path.join(ckpt_dir, f"{name}.pt")
        if not os.path.exists(src):
            report.add(f"convert:{name}", "SKIP", f"{src} absent")
            continue
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        sd = {k: np.asarray(v) for k, v in sd.items()}
        import importlib

        mod = importlib.import_module(conv_mod)
        cparams = getattr(mod, conv_fn)(sd)
        CK.save_native(os.path.join(ckpt_dir, out), cparams)
        report.add(f"convert:{name}", "PASS", out)
    return params


def step_parity(params, cfg, ref_model, report: Report, tol: float = 2e-4):
    """Per-layer activation + e2e greedy token parity vs the torch model.

    Runs under jax.default_matmul_precision("highest"): on TPU, f32
    matmuls otherwise round through bf16 passes and the comparison would
    measure hardware precision, not converter correctness."""
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    with jax.default_matmul_precision("highest"):
        return _step_parity_impl(
            params, cfg, ref_model, report, tol, np, torch, jax, jnp
        )


def _step_parity_impl(params, cfg, ref_model, report, tol, np, torch, jax, jnp):

    from vallex_tpu.models import layers as L
    from vallex_tpu.models import vallex as V
    from vallex_tpu.config import EngineConfig
    from vallex_tpu.engine import AREngine, NAREngine

    D = cfg.d_model
    fparams = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    # --- per-layer AR prefill activations -----------------------------------
    S = 24
    x_len = 10
    torch.manual_seed(1)
    x = torch.randn(1, S, D)
    bool_mask = torch.triu(torch.ones(S, S, dtype=torch.bool), diagonal=1)
    bool_mask[:, :x_len] = False
    h_t = x
    per_layer = []
    with torch.no_grad():
        for li, layer in enumerate(ref_model.ar_decoder.layers):
            h_t = layer(h_t, src_mask=bool_mask)
            per_layer.append(h_t.detach().numpy())
    add_mask = V.prefill_mask(jnp.asarray(x_len), S)
    h_j = jnp.asarray(x.numpy())

    worst = 0.0
    for li in range(cfg.num_layers):
        lp = jax.tree.map(
            lambda a, li=li: a[li], fparams["ar_decoder"]["layers"]
        )
        h_j = L.encoder_layer_apply(lp, h_j, cfg.num_heads, add_mask)
        diff = float(np.abs(np.asarray(h_j) - per_layer[li]).max())
        worst = max(worst, diff)
        if diff > tol:
            report.add(
                "parity:ar-layers", "FAIL",
                f"layer {li} max|Δ| {diff:.2e} > {tol}"
            )
            return False
    report.add("parity:ar-layers", "PASS", f"max per-layer |Δ| {worst:.2e}")

    # --- NAR stage activations ----------------------------------------------
    torch.manual_seed(2)
    xn = torch.randn(1, 19, D)
    ok = True
    for stage in (0, 6):
        with torch.no_grad():
            ref, _ = ref_model.nar_decoder(
                (xn, ref_model.nar_stage_embeddings[stage].weight)
            )
        ours = np.asarray(
            V.nar_forward_stage(
                fparams, cfg, jnp.asarray(xn.numpy()), jnp.asarray(stage)
            )
        )
        diff = float(np.abs(ours - ref.detach().numpy()).max())
        if diff > tol:
            report.add(
                "parity:nar-stages", "FAIL",
                f"stage {stage} max|Δ| {diff:.2e} > {tol}"
            )
            ok = False
        else:
            report.add(
                f"parity:nar-stage{stage}", "PASS", f"max|Δ| {diff:.2e}"
            )
    if not ok:
        return False

    # --- end-to-end greedy token parity (VALLE.inference) -------------------
    ecfg = EngineConfig(
        text_buckets=(64, 128), audio_buckets=(512, 1024),
        compute_dtype="float32", decode_mode="xla", speculative="off",
    )
    rng = np.random.RandomState(3)
    for with_prompt in (False, True):
        S = 9
        text = rng.randint(5, 100, size=(1, S)).astype(np.int64)
        Tp = 11 if with_prompt else 0
        prompt_codes = rng.randint(
            0, 1024, size=(1, Tp, 8)
        ).astype(np.int64)
        enroll = 4 if with_prompt else 0
        with torch.no_grad():
            ref_codes = ref_model.inference(
                torch.tensor(text), torch.tensor([S]),
                torch.tensor(prompt_codes, dtype=torch.int32),
                enroll_x_lens=enroll, top_k=1, temperature=1.0,
                prompt_language="zh", text_language="en", best_of=1,
            ).numpy()[0]
        lang_ids = np.concatenate(
            [np.full(enroll, 1), np.full(S - enroll, 0)]
        ).astype(np.int32)
        ar = AREngine(fparams, cfg, ecfg)
        gen_cb0, _ = ar.generate(
            text[0].astype(np.int32), lang_ids,
            prompt_codes[0, :, 0].astype(np.int32) if with_prompt else None,
            top_k=1,
        )
        if gen_cb0.shape[0] != ref_codes.shape[0] or (
            gen_cb0 != ref_codes[:, 0]
        ).any():
            report.add(
                "parity:e2e-greedy", "FAIL",
                f"prompt={with_prompt}: AR tokens diverge "
                f"(ours {gen_cb0.shape[0]} vs ref {ref_codes.shape[0]})",
            )
            return False
        nar = NAREngine(fparams, cfg, ecfg)
        codes = nar.generate(
            text[0].astype(np.int32), lang_ids, gen_cb0,
            prompt_codes[0].astype(np.int32) if with_prompt else None,
        )
        if (codes != ref_codes).any():
            report.add(
                "parity:e2e-greedy", "FAIL",
                f"prompt={with_prompt}: NAR codes diverge",
            )
            return False
    report.add(
        "parity:e2e-greedy", "PASS",
        "token-exact vs VALLE.inference (with + without prompt)",
    )
    return True


def step_goldens(ckpt_dir: str, cfg, ecfg_kw, report: Report):
    """Synthesize golden utterances with the converted weights."""
    import numpy as np

    from vallex_tpu import api
    from vallex_tpu.config import SAMPLE_RATE, EngineConfig
    from vallex_tpu.utils.audio import save_wav

    out_dir = os.path.join(ckpt_dir, "goldens")
    os.makedirs(out_dir, exist_ok=True)
    ecfg = EngineConfig(**ecfg_kw)
    api.preload_models(ckpt_dir, ecfg=ecfg)
    total_audio, total_wall = 0.0, 0.0
    for lang, text in GOLDEN_TEXTS:
        t0 = time.time()
        try:
            wave = api.generate_audio(
                text, prompt="paimon", language=lang, top_k=1, seed=0
            )
        except Exception as e:  # vocoder weights may be absent
            report.add(f"golden:{lang}", "SKIP", str(e)[:100])
            continue
        wall = time.time() - t0
        save_wav(os.path.join(out_dir, f"golden_{lang}.wav"), wave)
        total_audio += len(wave) / SAMPLE_RATE
        total_wall += wall
        report.add(
            f"golden:{lang}", "PASS",
            f"{len(wave)/SAMPLE_RATE:.1f}s audio in {wall:.2f}s",
        )
    if total_audio:
        report.add(
            "golden:rtf", "PASS",
            f"aggregate RTF {total_wall/total_audio:.4f} "
            "(first-call, includes compiles)",
        )
    return out_dir


def step_quant_ab(ckpt_dir: str, ecfg_kw, report: Report, seeds=range(5)):
    """Quantized modes vs bf16 strict: greedy divergence with thresholds."""
    import numpy as np

    from vallex_tpu import api
    from vallex_tpu.config import EngineConfig

    text = GOLDEN_TEXTS[0][1]

    def cb0_runs(quantize):
        ecfg = EngineConfig(
            **{**ecfg_kw, "quantize": quantize, "speculative": "off"}
        )
        api.preload_models(ckpt_dir, ecfg=ecfg)
        b = api._bundle
        at, tt, lc = api._load_prompt("paimon")
        ids, langs = api._prepare_text(b, text, tt, lc)
        out = {}
        for s in seeds:
            codes, _ = b.pipeline.synthesize(
                ids, langs, at, top_k=-100, seed=s, return_wave=False
            )
            out[s] = np.asarray(codes[:, 0])
        return out

    base = cb0_runs("none")
    verdicts = {}
    for mode in ("int8", "int8kv", "w8a8"):
        try:
            runs = cb0_runs(mode)
        except Exception as e:
            report.add(f"quant:{mode}", "SKIP", str(e)[:100])
            continue
        divs, div_pcts = [], []
        for s in seeds:
            a, b = base[s], runs[s]
            n = min(len(a), len(b))
            d = (
                int(np.argmax(a[:n] != b[:n]))
                if n and (a[:n] != b[:n]).any() else n
            )
            divs.append(d)
            div_pcts.append(100.0 * (1.0 - d / max(n, 1)))
        med = float(np.median(divs))
        pct = float(np.mean(div_pcts))
        accept = med >= ACCEPT_PREFIX_FRAMES and pct <= ACCEPT_DIVERGENCE_PCT
        verdicts[mode] = accept
        report.add(
            f"quant:{mode}", "PASS" if accept else "WARN",
            f"median first-divergence {med:.0f} frames, "
            f"mean divergence {pct:.1f}% → "
            f"{'ACCEPT' if accept else 'KEEP bf16 default'}",
        )
    rec = (
        "int8kv" if verdicts.get("int8kv") else
        "int8" if verdicts.get("int8") else "none"
    )
    report.add(
        "quant:recommendation", "PASS",
        f"serving default quantize='{rec}' "
        "(set EngineConfig.quantize in your serving config)",
    )
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument(
        "--dry-run", action="store_true",
        help="reconstruct a random-weight torch VALLE in the reference "
        "checkpoint format and run the identical pipeline",
    )
    p.add_argument(
        "--small", action="store_true",
        help="CPU-sized model (dry-run rehearsal / tests)",
    )
    p.add_argument(
        "--skip-goldens", action="store_true",
        help="skip golden synthesis (e.g. no vocoder weights yet)",
    )
    p.add_argument(
        "--skip-quant", action="store_true",
        help="skip the quantization A/B (CPU dry-runs: the quant modes "
        "need the TPU megakernel)",
    )
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/vallex-jax-cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    from vallex_tpu.config import ModelConfig

    cfg = (
        ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=256)
        if args.small else ModelConfig()
    )
    on_tpu = jax.default_backend() not in ("cpu",)
    ecfg_kw = dict(
        text_buckets=(64, 256), audio_buckets=(512, 1024),
        compute_dtype="bfloat16" if on_tpu else "float32",
    )

    report = Report()
    ckpt_dir = args.checkpoint_dir
    os.makedirs(ckpt_dir, exist_ok=True)

    ref_model = None
    if args.dry_run:
        import torch

        ref_model = build_reference_model(cfg)
        sd = ref_model.state_dict()
        pt = os.path.join(ckpt_dir, "vallex-checkpoint.pt")
        torch.save({"model": sd}, pt)
        report.add(
            "dry-run", "PASS",
            f"reconstructed torch VALLE ({cfg.num_layers}L/{cfg.d_model}d) "
            f"→ {pt}",
        )

    # 1. convert
    params = step_convert(ckpt_dir, cfg, report)
    if params is None:
        report.write(os.path.join(ckpt_dir, "FIRST_WEIGHTS_REPORT.md"))
        return 1

    # 2. parity vs the reference torch model carrying the same weights
    if ref_model is None:
        try:
            import torch

            ref_model = build_reference_model(cfg)
            pt = os.path.join(ckpt_dir, "vallex-checkpoint.pt")
            state = torch.load(pt, map_location="cpu", weights_only=True)
            ref_model.load_state_dict(state["model"], strict=True)
        except Exception as e:
            report.add("parity", "SKIP", f"torch reference unavailable: {e}")
            ref_model = None
    if ref_model is not None:
        step_parity(params, cfg, ref_model, report)

    # 3. goldens (needs model-size cfg matching the API default)
    if args.skip_goldens or args.small:
        report.add(
            "goldens", "SKIP",
            "--small runs a non-default model size" if args.small
            else "--skip-goldens",
        )
    else:
        step_goldens(ckpt_dir, cfg, ecfg_kw, report)

    # 4. quant A/B (TPU megakernel path)
    if args.skip_quant or args.small or not on_tpu:
        report.add(
            "quant", "SKIP",
            "quant modes run the TPU megakernel"
            if not on_tpu else "--skip-quant/--small",
        )
    else:
        step_quant_ab(ckpt_dir, ecfg_kw, report)

    extra = (
        "Thresholds: a quantized mode is ACCEPTed as serving default when "
        f"its greedy decode tracks bf16 for ≥{ACCEPT_PREFIX_FRAMES} frames "
        f"(median) and diverges on ≤{ACCEPT_DIVERGENCE_PCT}% of positions."
    )
    report.write(os.path.join(ckpt_dir, "FIRST_WEIGHTS_REPORT.md"), extra)
    return 1 if report.failed else 0


if __name__ == "__main__":
    sys.exit(main())
