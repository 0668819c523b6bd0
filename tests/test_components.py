"""Tests for the auxiliary components: VALL-F, debug TTS, data pipeline,
ScaledAdam/schedules, scaling toolkit, model factory, continual, visualizer."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vallex_tpu.config import EngineConfig, ModelConfig

TINY = ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=128)


def test_model_factory_dispatch():
    from vallex_tpu.models import get_model, transformer_tts, vallex, vallf

    assert get_model("VALL-E")[1] is vallex
    assert get_model("VALL-F")[1] is vallf
    assert get_model("Transformer")[1] is transformer_tts
    with pytest.raises(ValueError):
        get_model("nope")


def test_vallf_end_to_end():
    from vallex_tpu.models.vallf import (
        init_vallf, vallf_ar_generate, vallf_nar_generate,
    )

    params = init_vallf(jax.random.PRNGKey(0), TINY)
    S, TA = 12, 64
    text = jnp.asarray(np.random.RandomState(0).randint(5, 99, (1, S)))
    prompt = jnp.asarray(np.random.RandomState(1).randint(0, 1024, (1, 8)))
    y, gen_len = vallf_ar_generate(
        params, TINY, text, jnp.asarray(S), prompt, jnp.asarray(8),
        jax.random.PRNGKey(1), jnp.asarray(1.0), jnp.asarray(True),
        t_audio=TA,
    )
    assert y.shape == (1, TA)
    n = int(gen_len)
    assert 0 < n <= TA

    cb0 = jnp.concatenate(
        [y[:, 1:], jnp.full((1, 1), TINY.eos_id, y.dtype)], axis=1
    )
    codes_in = jnp.zeros((1, TA, 8), jnp.int32).at[..., 0].set(cb0)
    codes = vallf_nar_generate(
        params, TINY, text, jnp.asarray(S), codes_in,
        jnp.asarray(8 + n), jnp.asarray(8), t_audio=TA,
    )
    assert codes.shape == (1, TA, 8)
    assert (np.asarray(codes[..., 1:]) < 1024).all()


def test_transformer_tts_forward_and_inference():
    from vallex_tpu.models.transformer_tts import (
        forward, inference, init_transformer_tts,
    )

    params = init_transformer_tts(jax.random.PRNGKey(0), TINY)
    B, S, T = 2, 10, 20
    rng = np.random.RandomState(0)
    loss, metrics = forward(
        params, TINY,
        jnp.asarray(rng.randint(5, 99, (B, S))),
        jnp.asarray([S, S - 2]),
        jnp.asarray(rng.randn(B, T, 100), jnp.float32),
        jnp.asarray([T, T - 5]),
    )
    assert np.isfinite(float(loss))
    assert float(metrics["mel_mse"]) > 0

    mels, n = inference(
        params, TINY, jnp.asarray(rng.randint(5, 99, (1, S))),
        jnp.asarray(S), max_frames=16,
    )
    assert mels.shape == (1, 16, 100)
    assert 0 < int(n) <= 16


def test_dynamic_batch_sampler_budget():
    from vallex_tpu.data.dataset import DynamicBatchSampler

    lens = {i: (i % 10) + 1 for i in range(50)}
    sampler = DynamicBatchSampler(
        range(50), lambda i: lens[i], num_buckets=5,
        max_size=10, max_tokens=20, shuffle=False,
    )
    batches = list(sampler)
    seen = [i for b in batches for i in b]
    assert sorted(seen) == list(range(50))
    for b in batches:
        maxlen = max(lens[i] for i in b)
        assert maxlen * len(b) <= 20 or len(b) == 1


def test_dataset_h5_roundtrip(tmp_path):
    import h5py

    from vallex_tpu.data.dataset import AudioDataset, collate

    h5p = str(tmp_path / "audio.hdf5")
    ann = str(tmp_path / "ann.txt")
    rng = np.random.RandomState(0)
    with h5py.File(h5p, "w") as f:
        for i in range(3):
            g = f.create_group(f"utt{i}")
            g.create_dataset("audio", data=rng.randint(0, 1024, (8, 30 + i)))
    with open(ann, "w") as f:
        for i in range(3):
            f.write(f"utt{i}|{(30 + i) / 75:.2f}|en|hello world number {i}\n")

    ds = AudioDataset(h5p, ann)
    assert len(ds) == 3
    item = ds[0]
    assert item["audio_features"].shape == (8, 30)
    assert item["text_tokens_lens"] > 0

    batch = collate([ds[0], ds[2]], text_buckets=(64,), audio_buckets=(64,))
    assert batch["codes"].shape == (2, 64, 8)
    assert batch["text_ids"].shape == (2, 64)
    assert list(batch["audio_lens"]) == [30, 32]


def test_scaled_adam_converges_and_scales():
    from vallex_tpu.train.scaled_adam import scaled_adam

    opt = scaled_adam(learning_rate=0.1)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    state = opt.init(params)

    def loss(p):
        return jnp.sum((p["w"] - 0.5) ** 2)

    for _ in range(60):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(loss(params)) < 0.3


def test_schedules_shape():
    from vallex_tpu.train.scaled_adam import eden_schedule, noam_schedule

    eden = eden_schedule(base_lr=0.05)
    assert float(eden(jnp.asarray(0))) < 0.05  # warmup ramp
    assert float(eden(jnp.asarray(500))) > float(eden(jnp.asarray(50000)))
    noam = noam_schedule(1.0, d_model=64, warmup=100)
    assert float(noam(jnp.asarray(10))) < float(noam(jnp.asarray(100)))
    assert float(noam(jnp.asarray(100))) > float(noam(jnp.asarray(10000)))


def test_scaling_toolkit():
    from vallex_tpu.models.scaling import (
        balanced_double_swish, basic_norm_apply, double_swish,
        init_basic_norm, init_scaled_linear, scaled_linear_apply,
    )

    x = jnp.linspace(-3, 3, 64).reshape(1, 64)
    y = double_swish(x)
    # double_swish(0) == 0, positive for large x, small negative dip
    assert abs(float(y[0, 32])) < 0.15
    assert float(y[0, -1]) > 2.0

    p = init_basic_norm()
    z = basic_norm_apply(p, x)
    assert np.isfinite(np.asarray(z)).all()
    # RMS after norm ≈ 1 (up to the eps term)
    assert 0.5 < float(jnp.sqrt(jnp.mean(z**2))) <= 1.01

    sl = init_scaled_linear(jax.random.PRNGKey(0), 64, 32)
    out = scaled_linear_apply(sl, x)
    assert out.shape == (1, 32)

    # balancer is identity in the forward pass, with finite grads
    g = jax.grad(lambda v: jnp.sum(balanced_double_swish(v)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_visualizer_writes_pngs(tmp_path):
    from vallex_tpu.utils.visualizer import visualize

    rng = np.random.RandomState(0)
    visualize(
        (rng.randn(2, 10, 8), rng.randn(2, 12, 8)),
        {
            "codes": rng.randint(0, 1024, (2, 12, 8)),
            "utt_ids": ["a", "b"],
        },
        str(tmp_path),
        limit=1,
    )
    import os

    files = os.listdir(tmp_path)
    assert "a_encoder.png" in files and "a_codes.png" in files


def test_continual_api(tmp_path):
    from vallex_tpu import api

    ecfg = EngineConfig(
        text_buckets=(64,), audio_buckets=(128,), compute_dtype="float32"
    )
    api.preload_models(
        str(tmp_path), random_weights=True, cfg=TINY, ecfg=ecfg
    )
    codes = np.random.RandomState(0).randint(0, 1024, (60, 8))
    out = api.continual("A continuation test.", codes)
    assert out.shape == (30, 8)  # prefix = T//2 = 30 stripped
    # codebook 0 preserved from the input
    np.testing.assert_array_equal(out[:, 0], codes[30:, 0])


def test_symbol_table_roundtrip(tmp_path):
    from vallex_tpu.utils.symbol_table import SymbolTable

    t = SymbolTable()
    assert t.add("a") == 1
    assert t.add("b") == 2
    assert t.add("a") == 1
    assert t["a"] == 1 and t[2] == "b"
    assert "a" in t and 3 not in t
    p = str(tmp_path / "syms.txt")
    t.to_file(p)
    t2 = SymbolTable.from_file(p)
    assert t == t2
    t3 = SymbolTable()
    t3.add("c", 5)
    merged = t.merge(t3)
    assert merged["c"] == 5 and merged["a"] == 1


def test_cli_list_presets(capsys):
    from vallex_tpu.cli import main

    assert main(["list-presets"]) == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 41
    assert "paimon" in out


def test_cli_synthesize(tmp_path):
    import sys

    from vallex_tpu import api
    from vallex_tpu.cli import main
    from vallex_tpu.config import EngineConfig, ModelConfig

    # preload a tiny bundle so the CLI reuses it... CLI calls preload itself;
    # patch preload to a tiny config for test speed
    orig = api.preload_models

    def tiny_preload(checkpoint_dir, **kw):
        return orig(
            checkpoint_dir, random_weights=True,
            cfg=ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=128),
            ecfg=EngineConfig(
                text_buckets=(64,), audio_buckets=(128,),
                compute_dtype="float32",
            ),
        )

    api.preload_models = tiny_preload
    try:
        out = str(tmp_path / "o.wav")
        rc = main([
            "synthesize", "Hi.", "--random-weights", "--top-k", "1",
            "--checkpoints", str(tmp_path), "-o", out,
        ])
        assert rc == 0
        import os

        assert os.path.exists(out)
    finally:
        api.preload_models = orig


def test_fbank_shapes_and_range():
    import jax.numpy as jnp

    from vallex_tpu.codec.fbank import extract_fbank

    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, 24000).astype(np.float32) * 0.1
    )
    feats = extract_fbank(wav)
    # reference framing: reflect-pad (n_fft-hop)/2 + center=False
    # (data/fbank.py:103-108) → samples // hop frames
    assert feats.shape == (1, 24000 // 256, 100)
    assert np.isfinite(np.asarray(feats)).all()
    # a pure tone concentrates energy in few mel bins
    t = np.arange(24000) / 24000
    tone = jnp.asarray(np.sin(2 * np.pi * 1000 * t)[None].astype(np.float32))
    f2 = np.asarray(extract_fbank(tone))[0, 40]
    assert f2.argmax() < 40  # 1 kHz lands in the lower third of the mel axis


def test_bpe_with_merges_matches_hf():
    import os

    import pytest as _pytest

    from tests.conftest import REFERENCE_DIR, reference_available
    from vallex_tpu.frontend.bpe import BPETokenizer

    if not reference_available():
        _pytest.skip("reference not mounted")
    path = os.path.join(REFERENCE_DIR, "utils/g2p/bpe_1024.json")
    tokenizers = _pytest.importorskip("tokenizers")
    hf = tokenizers.Tokenizer.from_file(path)
    ours = BPETokenizer.from_file(path)
    for s in ["həˈloʊ_wəɹɫd", "ni↓↑xɑʊ↓↑", "tʃʰiŋ→ts`⁼ɑʊ↓", "abc def"]:
        assert ours.encode(s) == hf.encode(s).ids, s


def test_prompted_features_container():
    from vallex_tpu.data.input_strategies import PromptedFeatures

    pf = PromptedFeatures(np.zeros(3), np.ones((2, 4)))
    assert pf.ndim == 2
    assert pf.sum() == 8
    a, b = pf.data
    assert a.shape == (3,) and b.shape == (2, 4)


def test_load_wav_24bit_fallback(tmp_path, monkeypatch):
    """24-bit PCM enrollment WAVs must load through the stdlib fallback
    (sample width 3 → sign-extended int32)."""
    import wave as wave_mod

    import numpy as np

    from vallex_tpu import native
    from vallex_tpu.utils.audio import load_wav

    sig = (0.5 * np.sin(np.arange(2400) * 0.05)).astype(np.float64)
    as24 = np.clip(sig * 8388607.0, -8388608, 8388607).astype(np.int32)
    raw = bytearray()
    for v in as24:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    p = str(tmp_path / "s24.wav")
    with wave_mod.open(p, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(24000)
        f.writeframes(bytes(raw))
    monkeypatch.setattr(native, "load_wav", lambda _p: None)  # force fallback
    wav, sr = load_wav(p, target_sr=24000)
    assert sr == 24000 and len(wav) == 2400
    np.testing.assert_allclose(wav, sig, atol=2e-6)


def test_fbank_matches_reference_pipeline():
    """Pin the extractor to the reference BigVGAN recipe (magnitude
    spectrum, slaney-scale slaney-normalized mel, log clip 1e-5) by
    recomputing it with torch.stft + an independent numpy port of
    librosa.filters.mel — the exact ops the reference uses
    (data/fbank.py:109-129)."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp

    from vallex_tpu.codec.fbank import HOP, N_FFT, extract_fbank

    def librosa_mel_np(sr, n_fft, n_mels, fmin, fmax):
        def hz_to_mel(f):
            f = np.atleast_1d(np.asarray(f, np.float64))
            f_sp = 200.0 / 3
            logstep = np.log(6.4) / 27.0
            m = f / f_sp
            t = f >= 1000.0
            m[t] = 1000.0 / f_sp + np.log(f[t] / 1000.0) / logstep
            return m

        def mel_to_hz(m):
            m = np.asarray(m, np.float64)
            f_sp = 200.0 / 3
            logstep = np.log(6.4) / 27.0
            f = m * f_sp
            t = m >= 1000.0 / f_sp
            f[t] = 1000.0 * np.exp(logstep * (m[t] - 1000.0 / f_sp))
            return f

        fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
        mel_f = mel_to_hz(
            np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2)
        )
        fdiff = np.diff(mel_f)
        ramps = mel_f[:, None] - fftfreqs[None, :]
        w = np.zeros((n_mels, len(fftfreqs)))
        for i in range(n_mels):
            w[i] = np.maximum(
                0, np.minimum(-ramps[i] / fdiff[i], ramps[i + 2] / fdiff[i + 1])
            )
        enorm = 2.0 / (mel_f[2:] - mel_f[:-2])
        return w * enorm[:, None]

    wav = np.random.RandomState(7).randn(24000).astype(np.float32) * 0.1
    y = torch.nn.functional.pad(
        torch.from_numpy(wav)[None],
        ((N_FFT - HOP) // 2, (N_FFT - HOP) // 2), mode="reflect",
    )
    spec = torch.stft(
        y, N_FFT, hop_length=HOP, win_length=N_FFT,
        window=torch.hann_window(N_FFT), center=False,
        onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9).numpy()[0]  # [F, T]
    mel_basis = librosa_mel_np(24000, N_FFT, 100, 0.0, 12000.0)
    ref = np.log(np.clip(mel_basis @ mag, 1e-5, None)).T  # [T, 100]

    ours = np.asarray(extract_fbank(jnp.asarray(wav[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


@pytest.mark.slow
def test_cli_synthesize_subprocess(tmp_path):
    """The console entrypoint works as a real OS process (imports, argparse,
    preload, synthesis, wav write) — in-process tests can hide broken
    __main__ wiring. --config shrinks the model so the subprocess stays
    fast on CPU."""
    import json
    import subprocess
    import sys

    cfg = {
        "model": {"d_model": 64, "num_heads": 4, "num_layers": 2,
                  "ffn_dim": 128},
        "engine": {"text_buckets": [128], "audio_buckets": [256],
                   "compute_dtype": "float32"},
    }
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "o.wav"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["VALLEX_COMPILE_CACHE"] = ""
    proc = subprocess.run(
        [sys.executable, "-m", "vallex_tpu.cli", "synthesize", "Hi.",
         "--random-weights", "--top-k", "1", "--config", str(cfg_path),
         "--platform", "cpu",  # axon images pin jax_platforms at startup
         "--checkpoints", str(tmp_path), "-o", str(out)],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 44  # wav header + data
    assert "wrote" in proc.stdout
