"""Batch-parallel synthesis across the virtual 8-device CPU mesh."""

import importlib

import numpy as np
import pytest
import jax

from vallex_tpu.config import EngineConfig, ModelConfig
from vallex_tpu.engine.batch import batch_synthesize
from vallex_tpu.models.vallex import init_vallex
from vallex_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier


TINY = ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=128)
ECFG = EngineConfig(
    text_buckets=(16,), audio_buckets=(64,), compute_dtype="float32",
    top_k=1,
)


def test_batch_synthesize_over_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(dp=len(jax.devices()), tp=1)
    params = init_vallex(jax.random.PRNGKey(0), TINY)

    rng = np.random.RandomState(0)
    requests = []
    for i in range(3):
        S = 6 + i
        text = rng.randint(5, 99, S).astype(np.int32)
        langs = np.zeros(S, np.int32)
        prompt = (
            rng.randint(0, 1024, (5, 8)).astype(np.int32) if i % 2 else None
        )
        requests.append((text, langs, prompt))

    out = batch_synthesize(params, TINY, ECFG, mesh, requests)
    assert len(out) == 3
    for codes in out:
        assert codes.ndim == 2 and codes.shape[1] == 8
        assert codes.shape[0] > 0

    # per-request results must match the single-request pipeline (greedy)
    from vallex_tpu.engine.pipeline import SynthesisPipeline

    pipe = SynthesisPipeline(params, TINY, ECFG)
    for i, (text, langs, prompt) in enumerate(requests):
        codes_single, _ = pipe.synthesize(
            text, langs, prompt, top_k=1, seed=int(i), return_wave=False
        )
        # seeds differ (batch uses fold_in); greedy top_k=1 makes sampling
        # deterministic so results must agree
        np.testing.assert_array_equal(out[i], codes_single)


def test_batch_synthesize_per_chip_chunks(monkeypatch):
    """Mesh sharding composed with in-chip multi-request batching
    (per_chip > 1): every device runs ar_generate_batch over its own
    chunk. Greedy results must equal the per-request single pipeline."""
    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call
    monkeypatch.setattr(
        pl_mod, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    from vallex_tpu.ops import decode_block as DB
    from vallex_tpu.ops import decode_step as DS
    from vallex_tpu.ops import decode_verify as DV
    from vallex_tpu.engine import ar as AR
    from vallex_tpu.engine import batch as BT
    from vallex_tpu.engine import pipeline as PL

    importlib.reload(DS)
    importlib.reload(DB)
    importlib.reload(DV)
    importlib.reload(AR)
    importlib.reload(PL)
    importlib.reload(BT)
    try:
        # d_model=256: the block kernel needs s_text % 128 == 0 buckets
        cfg = ModelConfig(
            d_model=256, num_heads=4, num_layers=2, ffn_dim=512
        )
        e = EngineConfig(
            text_buckets=(128,), audio_buckets=(512,),
            compute_dtype="float32", top_k=1, decode_steps=4,
            decode_mode="megakernel", speculative="off",
        )
        mesh = make_mesh(dp=len(jax.devices()), tp=1)
        params = init_vallex(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        requests = []
        for i in range(4):  # 2 devices x per_chip=2
            S = 6 + i
            text = rng.randint(5, 99, S).astype(np.int32)
            langs = np.zeros(S, np.int32)
            prompt = (
                rng.randint(0, 1024, (7, 8)).astype(np.int32)
                if i % 2 else None
            )
            requests.append((text, langs, prompt))
        out = BT.batch_synthesize(
            params, cfg, e, mesh, requests, per_chip=2
        )
        assert len(out) == 4
        pipe = PL.SynthesisPipeline(params, cfg, e)
        pipe.decode_mode = "megakernel"
        for i, (text, langs, prompt) in enumerate(requests):
            codes_single, _ = pipe.synthesize(
                text, langs, prompt, top_k=1, seed=int(i),
                return_wave=False,
            )
            np.testing.assert_array_equal(out[i], codes_single)
    finally:
        monkeypatch.undo()
        importlib.reload(DS)
        importlib.reload(DB)
        importlib.reload(DV)
        importlib.reload(AR)
        importlib.reload(PL)
        importlib.reload(BT)
