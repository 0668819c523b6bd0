"""Batch-parallel synthesis across the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from vallex_tpu.config import EngineConfig, ModelConfig
from vallex_tpu.engine.batch import batch_synthesize
from vallex_tpu.models.vallex import init_vallex
from vallex_tpu.parallel.mesh import make_mesh

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
