"""End-to-end token parity: our AR+NAR engines vs reference VALLE.inference.

With top_k=1 the reference's topk_sampling degenerates to argmax
(models/vallex.py:848-850 filters to the single best token), making the whole
AR+NAR pipeline deterministic — so a random-weight model must produce
IDENTICAL token sequences through both implementations.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

sys.path.insert(0, REFERENCE_DIR)

import torch  # noqa: E402

from vallex_tpu.config import EngineConfig, ModelConfig  # noqa: E402
from vallex_tpu.engine import AREngine, NAREngine  # noqa: E402
from vallex_tpu.utils.checkpoint import convert_torch_state_dict  # noqa: E402

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier


D, H, NL = 64, 4, 2
CFG = ModelConfig(d_model=D, num_heads=H, num_layers=NL, ffn_dim=4 * D)
ECFG = EngineConfig(
    text_buckets=(16, 32),
    audio_buckets=(128, 192),
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(7)
    from models.vallex import VALLE

    m = VALLE(
        D, H, NL,
        norm_first=True, add_prenet=False, prefix_mode=1,
        share_embedding=True, nar_scale_factor=1.0, prepend_bos=True,
        num_quantizers=8,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return convert_torch_state_dict(sd, CFG)


@pytest.mark.parametrize("with_prompt", [False, True])
def test_e2e_token_parity_greedy(ref_model, params, with_prompt):
    rng = np.random.RandomState(3)
    S = 9
    text = rng.randint(5, 100, size=(1, S)).astype(np.int64)
    if with_prompt:
        Tp = 11
        prompt_codes = rng.randint(0, 1024, size=(1, Tp, 8)).astype(np.int64)
        enroll = 4
    else:
        Tp = 0
        prompt_codes = np.zeros((1, 0, 8), np.int64)
        enroll = 0

    with torch.no_grad():
        ref_codes = ref_model.inference(
            torch.tensor(text),
            torch.tensor([S]),
            torch.tensor(prompt_codes, dtype=torch.int32),
            enroll_x_lens=enroll,
            top_k=1,
            temperature=1.0,
            prompt_language="zh",
            text_language="en",
            best_of=1,
        )
    ref_codes = ref_codes.numpy()[0]  # [T_gen, 8]

    lang_ids = np.concatenate(
        [np.full(enroll, 1), np.full(S - enroll, 0)]
    ).astype(np.int32)

    ar = AREngine(params, CFG, ECFG)
    gen_cb0, _ = ar.generate(
        text[0].astype(np.int32), lang_ids,
        prompt_codes[0, :, 0].astype(np.int32) if with_prompt else None,
        top_k=1,
    )
    assert gen_cb0.shape[0] == ref_codes.shape[0], (
        f"AR length mismatch: ours {gen_cb0.shape[0]} ref {ref_codes.shape[0]}"
    )
    np.testing.assert_array_equal(gen_cb0, ref_codes[:, 0])

    nar = NAREngine(params, CFG, ECFG)
    codes = nar.generate(
        text[0].astype(np.int32), lang_ids, gen_cb0,
        prompt_codes[0].astype(np.int32) if with_prompt else None,
    )
    np.testing.assert_array_equal(codes, ref_codes)
