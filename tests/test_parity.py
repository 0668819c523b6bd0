"""Activation-parity tests: our JAX model vs the PyTorch reference.

The reference implementation (mounted read-only at /root/reference) is
imported as a test oracle: we build a small random-weight VALLE, convert its
state dict with utils/checkpoint.py, and require layer/stack outputs to match
within fp32 tolerance. This validates both the converter's key mapping and
the JAX forward math (attention, pre-norm residuals, AdaLN, PE, KV cache).
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

sys.path.insert(0, REFERENCE_DIR)

import torch  # noqa: E402

torch.manual_seed(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vallex_tpu.config import ModelConfig  # noqa: E402
from vallex_tpu.models import layers as L  # noqa: E402
from vallex_tpu.models import vallex as V  # noqa: E402
from vallex_tpu.utils.checkpoint import convert_torch_state_dict  # noqa: E402

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier


D, H, NL = 64, 4, 2
CFG = ModelConfig(d_model=D, num_heads=H, num_layers=NL, ffn_dim=4 * D)

TOL = 2e-4


@pytest.fixture(scope="module")
def ref_model():
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


def _np(t):
    return t.detach().numpy()


def test_converter_covers_all_keys(ref_model, params):
    n_torch = sum(p.numel() for p in ref_model.parameters())
    # account for stacking pads: nar embeddings 1..7 padded by one row each
    n_pad = 7 * D
    n_ours = sum(
        x.size for x in jax.tree.leaves(params)
    )
    # nar predict heads 0..5 are tied in torch (shared storage) but
    # materialized in our stack — they are double counted there.
    n_tied = 6 * D * 1024
    assert n_ours == n_torch + n_pad + n_tied


def test_sine_positional_embedding(ref_model):
    x = torch.randn(1, 37, D)
    ref = _np(ref_model.ar_audio_position(x))
    pe = L.make_sine_pe(4000, D)
    alpha = jnp.asarray(_np(ref_model.ar_audio_position.alpha).reshape(()))
    ours = np.asarray(L.sine_pe_apply(pe, alpha, jnp.asarray(_np(x))))
    np.testing.assert_allclose(ours, ref, atol=TOL)


def test_ar_stack_forward_parity(ref_model, params):
    S = 24
    x = torch.randn(2, S, D)
    # causal-with-text-prefix mask, x_len=10
    x_len = 10
    bool_mask = torch.zeros(S, S, dtype=torch.bool)
    causal = torch.triu(torch.ones(S, S, dtype=torch.bool), diagonal=1)
    bool_mask |= causal
    bool_mask[:, :x_len] = False  # text prefix visible
    with torch.no_grad():
        ref = _np(ref_model.ar_decoder(x, mask=bool_mask))

    add_mask = V.prefill_mask(jnp.asarray(x_len), S)
    ours = np.asarray(
        L.encoder_stack_apply(
            params["ar_decoder"], jnp.asarray(_np(x)), H, add_mask
        )
    )
    np.testing.assert_allclose(ours, ref, atol=TOL)


def test_nar_stack_stage_parity(ref_model, params):
    S = 19
    x = torch.randn(1, S, D)
    for stage in (0, 3, 6):
        with torch.no_grad():
            ref, _ = ref_model.nar_decoder(
                (x, ref_model.nar_stage_embeddings[stage].weight)
            )
        ours = np.asarray(
            V.nar_forward_stage(
                params, CFG, jnp.asarray(_np(x)), jnp.asarray(stage)
            )
        )
        np.testing.assert_allclose(ours, _np(ref), atol=TOL, err_msg=f"stage{stage}")


def test_nar_predict_weight_tying(ref_model, params):
    # heads 0..5 must equal audio embeddings 2..7 (transposed)
    for j in range(6):
        emb = _np(ref_model.nar_audio_embeddings[j + 2].weight)
        head = np.asarray(params["nar_predict_layers"]["w"][j])
        np.testing.assert_allclose(head, emb.T, atol=0)


def test_kv_cache_decode_parity(ref_model, params):
    """Prefill + single-token decode steps == full-sequence forward."""
    S0, steps = 12, 5
    x_len = 8
    total = S0 + steps
    x_full = torch.randn(1, total, D)

    # reference: run .infer incrementally with kv cache
    def ref_mask(y_len):
        full = x_len + y_len
        m = torch.zeros(full, full, dtype=torch.bool)
        m |= torch.triu(torch.ones(full, full, dtype=torch.bool), 1)
        m[:, :x_len] = False
        return m

    with torch.no_grad():
        kv = None
        outs = []
        for t in range(steps + 1):
            cur_len = S0 + t
            inp = x_full[:, :cur_len] if kv is None else x_full[:, cur_len - 1 : cur_len]
            out, kv = ref_model.ar_decoder.infer(
                inp, mask=ref_mask(cur_len - x_len), past_kv=kv, use_cache=True
            )
            outs.append(_np(out[:, -1]))

    # ours: prefill then decode steps against a padded cache
    Tmax = 32
    xj = jnp.asarray(_np(x_full))
    mask = V.prefill_mask(jnp.asarray(x_len), S0)

    def prefill_body(carry, layer_p):
        h, ks, vs = carry["h"], carry["ks"], carry["vs"]
        h2, k, v = L.encoder_layer_prefill(layer_p, h, H, mask)
        return {"h": h2, "ks": ks, "vs": vs}, (k, v)

    carry0 = {"h": xj[:, :S0], "ks": None, "vs": None}

    # simpler: loop layers in python for the test
    h = xj[:, :S0]
    caches = []
    for i in range(NL):
        layer_p = jax.tree.map(lambda a, i=i: a[i], params["ar_decoder"]["layers"])
        h, k, v = L.encoder_layer_prefill(layer_p, h, H, mask)
        ck = jnp.zeros((1, H, Tmax, D // H))
        cv = jnp.zeros((1, H, Tmax, D // H))
        ck = ck.at[:, :, :S0].set(k)
        cv = cv.at[:, :, :S0].set(v)
        caches.append((ck, cv))
    h = L.layer_norm_apply(params["ar_decoder"]["norm"], h)
    np.testing.assert_allclose(
        np.asarray(h[:, -1]), outs[0], atol=TOL, err_msg="prefill"
    )

    for t in range(1, steps + 1):
        pos = S0 + t - 1
        xt = xj[:, pos : pos + 1]
        kv_mask = jnp.where(
            jnp.arange(Tmax)[None, None, None, :] <= pos, 0.0, V.NEG_INF
        )
        h = xt
        for i in range(NL):
            layer_p = jax.tree.map(
                lambda a, i=i: a[i], params["ar_decoder"]["layers"]
            )
            ck, cv = caches[i]
            h, ck, cv = L.encoder_layer_decode_step(
                layer_p, h, ck, cv, pos, H, kv_mask
            )
            caches[i] = (ck, cv)
        h = L.layer_norm_apply(params["ar_decoder"]["norm"], h)
        np.testing.assert_allclose(
            np.asarray(h[:, -1]), outs[t], atol=TOL, err_msg=f"step{t}"
        )


def test_text_input_parity(ref_model, params):
    """Text embedding + language embedding + PE vs reference inference prologue
    (models/vallex.py:497-507)."""
    S, enroll = 14, 6
    text = torch.randint(0, 2048, (1, S))
    with torch.no_grad():
        x = ref_model.ar_text_embedding(text)
        x[:, :enroll] += ref_model.ar_language_embedding(torch.tensor([1]))
        x[:, enroll:] += ref_model.ar_language_embedding(torch.tensor([0]))
        ref = _np(ref_model.ar_text_position(x))

    pe = L.make_sine_pe(4000, D)
    lang_ids = jnp.asarray(
        np.concatenate([np.full(enroll, 1), np.full(S - enroll, 0)])[None]
    )
    ours = np.asarray(
        V.text_input(
            params, CFG, jnp.asarray(_np(text)), lang_ids, "ar", pe
        )
    )
    np.testing.assert_allclose(ours, ref, atol=TOL)


def test_megakernel_matches_torch_reference(ref_model, params, monkeypatch):
    """The fused Pallas decode step (interpret mode) must reproduce the torch
    reference's incremental KV-cache decode through converted weights."""
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call
    monkeypatch.setattr(
        pl_mod, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    import importlib

    from vallex_tpu.ops import decode_step as DS

    importlib.reload(DS)

    from vallex_tpu.models import layers as L
    from vallex_tpu.ops.decode_attention import pack_cache

    x_len, s_text = 6, 128
    C = s_text + 512
    hd = D // H

    # reference: prefill over [text(6) | BOS] then 3 incremental steps
    rng = np.random.RandomState(5)
    text = torch.tensor(rng.randint(5, 100, (1, x_len)))
    with torch.no_grad():
        x_emb = ref_model.ar_text_embedding(text)
        x_emb = ref_model.ar_text_position(x_emb)
        bos = torch.tensor([[1025]])
        y_emb = ref_model.ar_audio_position(ref_model.ar_audio_embedding(bos))
        xy = torch.cat([x_emb, y_emb], dim=1)
        S0 = x_len + 1
        # text prefix visible to all; audio causal (reference mask shape,
        # models/vallex.py:535-549)
        mask = torch.triu(torch.ones(S0, S0, dtype=torch.bool), diagonal=1)
        mask[:, :x_len] = False
        out, kv = ref_model.ar_decoder.infer(xy, mask=mask, use_cache=True)

        ref_logits = []
        toks = [70, 512, 999]
        for t, tok in enumerate(toks):
            pos = 1 + t
            emb = ref_model.ar_audio_embedding(torch.tensor([[tok]]))
            emb = emb + ref_model.ar_audio_position.pe[:, pos : pos + 1]
            full = x_len + pos + 1
            m = torch.zeros(full, full, dtype=torch.bool)
            m |= torch.triu(torch.ones(full, full, dtype=torch.bool), 1)
            m[:, :x_len] = False
            out, kv = ref_model.ar_decoder.infer(
                emb, mask=m, past_kv=kv, use_cache=True
            )
            h = out[:, -1]
            ref_logits.append(
                (h @ ref_model.ar_predict_layer.weight.T).numpy()
            )

    # ours: build the caches from the converted params via the XLA prefill,
    # then run the fused kernel for the 3 steps
    import jax
    import jax.numpy as jnp

    from vallex_tpu.models import vallex as V

    pe = L.make_sine_pe(CFG.max_position, D)
    lang0 = jnp.zeros((1, x_len), jnp.int32)
    # reference prologue above omitted language embeddings; match it by
    # bypassing text_input and embedding directly
    xj = L.embedding_apply(params["ar_text_embedding"], jnp.asarray(text.numpy()))
    xj = L.sine_pe_apply(pe, params["ar_text_position"]["alpha"], xj)
    yj = L.embedding_apply(params["ar_audio_embedding"], jnp.asarray([[1025]]))
    yj = L.sine_pe_apply(pe, params["ar_audio_position"]["alpha"], yj)
    xyj = jnp.concatenate([xj, yj], axis=1)
    pf_mask = V.prefill_mask(jnp.asarray(x_len), x_len + 1)

    cks = jnp.zeros((NL, C, H * hd), jnp.float32)
    cvs = jnp.zeros((NL, C, H * hd), jnp.float32)
    h = xyj
    for i in range(NL):
        lp = jax.tree.map(lambda a, i=i: a[i], params["ar_decoder"]["layers"])
        h, k, v = L.encoder_layer_prefill(lp, h, H, pf_mask)
        packed_k = pack_cache(k)  # [S0, N]
        packed_v = pack_cache(v)
        # text at rows 0..x_len-1, BOS at row s_text
        cks = cks.at[i, :x_len].set(packed_k[:x_len])
        cks = cks.at[i, s_text].set(packed_k[x_len])
        cvs = cvs.at[i, :x_len].set(packed_v[:x_len])
        cvs = cvs.at[i, s_text].set(packed_v[x_len])

    lw = DS.pack_layer_weights(
        params["ar_decoder"]["layers"], dtype=jnp.float32,
        final_norm=params["ar_decoder"]["norm"],
        predict_w=params["ar_predict_layer"]["w"],
        audio_embedding=params["ar_audio_embedding"]["weight"],
    )
    for t, tok in enumerate([70, 512, 999]):
        pos = 1 + t
        logits_pad, _, _, cks, cvs = DS._call_kernel(
            lw, cks, cvs, jnp.zeros((1, D)),
            jnp.asarray([tok], jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(1, jnp.int32),
            jnp.asarray(
                [[float(np.asarray(params["ar_audio_position"]["alpha"])), 1.0]],
                jnp.float32,
            ),
            jnp.asarray(x_len), jnp.asarray(pos),
            s_text=s_text, num_heads=H, fused=True, vocab=1025,
        )
        np.testing.assert_allclose(
            np.asarray(logits_pad[:, :1025]), ref_logits[t], atol=5e-3,
            err_msg=f"step {t}",
        )
    importlib.reload(DS)
