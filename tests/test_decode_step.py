"""Megakernel (fused 12-layer decode step) vs plain layer math (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vallex_tpu.models import layers as L

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier



@pytest.mark.parametrize("x_len,pos", [(100, 3), (128, 200)])
def test_megakernel_matches_layer_math(x_len, pos, monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    import importlib

    from vallex_tpu.ops import decode_step as DS

    importlib.reload(DS)

    rng = jax.random.PRNGKey(0)
    NL, B, H, D, F = 3, 1, 4, 256, 512
    hd = D // H
    C, s_text = 640, 128  # C - s_text must be a multiple of ABLK (512)
    N = B * H * hd

    layers = [
        L.init_encoder_layer(k, D, F, adaptive=False)
        for k in jax.random.split(rng, NL)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    final_norm = L.init_layer_norm(D)
    final_norm = {
        "scale": jax.random.normal(jax.random.PRNGKey(7), (D,)) * 0.1 + 1.0,
        "bias": jax.random.normal(jax.random.PRNGKey(8), (D,)) * 0.1,
    }
    V = 1025
    wpred = jax.random.normal(jax.random.PRNGKey(9), (D, V)) * 0.05

    kx, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (B, 1, D), jnp.float32)
    cache_k = jax.random.normal(kk, (NL, B, H, C, hd), jnp.float32)
    cache_v = jax.random.normal(kv, (NL, B, H, C, hd), jnp.float32)
    slot = s_text + pos

    # reference: per-layer XLA decode step
    kv_mask = jnp.where(
        jnp.logical_or(
            jnp.arange(C)[None, None, None, :] < x_len,
            jnp.logical_and(
                jnp.arange(C)[None, None, None, :] >= s_text,
                jnp.arange(C)[None, None, None, :] <= slot,
            ),
        ),
        0.0,
        -1e9,
    )
    h_ref = x
    cks, cvs = list(cache_k), list(cache_v)
    for i in range(NL):
        lp = jax.tree.map(lambda a, i=i: a[i], stacked)
        h_ref, cks[i], cvs[i] = L.encoder_layer_decode_step(
            lp, h_ref, cks[i], cvs[i], slot, H, kv_mask
        )

    # reference logits: final norm + prediction head
    logits_ref = jnp.dot(
        L.layer_norm_apply(final_norm, h_ref[:, 0]), wpred
    )

    # megakernel
    from vallex_tpu.ops.decode_attention import pack_cache

    lw = DS.pack_layer_weights(
        stacked, dtype=jnp.float32, final_norm=final_norm, predict_w=wpred
    )
    ck_packed = jnp.stack([pack_cache(cache_k[i]) for i in range(NL)])
    cv_packed = jnp.stack([pack_cache(cache_v[i]) for i in range(NL)])
    logits_pad, ck2, cv2 = DS.decode_step(
        x[:, 0], lw, ck_packed, cv_packed,
        jnp.asarray(x_len), jnp.asarray(pos),
        s_text=s_text, num_heads=H,
    )
    assert logits_pad.shape[-1] == 1152  # 1025 padded to lane multiple
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, :V]), np.asarray(logits_ref), atol=2e-3
    )
    for i in range(NL):
        np.testing.assert_allclose(
            np.asarray(ck2[i]),
            np.asarray(pack_cache(cks[i])),
            atol=2e-3,
            err_msg=f"cache_k layer {i}",
        )
        np.testing.assert_allclose(
            np.asarray(cv2[i]),
            np.asarray(pack_cache(cvs[i])),
            atol=2e-3,
            err_msg=f"cache_v layer {i}",
        )

    importlib.reload(DS)


def test_int8_quantized_step_close_to_fp32(monkeypatch):
    """W8A16 quantized megakernel ≈ fp32 kernel (per-channel int8 error)."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    import importlib

    from vallex_tpu.ops import decode_step as DS

    importlib.reload(DS)
    from vallex_tpu.ops.decode_attention import pack_cache

    rng = jax.random.PRNGKey(0)
    NL, B, H, D, F = 3, 1, 4, 256, 512
    C, s_text = 640, 128
    layers = [
        L.init_encoder_layer(k, D, F, adaptive=False)
        for k in jax.random.split(rng, NL)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    final_norm = {
        "scale": jnp.ones((D,)),
        "bias": jnp.zeros((D,)),
    }
    wpred = jax.random.normal(jax.random.PRNGKey(9), (D, 1025)) * 0.05

    x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    cache_k = jax.random.normal(jax.random.PRNGKey(2), (NL, B, H, C, D // H))
    cache_v = jax.random.normal(jax.random.PRNGKey(3), (NL, B, H, C, D // H))
    ckp = jnp.stack([pack_cache(cache_k[i]) for i in range(NL)])
    cvp = jnp.stack([pack_cache(cache_v[i]) for i in range(NL)])

    lw = DS.pack_layer_weights(
        stacked, dtype=jnp.float32, final_norm=final_norm, predict_w=wpred
    )
    logits_fp, _, _ = DS.decode_step(
        x, lw, ckp, cvp, jnp.asarray(100), jnp.asarray(3),
        s_text=s_text, num_heads=H,
    )
    lwq = DS.quantize_weights(lw)
    assert lwq["wqkv"].dtype == jnp.int8
    logits_q, _, _ = DS.decode_step(
        x, lwq, ckp, cvp, jnp.asarray(100), jnp.asarray(3),
        s_text=s_text, num_heads=H, quant=True,
    )
    fp = np.asarray(logits_fp[:, :1025])
    q = np.asarray(logits_q[:, :1025])
    # int8 per-channel error compounds over 3 layers; demand high agreement
    corr = np.corrcoef(fp.ravel(), q.ravel())[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(q - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.05, rel

    # W8A8 (int8 activations, native int8 MXU matmuls) — looser bound
    logits_a, _, _ = DS.decode_step(
        x, lwq, ckp, cvp, jnp.asarray(100), jnp.asarray(3),
        s_text=s_text, num_heads=H, quant=True, act_quant=True,
    )
    a = np.asarray(logits_a[:, :1025])
    corr_a = np.corrcoef(fp.ravel(), a.ravel())[0, 1]
    assert corr_a > 0.995, corr_a
    rel_a = np.abs(a - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel_a < 0.1, rel_a
    importlib.reload(DS)


def test_megakernel_multibeam(monkeypatch):
    """best_of>1: beams fold into the lane axis; each beam's decode must
    match a single-beam run of the same token."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    import importlib

    from vallex_tpu.ops import decode_step as DS

    importlib.reload(DS)
    from vallex_tpu.ops.decode_attention import pack_cache

    rng = jax.random.PRNGKey(0)
    NL, H, D, F = 2, 4, 256, 512
    C, s_text = 640, 128
    layers = [
        L.init_encoder_layer(k, D, F, adaptive=False)
        for k in jax.random.split(rng, NL)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    fn = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    wpred = jax.random.normal(jax.random.PRNGKey(9), (D, 1025)) * 0.05
    emb = jax.random.normal(jax.random.PRNGKey(10), (1026, D))
    lw = DS.pack_layer_weights(
        stacked, dtype=jnp.float32, final_norm=fn, predict_w=wpred,
        audio_embedding=emb,
    )

    B = 3
    cache1 = jax.random.normal(jax.random.PRNGKey(2), (NL, 1, H, C, D // H))
    ckB = jnp.stack(
        [pack_cache(jnp.tile(cache1[i], (B, 1, 1, 1))) for i in range(NL)]
    )
    ck1 = jnp.stack([pack_cache(cache1[i]) for i in range(NL)])
    cv1 = ck1 * 0.5
    cvB = ckB * 0.5

    toks = jnp.asarray([7, 7, 7], jnp.int32)  # same token on every beam
    args = dict(
        x_len=jnp.asarray(100), audio_pos=jnp.asarray(3),
        seed=jnp.asarray(0, jnp.int32), greedy=jnp.asarray(1, jnp.int32),
        temperature=jnp.asarray(1.0, jnp.float32),
        pe_alpha=jnp.asarray(1.0, jnp.float32),
        s_text=s_text, num_heads=H, vocab=1025,
    )
    tokB, logpB, _, _ = DS.decode_step_fused(toks, lw, ckB, cvB, **args)
    tok1, logp1, _, _ = DS.decode_step_fused(toks[:1], lw, ck1, cv1, **args)
    assert (np.asarray(tokB) == int(tok1[0])).all()
    np.testing.assert_allclose(
        np.asarray(logpB), np.full(B, float(logp1[0])), atol=1e-4
    )
    importlib.reload(DS)
