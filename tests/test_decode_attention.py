"""Pallas decode-attention kernel vs reference jnp attention (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vallex_tpu.ops import decode_attention as DA

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier



def _reference(q, new_k, new_v, cache_k, cache_v, x_len, pos, s_text):
    """Plain masked softmax attention over cache ∪ own kv."""
    B, H, C, hd = cache_k.shape
    slot = s_text + pos
    cache_k = cache_k.copy()
    cache_v = cache_v.copy()
    cache_k[:, :, slot] = new_k
    cache_v[:, :, slot] = new_v
    cols = np.arange(C)
    ok = (cols < x_len) | ((cols >= s_text) & (cols <= slot))
    scores = np.einsum("bhd,bhcd->bhc", q, cache_k) / np.sqrt(hd)
    scores = np.where(ok[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhc,bhcd->bhd", p, cache_v)
    return out, cache_k, cache_v


@pytest.mark.parametrize("x_len,pos", [(5, 0), (100, 3), (128, 130), (77, 255)])
def test_kernel_matches_reference(x_len, pos, monkeypatch):
    # interpret mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    # reload module so the patched pallas_call is used
    import importlib

    importlib.reload(DA)

    rng = np.random.RandomState(0)
    B, H, C, hd = 2, 4, 512, 64
    s_text = 128
    q = rng.randn(B, H, hd).astype(np.float32)
    nk = rng.randn(B, H, hd).astype(np.float32)
    nv = rng.randn(B, H, hd).astype(np.float32)
    ck = rng.randn(B, H, C, hd).astype(np.float32)
    cv = rng.randn(B, H, C, hd).astype(np.float32)

    ck_packed = DA.pack_cache(jnp.asarray(ck))
    cv_packed = DA.pack_cache(jnp.asarray(cv))
    out, ck2, cv2 = DA.decode_attention(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv),
        ck_packed, cv_packed,
        jnp.asarray(x_len), jnp.asarray(pos), s_text=s_text,
    )
    ref_out, ref_ck, ref_cv = _reference(q, nk, nv, ck, cv, x_len, pos, s_text)

    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ck2), DA.pack_cache(jnp.asarray(ref_ck)), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(cv2), DA.pack_cache(jnp.asarray(ref_cv)), atol=0
    )

    importlib.reload(DA)  # restore un-patched module for other tests
