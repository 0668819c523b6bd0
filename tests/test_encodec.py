"""EnCodec JAX tests: frame rate, shapes, RVQ invariants, causality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vallex_tpu.codec import encodec as EC


@pytest.fixture(scope="module")
def params():
    return EC.init_encodec(jax.random.PRNGKey(0))


def test_frame_rate_and_shapes(params):
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 24000) * 0.1)
    codes = EC.encode(params, wav)
    assert codes.shape == (1, 75, 8)  # 1 s @ 24 kHz → 75 frames × 8 books
    assert codes.dtype == jnp.int32
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 1024).all()
    out = EC.decode(params, codes)
    assert out.shape == (1, 75 * 320)


def test_rvq_nearest_neighbour_correct(params):
    """Stage-0 code must be the true L2 nearest codebook entry."""
    lat = np.random.RandomState(1).randn(1, 20, EC.DIM).astype(np.float32)
    codes = np.asarray(EC.rvq_encode(params, jnp.asarray(lat)))
    cb = np.asarray(params["codebooks"][0])  # [1024, 128]
    for t in range(20):
        d = ((lat[0, t][None] - cb) ** 2).sum(-1)
        assert codes[0, t, 0] == np.argmin(d)


def test_rvq_roundtrip_exact_on_codebook_points(params):
    """Latents that ARE sums of codebook vectors encode/decode exactly."""
    cb = np.asarray(params["codebooks"])
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 1024, size=(1, 5, 8))
    lat = sum(cb[q][idx[..., q]] for q in range(8))
    codes = EC.rvq_encode(params, jnp.asarray(lat))
    dec = np.asarray(EC.rvq_decode(params, codes))
    # greedy RVQ need not recover the exact indices, but the decode error
    # must be no worse than the best single-stage quantization error
    err = np.mean((dec - lat) ** 2)
    base = np.mean(lat**2)
    assert err < base * 0.5


def test_encoder_causality(params):
    """Causal conv stack: changing future samples must not change past codes."""
    rng = np.random.RandomState(3)
    wav = rng.randn(1, 24000).astype(np.float32) * 0.1
    wav2 = wav.copy()
    wav2[:, 16000:] += 1.0  # perturb the tail only
    lat1 = np.asarray(EC.encode_latent(params, jnp.asarray(wav)))
    lat2 = np.asarray(EC.encode_latent(params, jnp.asarray(wav2)))
    # frames well before the perturbation point (16000/320 = frame 50)
    np.testing.assert_allclose(lat1[:, :48], lat2[:, :48], atol=1e-5)
    assert not np.allclose(lat1[:, 51:], lat2[:, 51:], atol=1e-5)
