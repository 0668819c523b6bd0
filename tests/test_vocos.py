"""Vocos vocoder tests: ISTFT exact reconstruction + pipeline shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from vallex_tpu.codec import vocos as VC


def _stft_centered(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Centered STFT with periodic Hann (torch.stft conventions)."""
    win = np.hanning(n_fft + 1)[:-1]
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    T = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[t * hop : t * hop + n_fft] * win for t in range(T)])
    return np.fft.rfft(frames, axis=-1)


def test_istft_perfect_reconstruction():
    """hop = n_fft/4 with Hann satisfies COLA ⇒ istft(stft(x)) == x."""
    rng = np.random.RandomState(0)
    n_fft, hop = VC.N_FFT, VC.HOP
    x = rng.randn(hop * 40).astype(np.float64)
    spec = _stft_centered(x, n_fft, hop)  # [T, F]
    wave = np.asarray(
        VC.istft(jnp.asarray(spec[None]), n_fft, hop, padding="center"),
        np.float64,
    )[0]
    assert wave.shape[0] == (spec.shape[0] - 1) * hop
    # interior must reconstruct exactly (edges lose the reflect padding)
    core = slice(n_fft, wave.shape[0] - n_fft)
    np.testing.assert_allclose(wave[core], x[: wave.shape[0]][core], atol=5e-4)


def test_vocos_decode_shapes():
    params = VC.init_vocos(jax.random.PRNGKey(0))
    T = 30
    codes = np.random.RandomState(1).randint(0, 1024, size=(1, T, 8))
    wave = VC.vocos_decode(params, jnp.asarray(codes), bandwidth_id=2)
    # "same"-padded ISTFT head: T frames → T*hop samples (vocos convention)
    assert wave.shape == (1, T * VC.HOP)
    assert np.isfinite(np.asarray(wave)).all()


def test_codes_to_features_is_codebook_sum():
    params = VC.init_vocos(jax.random.PRNGKey(0))
    codes = np.zeros((1, 4, 8), np.int32)
    codes[0, 0] = [1, 2, 3, 4, 5, 6, 7, 8]
    feats = np.asarray(VC.codes_to_features(params, jnp.asarray(codes)))
    cb = np.asarray(params["codebook_weights"])
    expected = sum(cb[q, codes[0, 0, q]] for q in range(8))
    np.testing.assert_allclose(feats[0, 0], expected, rtol=1e-5)


def test_bandwidth_conditioning_changes_output():
    params = VC.init_vocos(jax.random.PRNGKey(2))
    # make the AdaLN tables differ per bandwidth so conditioning is visible
    params["norm"]["scale"] = (
        np.asarray(params["norm"]["scale"])
        * np.arange(1, 5, dtype=np.float32)[:, None]
    )
    codes = np.random.RandomState(3).randint(0, 1024, size=(1, 12, 8))
    w2 = np.asarray(VC.vocos_decode(params, jnp.asarray(codes), 2))
    w0 = np.asarray(VC.vocos_decode(params, jnp.asarray(codes), 0))
    assert not np.allclose(w2, w0)


def test_bucketed_decode_matches_exact_on_valid_region():
    """Zero-padded code rows are NOT silence (code 0 is a real codebook
    vector): without the t_len feature mask the conv stack's receptive
    field (±27 frames) bled phantom audio back into the tail of the
    valid region. The bucketed/padded decode must now match the
    exact-size decode everywhere."""
    import numpy as np

    params = VC.init_vocos(jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    T = 77  # deliberately far from any bucket boundary
    codes = rng.randint(0, 1024, (1, T, 8))
    exact = np.asarray(VC.vocos_decode(params, jnp.asarray(codes)))
    bucketed = np.asarray(VC.vocos_decode_bucketed(params, codes))
    assert bucketed.shape[1] == T * VC.HOP
    np.testing.assert_allclose(
        bucketed, exact[:, : T * VC.HOP], rtol=0, atol=2e-4
    )


def test_decode_t_len_masks_padding_features():
    import numpy as np

    params = VC.init_vocos(jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    T, pad_to = 50, 96
    codes = rng.randint(0, 1024, (1, pad_to, 8))
    codes[:, T:] = 0  # "padding" that is actually codebook entry 0
    masked = np.asarray(VC.vocos_decode(
        params, jnp.asarray(codes), t_len=jnp.asarray(T)
    ))
    exact = np.asarray(VC.vocos_decode(params, jnp.asarray(codes[:, :T])))
    np.testing.assert_allclose(
        masked[:, : T * VC.HOP], exact, rtol=0, atol=2e-4
    )
    # and WITHOUT the mask the tail genuinely diverges (the bug existed)
    unmasked = np.asarray(VC.vocos_decode(params, jnp.asarray(codes)))
    assert np.abs(unmasked[:, : T * VC.HOP] - exact).max() > 1e-3
