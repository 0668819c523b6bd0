"""Native C++ host runtime: build + parity with the Python fallbacks."""

import numpy as np
import pytest

from vallex_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_native_tokenize_matches_python(lib):
    from vallex_tpu.frontend.symbols import UNK_ID, char_to_id

    samples = [
        "həˈloʊ_ˈwəɹɫd.",
        "ni↓↑xɑʊ↓↑,_tʃʰiŋ↓↑.",
        "konn^itʃiha",
        "with:unknown%chars",
    ]
    for s in samples:
        ours = native.tokenize(s)
        ref = np.asarray([char_to_id.get(c, UNK_ID) for c in s])
        np.testing.assert_array_equal(ours, ref, err_msg=s)


def test_native_wav_roundtrip(lib, tmp_path):
    from vallex_tpu.utils.audio import load_wav, save_wav

    rng = np.random.RandomState(0)
    wav = (rng.randn(24000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, wav)

    out = native.load_wav(p)
    assert out is not None
    got, sr = out
    assert sr == 24000
    ref, _ = load_wav(p, target_sr=24000)
    assert len(got) == len(ref)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_native_resample_vs_scipy(lib):
    from scipy.signal import resample_poly

    t = np.arange(16000, dtype=np.float32) / 16000.0
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    ours = native.resample(wav, 16000, 24000)
    ref = resample_poly(wav, 3, 2).astype(np.float32)
    assert abs(len(ours) - len(ref)) <= 2
    n = min(len(ours), len(ref))
    # interior agreement (different windows → small differences, same signal)
    core = slice(200, n - 200)
    err = np.sqrt(np.mean((ours[core] - ref[core]) ** 2))
    assert err < 0.02, err


def test_native_identity_resample(lib):
    wav = np.random.RandomState(1).randn(1000).astype(np.float32)
    out = native.resample(wav, 24000, 24000)
    np.testing.assert_array_equal(out, wav)
