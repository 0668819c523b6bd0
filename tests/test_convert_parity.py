"""Converter verification against reconstructed torch modules.

The real `encodec` / `vocos` pip packages are absent from this image, so the
state-dict converters could otherwise never be exercised before trained
weights arrive. These tests reconstruct the relevant torch module trees
from the packages' published architectures — exact module names (so state
dicts have the real key layout, confirmed by the reference's
remove_encodec_weight_norm walking shortcut.conv.conv / convtr.convtr,
/root/reference/data/tokenizer.py:33-60), exact padding and ISTFT
conventions — random-init them, run the converters, and assert forward
parity between torch and the JAX ports.

Also ports the weight-norm-removal equivalence property (the one
correctness test the reference ships, data/tokenizer.py:114-127): fusing
weight norm at conversion time must produce identical outputs.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

from vallex_tpu.codec import encodec as EC  # noqa: E402
from vallex_tpu.codec import vocos as VC  # noqa: E402

pytestmark = pytest.mark.slow  # kernel-interpret / torch-parity tier



# ---------------------------------------------------------------------------
# Torch EnCodec 24 kHz reconstruction (facebookresearch/encodec layouts)
# ---------------------------------------------------------------------------

class _NormConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1):
        super().__init__()
        self.conv = weight_norm(
            nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation)
        )

    def forward(self, x):
        return self.conv(x)


class _NormConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.convtr = weight_norm(nn.ConvTranspose1d(cin, cout, k, stride=stride))

    def forward(self, x):
        return self.convtr(x)


class _SConv1d(nn.Module):
    """Causal conv: reflect left-pad of K_eff - stride (encodec SConv1d with
    causal=True, pad_mode='reflect'; input lengths here keep every stage
    stride-divisible so extra right padding is zero)."""

    def __init__(self, cin, cout, k, stride=1, dilation=1):
        super().__init__()
        self.conv = _NormConv1d(cin, cout, k, stride, dilation)
        self.pad = max((k - 1) * dilation + 1 - stride, 0)

    def forward(self, x):
        if self.pad:
            x = F.pad(x, (self.pad, 0), mode="reflect")
        return self.conv(x)


class _SConvTranspose1d(nn.Module):
    """Causal transposed conv: full output then trim K - stride from the
    right (encodec causal mode, trim_right_ratio=1)."""

    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.convtr = _NormConvTranspose1d(cin, cout, k, stride)
        self.trim = k - stride

    def forward(self, x):
        y = self.convtr(x)
        return y[..., : -self.trim] if self.trim > 0 else y


class _SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):  # [B, C, T]
        x = x.permute(2, 0, 1)
        y, _ = self.lstm(x)
        y = y + x  # skip
        return y.permute(1, 2, 0)


class _ResBlock(nn.Module):
    """SEANetResnetBlock: [ELU, conv k3 C→C/2, ELU, conv k1 C/2→C] plus a
    1×1 conv shortcut (the 24 kHz model's true_skip=False)."""

    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.ELU(), _SConv1d(dim, dim // 2, 3), nn.ELU(),
            _SConv1d(dim // 2, dim, 1),
        )
        self.shortcut = _SConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class _Wrap(nn.Module):
    def __init__(self, model):
        super().__init__()
        self.model = model

    def forward(self, x):
        return self.model(x)


def _codebook_tree(n_q=8, size=1024, dim=128, seed=7):
    g = torch.Generator().manual_seed(seed)

    class _Codebook(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("embed", torch.randn(size, dim, generator=g))

    class _VQLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self._codebook = _Codebook()

    class _VQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([_VQLayer() for _ in range(n_q)])

    class _Quantizer(nn.Module):
        def __init__(self):
            super().__init__()
            self.vq = _VQ()

    return _Quantizer()


class TorchEncodec(nn.Module):
    def __init__(self):
        super().__init__()
        enc = [_SConv1d(1, 32, 7)]
        ch = 32
        for r in [2, 4, 5, 8]:  # reversed(RATIOS)
            enc += [_ResBlock(ch), nn.ELU(), _SConv1d(ch, 2 * ch, 2 * r, stride=r)]
            ch *= 2
        enc += [_SLSTM(ch), nn.ELU(), _SConv1d(ch, 128, 7)]
        self.encoder = _Wrap(nn.Sequential(*enc))

        dec = [_SConv1d(128, ch, 7), _SLSTM(ch)]
        for r in [8, 5, 4, 2]:
            dec += [nn.ELU(), _SConvTranspose1d(ch, ch // 2, 2 * r, r),
                    _ResBlock(ch // 2)]
            ch //= 2
        dec += [nn.ELU(), _SConv1d(ch, 1, 7)]
        self.decoder = _Wrap(nn.Sequential(*dec))

        self.quantizer = _codebook_tree()

    def codebooks(self):
        return torch.stack(
            [l._codebook.embed for l in self.quantizer.vq.layers]
        )

    def rvq_encode(self, latents):  # [B, T, D]
        residual = latents
        codes = []
        for cb in self.codebooks():
            d = (residual.pow(2).sum(-1, keepdim=True)
                 - 2 * residual @ cb.T
                 + cb.pow(2).sum(-1))
            idx = d.argmin(-1)
            codes.append(idx)
            residual = residual - cb[idx]
        return torch.stack(codes, -1)

    def encode(self, wav):  # [B, S] → [B, T, 8]
        lat = self.encoder(wav[:, None, :]).transpose(1, 2)
        return self.rvq_encode(lat)

    def decode(self, codes):  # [B, T, 8] → [B, S]
        cbs = self.codebooks()
        lat = sum(cbs[q][codes[..., q]] for q in range(8))
        return self.decoder(lat.transpose(1, 2))[:, 0]


@pytest.fixture(scope="module")
def torch_encodec():
    torch.manual_seed(0)
    m = TorchEncodec().eval()
    # default inits give tiny activations after 4 stages; rescale weights so
    # latents have usable variance and RVQ choices are well-separated
    with torch.no_grad():
        for p in m.parameters():
            p.mul_(1.5)
    return m


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_encodec_converter_forward_parity(torch_encodec):
    """Converted weights reproduce torch outputs: latents, codes, decode."""
    sd = _to_numpy_sd(torch_encodec)
    params = EC.convert_encodec_state_dict(sd)

    rng = np.random.RandomState(1)
    wav = (rng.randn(1, 10 * EC.HOP) * 0.3).astype(np.float32)

    with torch.no_grad():
        t_lat = torch_encodec.encoder(
            torch.from_numpy(wav)[:, None, :]
        ).transpose(1, 2).numpy()
        t_codes = torch_encodec.encode(torch.from_numpy(wav)).numpy()

    j_lat = np.asarray(EC.encode_latent(params, jnp.asarray(wav)))
    assert j_lat.shape == t_lat.shape
    np.testing.assert_allclose(j_lat, t_lat, atol=2e-4, rtol=1e-3)

    j_codes = np.asarray(EC.encode(params, jnp.asarray(wav)))
    # float noise can flip an argmin on a near-tie; demand ≥95% agreement
    agree = (j_codes == t_codes).mean()
    assert agree >= 0.95, f"code agreement {agree:.3f}"

    with torch.no_grad():
        t_wave = torch_encodec.decode(torch.from_numpy(t_codes)).numpy()
    j_wave = np.asarray(EC.decode(params, jnp.asarray(t_codes)))
    assert j_wave.shape == t_wave.shape
    np.testing.assert_allclose(j_wave, t_wave, atol=5e-4, rtol=1e-3)


def test_encodec_weight_norm_fusion_equivalence(torch_encodec):
    """Port of the reference's only correctness test (tokenizer.py:114-127):
    converting from a weight-normed state dict and from one with the norm
    removed must yield identical params and codes."""
    from torch.nn.utils import remove_weight_norm

    sd_wn = _to_numpy_sd(torch_encodec)

    import copy

    plain = copy.deepcopy(torch_encodec)
    for mod in plain.modules():
        if isinstance(mod, (nn.Conv1d, nn.ConvTranspose1d)):
            try:
                remove_weight_norm(mod)
            except ValueError:
                pass
    sd_plain = _to_numpy_sd(plain)
    assert not any(k.endswith("weight_g") for k in sd_plain)

    p_wn = EC.convert_encodec_state_dict(sd_wn)
    p_plain = EC.convert_encodec_state_dict(sd_plain)

    import jax

    leaves_wn = jax.tree.leaves(p_wn)
    leaves_plain = jax.tree.leaves(p_plain)
    for a, b in zip(leaves_wn, leaves_plain):
        np.testing.assert_allclose(a, b, atol=1e-6)

    rng = np.random.RandomState(2)
    wav = (rng.randn(1, 6 * EC.HOP) * 0.3).astype(np.float32)
    c1 = np.asarray(EC.encode(p_wn, jnp.asarray(wav)))
    c2 = np.asarray(EC.encode(p_plain, jnp.asarray(wav)))
    np.testing.assert_array_equal(c1, c2)


# ---------------------------------------------------------------------------
# Torch Vocos reconstruction (charactr/vocos layouts)
# ---------------------------------------------------------------------------

class _AdaLayerNorm(nn.Module):
    def __init__(self, num_emb, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.dim = dim
        self.scale = nn.Embedding(num_emb, dim)
        self.shift = nn.Embedding(num_emb, dim)

    def forward(self, x, cond_id):  # x [B, T, C]
        scale = self.scale(cond_id)
        shift = self.shift(cond_id)
        x = F.layer_norm(x, (self.dim,), eps=self.eps)
        return x * scale + shift


class _ConvNeXtBlock(nn.Module):
    def __init__(self, dim, inter, num_bw):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = _AdaLayerNorm(num_bw, dim)
        self.pwconv1 = nn.Linear(dim, inter)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(inter, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x, cond_id):  # x [B, C, T]
        res = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x, cond_id)
        x = self.pwconv2(self.act(self.pwconv1(x)))
        x = (self.gamma * x).transpose(1, 2)
        return res + x


class _VocosBackbone(nn.Module):
    def __init__(self, in_ch=128, dim=512, inter=1536, n_blocks=8, num_bw=4):
        super().__init__()
        self.embed = nn.Conv1d(in_ch, dim, 7, padding=3)
        self.norm = _AdaLayerNorm(num_bw, dim)
        self.convnext = nn.ModuleList(
            [_ConvNeXtBlock(dim, inter, num_bw) for _ in range(n_blocks)]
        )
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, cond_id):  # x [B, 128, T] → [B, T, 512]
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2), cond_id).transpose(1, 2)
        for blk in self.convnext:
            x = blk(x, cond_id)
        return self.final_layer_norm(x.transpose(1, 2))


def _torch_istft_same(spec, n_fft, hop):
    """vocos ISTFT with padding='same': fold-based overlap-add, trim
    (n_fft - hop)//2 per side, window-envelope normalized."""
    window = torch.hann_window(n_fft)
    B, Fb, T = spec.shape
    ifft = torch.fft.irfft(spec, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    out_size = (T - 1) * hop + n_fft
    y = F.fold(
        ifft, output_size=(1, out_size), kernel_size=(1, n_fft), stride=(1, hop)
    )[:, 0, 0]
    win_sq = window.square().expand(1, T, -1).transpose(1, 2)
    env = F.fold(
        win_sq, output_size=(1, out_size), kernel_size=(1, n_fft), stride=(1, hop)
    )[0, 0, 0]
    pad = (n_fft - hop) // 2
    return y[:, pad:-pad] / env[pad:-pad]


class _ISTFTHead(nn.Module):
    def __init__(self, dim, n_fft, hop):
        super().__init__()
        self.out = nn.Linear(dim, n_fft + 2)
        self.n_fft, self.hop = n_fft, hop

    def forward(self, x):  # [B, T, 512]
        x = self.out(x).transpose(1, 2)
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag).clip(max=1e2)
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))
        return _torch_istft_same(spec, self.n_fft, self.hop)


class _FeatureExtractor(nn.Module):
    """Only the quantizer codebooks matter for codes→features."""

    def __init__(self):
        super().__init__()

        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.quantizer = _codebook_tree(seed=11)

        self.encodec = _Enc()


class TorchVocos(nn.Module):
    def __init__(self):
        super().__init__()
        self.feature_extractor = _FeatureExtractor()
        self.backbone = _VocosBackbone()
        self.head = _ISTFTHead(512, VC.N_FFT, VC.HOP)

    def codebooks(self):
        return torch.stack(
            [
                l._codebook.embed
                for l in self.feature_extractor.encodec.quantizer.vq.layers
            ]
        )

    def decode(self, codes, bandwidth_id):  # [B, T, 8]
        cbs = self.codebooks()
        feats = sum(cbs[q][codes[..., q]] for q in range(8))  # [B, T, 128]
        x = self.backbone(feats.transpose(1, 2), bandwidth_id)
        return self.head(x)


def test_vocos_converter_forward_parity():
    torch.manual_seed(3)
    model = TorchVocos().eval()
    # randomize AdaLN tables (ship with trained values; Embedding default
    # init is fine) and give gamma non-degenerate magnitudes
    with torch.no_grad():
        for blk in model.backbone.convnext:
            blk.gamma.copy_(torch.randn_like(blk.gamma) * 0.1)

    sd = _to_numpy_sd(model)
    params = VC.convert_vocos_state_dict(sd)

    codes = np.random.RandomState(5).randint(0, 1024, (1, 12, 8))
    bw = 2
    with torch.no_grad():
        t_wave = model.decode(
            torch.from_numpy(codes), torch.tensor(bw)
        ).numpy()
    j_wave = np.asarray(VC.vocos_decode(params, jnp.asarray(codes), bw))

    assert j_wave.shape == t_wave.shape == (1, 12 * VC.HOP)
    np.testing.assert_allclose(j_wave, t_wave, atol=2e-3, rtol=1e-3)

    # bandwidth conditioning must select different AdaLN rows
    with torch.no_grad():
        t_wave0 = model.decode(torch.from_numpy(codes), torch.tensor(0)).numpy()
    j_wave0 = np.asarray(VC.vocos_decode(params, jnp.asarray(codes), 0))
    np.testing.assert_allclose(j_wave0, t_wave0, atol=2e-3, rtol=1e-3)
    assert not np.allclose(t_wave, t_wave0)
