"""End-to-end pretrained-weight-port round trips (VERDICT r1 item 2).

Builds TINY torch models whose state-dict layouts exactly mirror the upstream
checkpoints the reference consumes (Vocos `charactr/vocos-*-24khz`, Meta
Encodec 24 kHz SEANet, transformers HuBERT — reference call sites
voicebox_pytorch.py:497,508,551-592,1384-1389), torch-saves them, runs the
full-model loaders in `voicebox_tpu.utils.port_weights`, and asserts
torch-vs-flax forward parity. This exercises the risky parts of porting:
conv/linear layout transposes, ConvTranspose flip conventions, weight-norm
fusing, LSTM gate splitting/bias folding, and the state-dict name maps.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

ATOL = 1e-4


def _np(x):
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# Vocos (mel + encodec variants)
# ---------------------------------------------------------------------------


class _TConvNeXtBlock(tnn.Module):
    def __init__(self, dim, inter, num_bw=0):
        super().__init__()
        self.dwconv = tnn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        if num_bw > 0:
            self.norm = _TAdaLayerNorm(dim, num_bw)
        else:
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, inter)
        self.pwconv2 = tnn.Linear(inter, dim)
        self.gamma = tnn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, x, bw=None):  # x: (b, dim, n)
        res = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x, bw) if isinstance(self.norm, _TAdaLayerNorm) else self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = self.gamma * x
        return res + x.transpose(1, 2)


class _TAdaLayerNorm(tnn.Module):
    """Upstream encodec-variant conditioning: scale/shift embedding tables."""

    def __init__(self, dim, num_bw):
        super().__init__()
        self.scale = tnn.Embedding(num_bw, dim)
        self.shift = tnn.Embedding(num_bw, dim)
        tnn.init.normal_(self.scale.weight, std=0.1)
        tnn.init.normal_(self.shift.weight, std=0.1)
        self.dim = dim

    def forward(self, x, bw):  # x: (b, n, dim)
        s, t = self.scale(bw), self.shift(bw)
        x = F.layer_norm(x, (self.dim,), eps=1e-6)
        return x * s[:, None, :] + t[:, None, :]


class _TVocosBackbone(tnn.Module):
    def __init__(self, cin, dim, inter, layers, num_bw=0):
        super().__init__()
        self.embed = tnn.Conv1d(cin, dim, 7, padding=3)
        self.norm = _TAdaLayerNorm(dim, num_bw) if num_bw > 0 else tnn.LayerNorm(dim, eps=1e-6)
        self.convnext = tnn.ModuleList(
            [_TConvNeXtBlock(dim, inter, num_bw) for _ in range(layers)]
        )
        self.final_layer_norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, bw=None):  # x: (b, cin, n) -> (b, n, dim)
        x = self.embed(x)
        h = x.transpose(1, 2)
        h = self.norm(h, bw) if isinstance(self.norm, _TAdaLayerNorm) else self.norm(h)
        x = h.transpose(1, 2)
        for blk in self.convnext:
            x = blk(x, bw)
        return self.final_layer_norm(x.transpose(1, 2))


class _THead(tnn.Module):
    def __init__(self, dim, n_fft):
        super().__init__()
        self.out = tnn.Linear(dim, n_fft + 2)


class _TVocos(tnn.Module):
    def __init__(self, cin, dim, inter, layers, n_fft, num_bw=0):
        super().__init__()
        self.backbone = _TVocosBackbone(cin, dim, inter, layers, num_bw)
        self.head = _THead(dim, n_fft)


class TestVocosRoundtrip:
    def test_mel_variant(self, tmp_path):
        from voicebox_tpu.models.vocos import Vocos

        cin, dim, inter, layers, n_fft, hop = 6, 16, 24, 2, 16, 4
        torch.manual_seed(0)
        tm = _TVocos(cin, dim, inter, layers, n_fft).eval()
        path = str(tmp_path / "vocos.pt")
        torch.save(tm.state_dict(), path)

        model = Vocos(input_channels=cin, dim=dim, intermediate_dim=inter,
                      num_layers=layers, n_fft=n_fft, hop_length=hop)
        from voicebox_tpu.utils.port_weights import load_vocos_torch

        model.params = load_vocos_torch(path, model.params)

        rs = np.random.RandomState(0)
        feats = rs.randn(2, cin, 12).astype(np.float32)  # (b, c, n)

        with torch.no_grad():
            ht = tm.backbone(torch.from_numpy(feats))  # (b, n, dim)
            spec_lin = tm.head.out(ht)

        hj = model.backbone.apply(
            {"params": model.params["backbone"]},
            jnp.asarray(feats).transpose(0, 2, 1),
        )
        np.testing.assert_allclose(_np(hj), ht.numpy(), atol=ATOL)

        out_p = model.params["head"]["out"]
        lin_j = hj @ out_p["kernel"] + out_p["bias"]
        np.testing.assert_allclose(_np(lin_j), spec_lin.numpy(), atol=ATOL)

        # the full ported decode (through our iSTFT) stays finite and spans
        # frames * hop samples (vocos 'same'-padded head contract)
        wav = model.decode(jnp.asarray(feats))
        assert wav.shape == (2, 12 * hop)
        assert np.isfinite(_np(wav)).all()

    def test_encodec_variant_adalayernorm_and_codebook(self, tmp_path):
        from voicebox_tpu.models.vocos import Vocos

        cin, dim, inter, layers, n_fft, hop = 8, 16, 24, 2, 16, 4
        q, size, num_bw = 2, 5, 4
        torch.manual_seed(1)
        tm = _TVocos(cin, dim, inter, layers, n_fft, num_bw=num_bw).eval()
        sd = tm.state_dict()
        cw = torch.randn(q * size, cin)
        sd["feature_extractor.codebook_weights"] = cw
        path = str(tmp_path / "vocos_enc.pt")
        torch.save(sd, path)

        model = Vocos(input_channels=cin, dim=dim, intermediate_dim=inter,
                      num_layers=layers, n_fft=n_fft, hop_length=hop,
                      num_bandwidths=num_bw, num_quantizers=q, codebook_size=size)
        from voicebox_tpu.utils.port_weights import load_vocos_torch

        model.params = load_vocos_torch(path, model.params)

        rs = np.random.RandomState(1)
        feats = rs.randn(2, cin, 10).astype(np.float32)
        bw = np.array([2, 1])

        with torch.no_grad():
            ht = tm.backbone(torch.from_numpy(feats), torch.from_numpy(bw))

        hj = model.backbone.apply(
            {"params": model.params["backbone"]},
            jnp.asarray(feats).transpose(0, 2, 1),
            jnp.asarray(bw),
        )
        np.testing.assert_allclose(_np(hj), ht.numpy(), atol=ATOL)

        # codes_to_features == sum of per-quantizer embedding rows
        codes = rs.randint(0, size, (2, q, 7))
        fj = model.codes_to_features(jnp.asarray(codes))  # (b, cin, n)
        expected = (
            cw.reshape(q, size, cin).numpy()[np.arange(q)[:, None, None],
                                             codes.transpose(1, 0, 2)]
            .sum(axis=0)
            .transpose(0, 2, 1)
        )
        np.testing.assert_allclose(_np(fj), expected, atol=ATOL)


# ---------------------------------------------------------------------------
# Encodec (SEANet + weight norm + LSTM + RVQ)
# ---------------------------------------------------------------------------


def _wn(mod):
    return tnn.utils.weight_norm(mod)


class _TNormConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = _wn(tnn.Conv1d(cin, cout, k, stride=stride))


class _TSConv(tnn.Module):
    """Upstream SConv1d: causal left pad (k - stride), then weight-normed conv
    (key path `<name>.conv.conv.weight_g/v`)."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = _TNormConv(cin, cout, k, stride)
        self.pad = k - stride

    def forward(self, x):
        return self.conv.conv(F.pad(x, (self.pad, 0)))


class _TNormConvTr(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.convtr = _wn(tnn.ConvTranspose1d(cin, cout, k, stride=stride))


class _TSConvTr(tnn.Module):
    """Upstream SConvTranspose1d: transposed conv, right-trim (k - stride)."""

    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.convtr = _TNormConvTr(cin, cout, k, stride)
        self.trim = k - stride

    def forward(self, x):
        y = self.convtr.convtr(x)
        return y[..., : -self.trim] if self.trim > 0 else y


class _TRes(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.ELU(), _TSConv(dim, dim // 2, 3), tnn.ELU(), _TSConv(dim // 2, dim, 1)
        )

    def forward(self, x):
        return x + self.block(x)


class _TSLSTM(tnn.Module):
    """Upstream SLSTM: 2-layer LSTM over time with a residual skip."""

    def __init__(self, c):
        super().__init__()
        self.lstm = tnn.LSTM(c, c, 2)

    def forward(self, x):  # (b, c, n)
        y = x.permute(2, 0, 1)
        y, _ = self.lstm(y)
        return y.permute(1, 2, 0) + x


class _TSEANetEncoder(tnn.Module):
    def __init__(self, f, dim, ratios):
        super().__init__()
        mods = [_TSConv(1, f, 7)]
        mult = 1
        for r in reversed(ratios):
            mods += [
                _TRes(mult * f),
                tnn.ELU(),
                _TSConv(mult * f, mult * 2 * f, 2 * r, r),
            ]
            mult *= 2
        mods += [_TSLSTM(mult * f), tnn.ELU(), _TSConv(mult * f, dim, 7)]
        self.model = tnn.Sequential(*mods)

    def forward(self, x):
        return self.model(x)


class _TSEANetDecoder(tnn.Module):
    def __init__(self, f, dim, ratios):
        super().__init__()
        mult = 2 ** len(ratios)
        mods = [_TSConv(dim, mult * f, 7), _TSLSTM(mult * f)]
        for r in ratios:
            mods += [
                tnn.ELU(),
                _TSConvTr(mult * f, mult * f // 2, 2 * r, r),
                _TRes(mult * f // 2),
            ]
            mult //= 2
        mods += [tnn.ELU(), _TSConv(f, 1, 7)]
        self.model = tnn.Sequential(*mods)

    def forward(self, x):
        return self.model(x)


class _TEncodec(tnn.Module):
    def __init__(self, f, dim, ratios, q, size):
        super().__init__()
        self.encoder = _TSEANetEncoder(f, dim, ratios)
        self.decoder = _TSEANetDecoder(f, dim, ratios)
        # quantizer.vq.layers.{i}._codebook.embed buffers
        self.codebooks = torch.randn(q, size, dim)

    def state_dict_with_codebooks(self):
        sd = self.state_dict()
        for i in range(self.codebooks.shape[0]):
            sd[f"quantizer.vq.layers.{i}._codebook.embed"] = self.codebooks[i]
        return sd

    def rvq(self, x):  # x: (b, n, dim) -> (quantized, codes)
        residual = x
        quantized = torch.zeros_like(x)
        codes = []
        for cb in self.codebooks:
            d = (residual[..., None, :] - cb[None, None]).pow(2).sum(-1)
            idx = d.argmin(-1)
            qv = cb[idx]
            residual = residual - qv
            quantized = quantized + qv
            codes.append(idx)
        return quantized, torch.stack(codes, dim=-1)


class TestEncodecRoundtrip:
    def test_full_roundtrip(self, tmp_path):
        from voicebox_tpu.models.encodec import EncodecModel
        from voicebox_tpu.utils.port_weights import load_encodec_torch

        f, dim, ratios, q, size = 4, 8, (2, 2, 2, 2), 2, 11
        torch.manual_seed(2)
        tm = _TEncodec(f, dim, ratios, q, size).eval()
        path = str(tmp_path / "encodec.pt")
        torch.save(tm.state_dict_with_codebooks(), path)

        model = EncodecModel(dim=dim, n_filters=f, ratios=ratios,
                             num_quantizers=q, codebook_size=size)
        model.params = load_encodec_torch(path, model.params, ratios=ratios)

        rs = np.random.RandomState(2)
        audio = rs.randn(2, 64).astype(np.float32) * 0.3

        with torch.no_grad():
            lat_t = tm.encoder(torch.from_numpy(audio)[:, None, :])  # (b, dim, n)
            lat_t = lat_t.transpose(1, 2)  # (b, n, dim)
            q_t, codes_t = tm.rvq(lat_t)
            dec_t = tm.decoder(q_t.transpose(1, 2))[:, 0, :]

        lat_j = model.encode(jnp.asarray(audio))
        np.testing.assert_allclose(_np(lat_j), lat_t.numpy(), atol=ATOL)

        q_j, codes_j, _ = model.rq(lat_j)
        np.testing.assert_array_equal(_np(codes_j), codes_t.numpy())
        np.testing.assert_allclose(_np(q_j), q_t.numpy(), atol=ATOL)

        dec_j = model._decode(model.params, q_j)
        np.testing.assert_allclose(_np(dec_j), dec_t.numpy(), atol=ATOL)

        # decode_codes path (the fused serving program) agrees too
        dec_codes = model.decode_codes(codes_j)
        np.testing.assert_allclose(_np(dec_codes), dec_t.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# HuBERT feature extractor + projection
# ---------------------------------------------------------------------------


class _THubertConvLayer(tnn.Module):
    def __init__(self, cin, cout, k, s, group_norm=False):
        super().__init__()
        self.conv = tnn.Conv1d(cin, cout, k, stride=s, bias=False)
        if group_norm:
            self.layer_norm = tnn.GroupNorm(cout, cout)
            tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)
            tnn.init.normal_(self.layer_norm.bias, std=0.1)


class _THubert(tnn.Module):
    """transformers-style key layout: feature_extractor.conv_layers.{i}.conv,
    layer-0 group norm, feature_projection.projection."""

    def __init__(self, c, dim, kernels, strides):
        super().__init__()

        class FE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_layers = tnn.ModuleList(
                    [
                        _THubertConvLayer(1 if i == 0 else c, c, k, s, group_norm=(i == 0))
                        for i, (k, s) in enumerate(zip(kernels, strides))
                    ]
                )

        class FP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.projection = tnn.Linear(c, dim)

        self.feature_extractor = FE()
        self.feature_projection = FP()

    def forward(self, wav):  # (b, n) -> (b, frames, dim)
        x = wav[:, None, :]
        for i, layer in enumerate(self.feature_extractor.conv_layers):
            x = layer.conv(x)
            if i == 0:
                x = layer.layer_norm(x)
            x = F.gelu(x)
        return self.feature_projection.projection(x.transpose(1, 2))


class TestHubertRoundtrip:
    def test_extractor_and_projection(self, tmp_path):
        from voicebox_tpu.models.hubert import HubertFeatureExtractor
        from voicebox_tpu.utils.port_weights import load_hubert_torch

        c, dim = 8, 16
        kernels = (10, 3, 3, 3, 3, 2, 2)
        strides = (5, 2, 2, 2, 2, 2, 2)
        torch.manual_seed(3)
        tm = _THubert(c, dim, kernels, strides).eval()
        path = str(tmp_path / "hubert.pt")
        torch.save(tm.state_dict(), path)

        fe = HubertFeatureExtractor(conv_dim=c)
        rs = np.random.RandomState(3)
        wav = rs.randn(2, 1280).astype(np.float32)
        template = {
            "feature_extractor": fe.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"],
            "proj": {"kernel": jnp.zeros((c, dim)), "bias": jnp.zeros((dim,))},
        }
        ported = load_hubert_torch(path, template)

        with torch.no_grad():
            out_t = tm(torch.from_numpy(wav))

        feats = fe.apply({"params": ported["feature_extractor"]}, jnp.asarray(wav))
        out_j = feats @ ported["proj"]["kernel"] + ported["proj"]["bias"]
        np.testing.assert_allclose(_np(out_j), out_t.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# HuBERT FULL model (VERDICT r2 missing-item 1): extractor + projection
# (LayerNorm + Linear) + weight-normed pos conv + post-norm encoder blocks,
# transformers Wav2Vec2/HubertModel state-dict layout
# ---------------------------------------------------------------------------


class _TW2VEncoderLayer(tnn.Module):
    """transformers Wav2Vec2EncoderLayer (post-norm, base config)."""

    def __init__(self, dim, heads, ff):
        super().__init__()
        self.heads = heads

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.q_proj = tnn.Linear(dim, dim)
                self.k_proj = tnn.Linear(dim, dim)
                self.v_proj = tnn.Linear(dim, dim)
                self.out_proj = tnn.Linear(dim, dim)

        class FF(tnn.Module):
            def __init__(self):
                super().__init__()
                self.intermediate_dense = tnn.Linear(dim, ff)
                self.output_dense = tnn.Linear(ff, dim)

        self.attention = Attn()
        self.layer_norm = tnn.LayerNorm(dim)
        self.feed_forward = FF()
        self.final_layer_norm = tnn.LayerNorm(dim)
        for ln in (self.layer_norm, self.final_layer_norm):
            tnn.init.normal_(ln.weight, mean=1.0, std=0.1)
            tnn.init.normal_(ln.bias, std=0.1)

    def forward(self, x):
        b, n, d = x.shape
        h, hd = self.heads, d // self.heads
        q = (self.attention.q_proj(x) * hd ** -0.5).view(b, n, h, hd).transpose(1, 2)
        k = self.attention.k_proj(x).view(b, n, h, hd).transpose(1, 2)
        v = self.attention.v_proj(x).view(b, n, h, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        x = x + self.attention.out_proj(attn.transpose(1, 2).reshape(b, n, d))
        x = self.layer_norm(x)
        x = x + self.feed_forward.output_dense(
            F.gelu(self.feed_forward.intermediate_dense(x))
        )
        return self.final_layer_norm(x)


class _TW2VFull(tnn.Module):
    """Tiny transformers-layout HuBERT: feature_extractor + feature_projection
    (layer_norm + projection) + encoder (pos_conv_embed weight-norm dim=2,
    layer_norm, post-norm layers)."""

    def __init__(self, c, dim, heads, ff, depth, kernels, strides,
                 pos_kernel, pos_groups):
        super().__init__()

        class FE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_layers = tnn.ModuleList(
                    [
                        _THubertConvLayer(1 if i == 0 else c, c, k, s,
                                          group_norm=(i == 0))
                        for i, (k, s) in enumerate(zip(kernels, strides))
                    ]
                )

        class FP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.layer_norm = tnn.LayerNorm(c)
                self.projection = tnn.Linear(c, dim)
                tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)
                tnn.init.normal_(self.layer_norm.bias, std=0.1)

        class PosConv(tnn.Module):
            def __init__(self):
                super().__init__()
                conv = tnn.Conv1d(dim, dim, pos_kernel,
                                  padding=pos_kernel // 2, groups=pos_groups)
                self.conv = tnn.utils.weight_norm(conv, name="weight", dim=2)
                self.k = pos_kernel

            def forward(self, x):  # (b, n, d)
                x = self.conv(x.transpose(1, 2))
                if self.k % 2 == 0:
                    x = x[:, :, :-1]
                return F.gelu(x).transpose(1, 2)

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.pos_conv_embed = PosConv()
                self.layer_norm = tnn.LayerNorm(dim)
                self.layers = tnn.ModuleList(
                    [_TW2VEncoderLayer(dim, heads, ff) for _ in range(depth)]
                )
                tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)

            def forward(self, x):
                x = x + self.pos_conv_embed(x)
                x = self.layer_norm(x)
                for layer in self.layers:
                    x = layer(x)
                return x

        self.feature_extractor = FE()
        self.feature_projection = FP()
        self.encoder = Enc()

    def forward(self, wav):
        x = wav[:, None, :]
        for i, layer in enumerate(self.feature_extractor.conv_layers):
            x = layer.conv(x)
            if i == 0:
                x = layer.layer_norm(x)
            x = F.gelu(x)
        x = x.transpose(1, 2)
        x = self.feature_projection.projection(self.feature_projection.layer_norm(x))
        return self.encoder(x)


class TestHubertFullRoundtrip:
    C, DIM, HEADS, FF, DEPTH = 8, 16, 4, 40, 3
    KERNELS = (10, 3, 3, 3, 3, 2, 2)
    STRIDES = (5, 2, 2, 2, 2, 2, 2)
    POS_KERNEL, POS_GROUPS = 16, 4

    def _build(self, tmp_path, output_layer=None, rewrite_sd=None):
        from voicebox_tpu.models.hubert import HubertWithKmeans

        torch.manual_seed(11)
        tm = _TW2VFull(self.C, self.DIM, self.HEADS, self.FF, self.DEPTH,
                       self.KERNELS, self.STRIDES, self.POS_KERNEL,
                       self.POS_GROUPS).eval()
        sd = tm.state_dict()
        if rewrite_sd is not None:
            sd = rewrite_sd(sd)
        path = str(tmp_path / "hubert_full.pt")
        torch.save(sd, path)

        w2v = HubertWithKmeans(
            num_clusters=7, dim=self.DIM,
            depth=self.DEPTH, heads=self.HEADS, ff_dim=self.FF,
            conv_pos_kernel=self.POS_KERNEL, conv_pos_groups=self.POS_GROUPS,
            output_layer=output_layer,
        )
        # conv_dim must match the tiny torch extractor width
        from voicebox_tpu.models.hubert import HubertFeatureExtractor

        w2v.feature_extractor = HubertFeatureExtractor(conv_dim=self.C)
        # template proj/proj_norm shapes were built at conv_dim=512; rebuild
        # tiny then re-port
        import jax.numpy as _jnp

        w2v.params["feature_extractor"] = w2v.feature_extractor.init(
            jax.random.PRNGKey(0), _jnp.zeros((1, 1280))
        )["params"]
        w2v.params["proj_norm"] = {"scale": _jnp.ones((self.C,)),
                                   "bias": _jnp.zeros((self.C,))}
        w2v.params["proj"] = {"kernel": _jnp.zeros((self.C, self.DIM)),
                              "bias": _jnp.zeros((self.DIM,))}
        from voicebox_tpu.utils.port_weights import load_hubert_torch

        w2v.params = load_hubert_torch(path, w2v.params)
        return tm, w2v

    def test_full_forward_parity(self, tmp_path):
        tm, w2v = self._build(tmp_path)
        rs = np.random.RandomState(7)
        wav = (rs.randn(2, 3200) * 0.1).astype(np.float32)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(wav))
        out_j = w2v.features(jnp.asarray(wav))
        assert out_j.shape == tuple(out_t.shape)
        np.testing.assert_allclose(_np(out_j), out_t.numpy(), atol=ATOL)

    def test_output_layer_truncation(self, tmp_path):
        """output_layer=k == fairseq extract_features(output_layer=k):
        features come from AFTER block k, ignoring later blocks."""
        tm, w2v = self._build(tmp_path, output_layer=2)
        rs = np.random.RandomState(8)
        wav = (rs.randn(1, 3200) * 0.1).astype(np.float32)
        with torch.no_grad():
            x = tm.feature_projection.projection(
                tm.feature_projection.layer_norm(
                    self._extract(tm, torch.from_numpy(wav))
                )
            )
            x = x + tm.encoder.pos_conv_embed(x)
            x = tm.encoder.layer_norm(x)
            for layer in tm.encoder.layers[:2]:
                x = layer(x)
        out_j = w2v.features(jnp.asarray(wav))
        np.testing.assert_allclose(_np(out_j), x.numpy(), atol=ATOL)

    @staticmethod
    def _extract(tm, wav):
        x = wav[:, None, :]
        for i, layer in enumerate(tm.feature_extractor.conv_layers):
            x = layer.conv(x)
            if i == 0:
                x = layer.layer_norm(x)
            x = F.gelu(x)
        return x.transpose(1, 2)

    def test_fairseq_naming(self, tmp_path):
        """The same tensors under fairseq HubertModel key names port too."""

        def to_fairseq(sd):
            out = {}
            for k, v in sd.items():
                k = k.replace("feature_projection.layer_norm", "layer_norm")
                k = k.replace("feature_projection.projection",
                              "post_extract_proj")
                k = k.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
                k = k.replace(".attention.", ".self_attn.")
                # post-attn LN: transformers `.layer_norm` (inside a layer) ->
                # fairseq `.self_attn_layer_norm`
                if ".layers." in k and k.rsplit(".", 2)[-2] == "layer_norm":
                    k = k.replace(".layer_norm.", ".self_attn_layer_norm.")
                k = k.replace(".feed_forward.intermediate_dense", ".fc1")
                k = k.replace(".feed_forward.output_dense", ".fc2")
                # fairseq extractor: conv_layers.{i}.0 (conv) / .0.2 (group norm)
                k = k.replace(".conv.weight_g", ".weight_g").replace(
                    ".conv.weight_v", ".weight_v")
                if "conv_layers" in k:
                    k = k.replace(".conv.weight", ".0.weight")
                    k = k.replace(".layer_norm.", ".2.")
                out[k] = v
            return out

        tm, w2v = self._build(tmp_path, rewrite_sd=to_fairseq)
        rs = np.random.RandomState(9)
        wav = (rs.randn(1, 3200) * 0.1).astype(np.float32)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(wav))
        np.testing.assert_allclose(_np(w2v.features(jnp.asarray(wav))),
                                   out_t.numpy(), atol=ATOL)

    def test_partial_checkpoint_refused(self, tmp_path):
        """An encoder-less checkpoint must raise, not silently half-port."""
        from voicebox_tpu.models.hubert import HubertWithKmeans
        from voicebox_tpu.utils.port_weights import load_hubert_torch

        torch.manual_seed(3)
        tm = _THubert(self.C, self.DIM, self.KERNELS, self.STRIDES).eval()
        path = str(tmp_path / "hubert_partial.pt")
        torch.save(tm.state_dict(), path)

        w2v = HubertWithKmeans(num_clusters=7, dim=self.DIM, depth=2,
                               heads=self.HEADS)
        with pytest.raises(AssertionError, match="refusing a partial port"):
            load_hubert_torch(path, w2v.params)


# ---------------------------------------------------------------------------
# HuBERT/wav2vec2 LARGE layout: stable layer norm (pre-norm blocks + end LN)
# + per-conv-layer LayerNorm extractor with conv biases
# ---------------------------------------------------------------------------


class _TW2VStableLayer(_TW2VEncoderLayer):
    def forward(self, x):
        b, n, d = x.shape
        h, hd = self.heads, d // self.heads
        res = x
        x = self.layer_norm(x)
        q = (self.attention.q_proj(x) * hd ** -0.5).view(b, n, h, hd).transpose(1, 2)
        k = self.attention.k_proj(x).view(b, n, h, hd).transpose(1, 2)
        v = self.attention.v_proj(x).view(b, n, h, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        x = res + self.attention.out_proj(attn.transpose(1, 2).reshape(b, n, d))
        return x + self.feed_forward.output_dense(
            F.gelu(self.feed_forward.intermediate_dense(self.final_layer_norm(x)))
        )


class _TW2VLarge(tnn.Module):
    """transformers Wav2Vec2ForPreTraining large layout: layer-mode extractor
    (biased convs + per-layer LN) + StableLayerNorm encoder (pre-norm blocks,
    end LayerNorm)."""

    def __init__(self, c, dim, heads, ff, depth, kernels, strides,
                 pos_kernel, pos_groups):
        super().__init__()

        class ConvLayer(tnn.Module):
            def __init__(self, cin):
                super().__init__()
                self.conv = None  # set below (needs k, s)
                self.layer_norm = tnn.LayerNorm(c)
                tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)
                tnn.init.normal_(self.layer_norm.bias, std=0.1)

        class FE(tnn.Module):
            def __init__(self):
                super().__init__()
                layers = []
                for i, (k, s) in enumerate(zip(kernels, strides)):
                    layer = ConvLayer(1 if i == 0 else c)
                    layer.conv = tnn.Conv1d(1 if i == 0 else c, c, k,
                                            stride=s, bias=True)
                    layers.append(layer)
                self.conv_layers = tnn.ModuleList(layers)

        class FP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.layer_norm = tnn.LayerNorm(c)
                self.projection = tnn.Linear(c, dim)
                tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)

        class PosConv(tnn.Module):
            def __init__(self):
                super().__init__()
                conv = tnn.Conv1d(dim, dim, pos_kernel,
                                  padding=pos_kernel // 2, groups=pos_groups)
                self.conv = tnn.utils.weight_norm(conv, name="weight", dim=2)
                self.k = pos_kernel

            def forward(self, x):
                x = self.conv(x.transpose(1, 2))
                if self.k % 2 == 0:
                    x = x[:, :, :-1]
                return F.gelu(x).transpose(1, 2)

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.pos_conv_embed = PosConv()
                self.layer_norm = tnn.LayerNorm(dim)
                self.layers = tnn.ModuleList(
                    [_TW2VStableLayer(dim, heads, ff) for _ in range(depth)]
                )
                tnn.init.normal_(self.layer_norm.weight, mean=1.0, std=0.1)

            def forward(self, x, n_layers=None):
                x = x + self.pos_conv_embed(x)
                layers = self.layers if n_layers is None else self.layers[:n_layers]
                for layer in layers:
                    x = layer(x)
                if n_layers is None:  # fairseq skips the end LN when truncated
                    x = self.layer_norm(x)
                return x

        self.feature_extractor = FE()
        self.feature_projection = FP()
        self.encoder = Enc()

    def forward(self, wav, n_layers=None):
        x = wav[:, None, :]
        for layer in self.feature_extractor.conv_layers:
            x = layer.conv(x)
            x = layer.layer_norm(x.transpose(1, 2)).transpose(1, 2)
            x = F.gelu(x)
        x = x.transpose(1, 2)
        x = self.feature_projection.projection(self.feature_projection.layer_norm(x))
        return self.encoder(x, n_layers=n_layers)


class TestHubertLargeRoundtrip:
    C, DIM, HEADS, FF, DEPTH = 8, 16, 4, 40, 3
    KERNELS = (10, 3, 3, 3, 3, 2, 2)
    STRIDES = (5, 2, 2, 2, 2, 2, 2)
    POS_KERNEL, POS_GROUPS = 16, 4

    def _build(self, tmp_path, output_layer=None):
        from voicebox_tpu.models.hubert import (
            HubertFeatureExtractor,
            HubertWithKmeans,
        )
        from voicebox_tpu.utils.port_weights import load_hubert_torch

        torch.manual_seed(21)
        tm = _TW2VLarge(self.C, self.DIM, self.HEADS, self.FF, self.DEPTH,
                        self.KERNELS, self.STRIDES, self.POS_KERNEL,
                        self.POS_GROUPS).eval()
        path = str(tmp_path / "hubert_large.pt")
        torch.save(tm.state_dict(), path)

        w2v = HubertWithKmeans(
            num_clusters=7, dim=self.DIM, depth=self.DEPTH, heads=self.HEADS,
            ff_dim=self.FF, conv_pos_kernel=self.POS_KERNEL,
            conv_pos_groups=self.POS_GROUPS, layer_norm_first=True,
            extractor_norm_mode="layer", output_layer=output_layer,
        )
        w2v.feature_extractor = HubertFeatureExtractor(conv_dim=self.C,
                                                       norm_mode="layer")
        import jax.numpy as _jnp

        w2v.params["feature_extractor"] = w2v.feature_extractor.init(
            jax.random.PRNGKey(0), _jnp.zeros((1, 1280))
        )["params"]
        w2v.params["proj_norm"] = {"scale": _jnp.ones((self.C,)),
                                   "bias": _jnp.zeros((self.C,))}
        w2v.params["proj"] = {"kernel": _jnp.zeros((self.C, self.DIM)),
                              "bias": _jnp.zeros((self.DIM,))}
        w2v.params = load_hubert_torch(path, w2v.params)
        return tm, w2v

    def test_full_forward_parity(self, tmp_path):
        tm, w2v = self._build(tmp_path)
        rs = np.random.RandomState(17)
        wav = (rs.randn(2, 3200) * 0.1).astype(np.float32)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(wav))
        out_j = w2v.features(jnp.asarray(wav))
        assert out_j.shape == tuple(out_t.shape)
        np.testing.assert_allclose(_np(out_j), out_t.numpy(), atol=ATOL)

    def test_output_layer_skips_end_norm(self, tmp_path):
        """Truncated large-model features are the RAW residual stream after
        block k — no end LayerNorm (fairseq extract_features semantics)."""
        tm, w2v = self._build(tmp_path, output_layer=2)
        rs = np.random.RandomState(18)
        wav = (rs.randn(1, 3200) * 0.1).astype(np.float32)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(wav), n_layers=2)
        np.testing.assert_allclose(_np(w2v.features(jnp.asarray(wav))),
                                   out_t.numpy(), atol=ATOL)
