"""HuBERT weight-port round-trips against the GENUINE upstream package.

The reference consumes a real pretrained HuBERT through audiolm-pytorch
(voicebox_pytorch.py:1384-1389) — the whole semantic pipeline's fidelity
rests on that frozen model. Earlier rounds proved our port against
hand-restated torch models (tests/test_port_roundtrip.py); these tests pin it
against the actual `transformers` implementation instead (installed in this
image, buildable from a tiny config with no network): if our flax layout and
the restatement shared one misunderstanding of the upstream block structure,
THESE tests would catch it.

Covered:
* `Wav2Vec2Model` base layout (do_stable_layer_norm=False, group-norm
  extractor) — full-forward parity of `HubertWithKmeans.features` vs
  `last_hidden_state`
* `HubertModel` (the model audiolm-pytorch actually wraps) — same
* large layout (do_stable_layer_norm=True, per-layer-norm extractor with conv
  biases) — full-forward parity
* `output_layer` truncation vs upstream `output_hidden_states=True`
  hidden_states[k], for BOTH norm variants (fairseq `extract_features(...,
  output_layer=k)` semantics: post-norm block output for base; raw residual
  stream — no final LayerNorm — for stable-layer-norm models)
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from voicebox_tpu.models.hubert import HubertWithKmeans  # noqa: E402

# tiny but structurally faithful: 7-layer conv extractor (total stride 320),
# even conv-pos kernel (exercises the same-pad trailing-frame drop),
# grouped pos conv, 3 encoder blocks (lets output_layer=2 truncate strictly
# inside the stack)
CONV_DIM = 16
DIM = 32
HEADS = 4
FF = 64
DEPTH = 3
POS_KERNEL = 16
POS_GROUPS = 4
N_SAMPLES = 4000  # ~11 frames after stride 320


def _common_cfg_kwargs():
    return dict(
        hidden_size=DIM,
        num_hidden_layers=DEPTH,
        num_attention_heads=HEADS,
        intermediate_size=FF,
        conv_dim=[CONV_DIM] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=POS_KERNEL,
        num_conv_pos_embedding_groups=POS_GROUPS,
        # inference-path determinism: no spec-augment, no layerdrop
        apply_spec_augment=False,
        layerdrop=0.0,
    )


def _build_upstream(model_cls, config_cls, *, stable: bool, seed: int):
    torch.manual_seed(seed)
    cfg = config_cls(
        **_common_cfg_kwargs(),
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group",
        conv_bias=stable,
    )
    return model_cls(cfg).eval()


def _ours_from(model, tmp_path, *, stable: bool, output_layer=None):
    path = str(tmp_path / "upstream.pt")
    torch.save(model.state_dict(), path)
    return HubertWithKmeans(
        checkpoint_path=path,
        num_clusters=7,
        conv_dim=CONV_DIM,
        dim=DIM,
        depth=DEPTH,
        heads=HEADS,
        ff_dim=FF,
        conv_pos_kernel=POS_KERNEL,
        conv_pos_groups=POS_GROUPS,
        layer_norm_first=stable,
        extractor_norm_mode="layer" if stable else "group",
        output_layer=output_layer,
    )


def _wav(seed=0, batch=2):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1


def _upstream_forward(model, wav):
    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
    return (
        out.last_hidden_state.numpy(),
        [h.numpy() for h in out.hidden_states],
    )


class TestGenuineTransformersBase:
    """Base layout: post-norm blocks, group-norm extractor — the
    hubert-base-ls960 family audiolm-pytorch defaults to."""

    @pytest.fixture(scope="class")
    def upstream(self):
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        return _build_upstream(Wav2Vec2Model, Wav2Vec2Config,
                               stable=False, seed=0)

    def test_full_forward_parity(self, upstream, tmp_path):
        ours = _ours_from(upstream, tmp_path, stable=False)
        wav = _wav(0)
        last, _ = _upstream_forward(upstream, wav)
        got = np.asarray(ours.features(wav))
        assert got.shape == last.shape
        np.testing.assert_allclose(got, last, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("k", [1, 2])
    def test_output_layer_matches_hidden_states(self, upstream, tmp_path, k):
        """output_layer=k == upstream hidden_states[k] (output AFTER block k;
        post-norm blocks are already layer-normed, so no extra norm)."""
        ours = _ours_from(upstream, tmp_path, stable=False, output_layer=k)
        wav = _wav(1)
        _, hidden = _upstream_forward(upstream, wav)
        got = np.asarray(ours.features(wav))
        np.testing.assert_allclose(got, hidden[k], atol=1e-4, rtol=1e-4)
        # and k == DEPTH is the full forward
        full = _ours_from(upstream, tmp_path, stable=False,
                          output_layer=DEPTH)
        np.testing.assert_allclose(
            np.asarray(full.features(wav)), hidden[DEPTH],
            atol=1e-4, rtol=1e-4,
        )

    def test_token_ids_deterministic_vs_features(self, upstream, tmp_path):
        """End-to-end __call__ assigns ids by nearest centroid over exactly
        the upstream features."""
        ours = _ours_from(upstream, tmp_path, stable=False)
        wav = _wav(2, batch=1)
        last, _ = _upstream_forward(upstream, wav)
        centers = np.asarray(ours.params["kmeans"])
        d = ((last[:, :, None, :] - centers[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(ours(wav)), d.argmin(-1))


class TestGenuineTransformersHubert:
    """`HubertModel` — the exact class audiolm-pytorch wraps."""

    def test_full_forward_parity(self, tmp_path):
        from transformers import HubertConfig, HubertModel

        upstream = _build_upstream(HubertModel, HubertConfig,
                                   stable=False, seed=1)
        ours = _ours_from(upstream, tmp_path, stable=False)
        wav = _wav(3)
        last, _ = _upstream_forward(upstream, wav)
        np.testing.assert_allclose(
            np.asarray(ours.features(wav)), last, atol=1e-4, rtol=1e-4
        )

    def test_layer9_style_truncation(self, tmp_path):
        """audiolm-pytorch's k-means vocabulary is built over a truncated
        layer (output_layer=9 at full scale; =2 here)."""
        from transformers import HubertConfig, HubertModel

        upstream = _build_upstream(HubertModel, HubertConfig,
                                   stable=False, seed=2)
        ours = _ours_from(upstream, tmp_path, stable=False, output_layer=2)
        wav = _wav(4)
        _, hidden = _upstream_forward(upstream, wav)
        np.testing.assert_allclose(
            np.asarray(ours.features(wav)), hidden[2], atol=1e-4, rtol=1e-4
        )


class TestGenuineTransformersLarge:
    """Large layout: do_stable_layer_norm=True (pre-norm blocks + one end
    LayerNorm), per-conv-layer LayerNorm extractor with conv biases."""

    @pytest.fixture(scope="class")
    def upstream(self):
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        return _build_upstream(Wav2Vec2Model, Wav2Vec2Config,
                               stable=True, seed=3)

    def test_full_forward_parity(self, upstream, tmp_path):
        ours = _ours_from(upstream, tmp_path, stable=True)
        wav = _wav(5)
        last, _ = _upstream_forward(upstream, wav)
        np.testing.assert_allclose(
            np.asarray(ours.features(wav)), last, atol=1e-4, rtol=1e-4
        )

    @pytest.mark.parametrize("k", [1, 2])
    def test_output_layer_skips_final_norm(self, upstream, tmp_path, k):
        """Stable-layer-norm truncation returns the RAW residual stream after
        block k — upstream hidden_states[k], which has NOT had the encoder's
        end LayerNorm applied (fairseq extract_features semantics)."""
        ours = _ours_from(upstream, tmp_path, stable=True, output_layer=k)
        wav = _wav(6)
        last, hidden = _upstream_forward(upstream, wav)
        got = np.asarray(ours.features(wav))
        np.testing.assert_allclose(got, hidden[k], atol=1e-4, rtol=1e-4)
        # sanity: the raw stream differs from the end-normed stream
        if k == DEPTH - 1:
            assert not np.allclose(hidden[k], last, atol=1e-3)
