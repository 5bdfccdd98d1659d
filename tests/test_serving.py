"""Tests for the bucketed serving engine: no compiles on the request path
after warmup, bucket quantisation, output trimming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.models.hubert import HubertWithKmeans
from voicebox_tpu.models.text_to_semantic import TextToSemantic
from voicebox_tpu.serving import TTSEngine
from voicebox_tpu.utils.tokenizer import GraphemeTokenizer


@pytest.fixture(scope="module")
def engine():
    w2v = HubertWithKmeans(num_clusters=30, dim=32, depth=2, heads=4)
    tts = TextToSemantic(dim=32, source_depth=2, target_depth=2, heads=4,
                         dim_head=8, wav2vec=w2v, tokenizer=GraphemeTokenizer())
    tts.init_params(jax.random.PRNGKey(0))
    vb = VoiceBox(dim_in=32, dim=32, depth=2, dim_head=8, heads=4,
                  dim_cond_emb=32, num_register_tokens=2,
                  condition_on_text=True, num_cond_tokens=30)
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(1), seq_len=12, batch=1)
    return TTSEngine(
        cfm, text_buckets=(8, 16), batch_buckets=(1, 2),
        steps=2, max_semantic_token_ids=12, decode_to_audio=False,
    )


class TestEngine:
    def test_warmup_compiles_all_buckets(self, engine):
        secs = engine.warmup()
        assert secs > 0
        # bucketed samplers cached inside text_to_semantic (per batch size)
        assert len(engine.wrapper.text_to_semantic._samplers) >= 2

    def test_synthesize_trims_to_request(self, engine):
        out = engine.synthesize(["hi"])
        assert out.shape[0] == 1
        assert jnp.isfinite(out).all()

    def test_batch_bucket_padding(self, engine):
        # 2 requests land in the batch-2 bucket and come back as 2
        out = engine.synthesize(["one", "two"])
        assert out.shape[0] == 2

    def test_requires_text_to_semantic(self, rng):
        vb = VoiceBox(dim_in=16, dim=16, depth=2, dim_head=8, heads=2,
                      condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(rng, seq_len=8, batch=1)
        with pytest.raises(AssertionError, match="text->semantic"):
            TTSEngine(cfm)

    def test_no_recompile_after_warmup(self, engine):
        engine.warmup()
        n_before = len(engine.wrapper.text_to_semantic._samplers)
        engine.synthesize(["in buckets"])  # 10 graphemes <= text bucket 16
        n_after = len(engine.wrapper.text_to_semantic._samplers)
        assert n_after == n_before  # no new compiled programs


class TestOverflowHandling:
    def test_requests_beyond_largest_batch_bucket_all_served(self, engine):
        # 5 requests, batch buckets max 2 -> 3 chunks, every text gets output
        texts = ["a", "bb", "ccc", "dd", "e"]
        out = engine.synthesize(texts)
        assert out.shape[0] == 5
        assert jnp.isfinite(out).all()

    def test_text_longer_than_largest_bucket_raises(self, engine):
        with pytest.raises(ValueError, match="exceeds the largest text bucket"):
            engine.synthesize(["x" * 100])  # graphemes >> bucket 16


class TestSampleLengths:
    def test_return_lengths_precomputed_ids(self, engine):
        cfm = engine.wrapper
        ids = jnp.zeros((2, 12), dtype=jnp.int32)
        out, lengths = cfm.sample(semantic_token_ids=ids, steps=2,
                                  decode_to_audio=False, return_lengths=True)
        assert lengths.shape == (2,)
        # precomputed ids: everything valid -> full latent length
        assert (np.asarray(lengths) == out.shape[1]).all()

    def test_return_lengths_from_generate_mask(self, engine):
        out, lengths = engine.wrapper.sample(
            texts=["hello"], steps=2, max_semantic_token_ids=12,
            decode_to_audio=False, return_lengths=True,
        )
        lengths = np.asarray(lengths)
        assert lengths.shape == (1,)
        assert 0 < lengths[0] <= out.shape[1]
