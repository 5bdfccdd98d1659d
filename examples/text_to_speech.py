"""Full text -> speech pipeline (BASELINE config 5; reference README.md:39-98):
HubertWithKmeans semantic tokens + TextToSemantic + conditional VoiceBox +
EncodecVoco decode.

With pretrained checkpoints, point the constructors at local files (see
voicebox_tpu/utils/port_weights.py); without them this runs the full pipeline
mechanically on random weights.

    python examples/text_to_speech.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo-root import

import jax
import jax.numpy as jnp

from voicebox_tpu import (
    ConditionalFlowMatcherWrapper,
    EncodecVoco,
    HubertWithKmeans,
    TextToSemantic,
    VoiceBox,
)


def main():
    wav2vec = HubertWithKmeans(num_clusters=500)

    text_to_semantic = TextToSemantic(
        dim=512,
        source_depth=6,
        target_depth=6,
        wav2vec=wav2vec,
    )
    text_to_semantic.init_params(jax.random.PRNGKey(0))

    codec = EncodecVoco()
    model = VoiceBox(
        audio_enc_dec=codec,
        num_cond_tokens=500,
        dim=512,
        depth=8,
        condition_on_text=True,
    )
    cfm_wrapper = ConditionalFlowMatcherWrapper(
        model, text_to_semantic=text_to_semantic, cond_drop_prob=0.2
    )
    cfm_wrapper.init_params(jax.random.PRNGKey(1), seq_len=256, batch=1)

    # training on raw audio: semantic ids derived by the frozen wav2vec
    audio = jax.random.normal(jax.random.PRNGKey(2), (2, 24000)) * 0.1
    loss = cfm_wrapper(audio)
    print("train loss:", float(loss))

    # text -> speech (speculative decoding for the AR text->semantic stage)
    wave = cfm_wrapper.sample(
        texts=["the quick brown fox jumps over the lazy dog"],
        steps=3,
        cond_scale=1.3,
        max_semantic_token_ids=256,
        spec_decode=True,
    )
    print("synthesised audio:", wave.shape)


if __name__ == "__main__":
    main()
