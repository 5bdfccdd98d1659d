"""Served in-context voice cloning — the Voicebox headline capability.

A 3-second voice prompt conditions the first infilling window
(`cond_mask=False` over the prompt span), and the text's semantic ids
continue from there: the generated speech carries the prompt's voice
(paper §3.2 in-context learning; reference `sample(cond=prompt_audio,
texts=...)`, voicebox_pytorch.py:1175-1201).

Engine-level: the prompt waveform rides a static `prompt_seconds_buckets`
grid (one codec-encode + wav2vec program per bucket, pre-compiled at
warmup) and the prompt's LENGTH is data on the warmed window sampler —
no XLA compiles on the request path, any prompt < window.

    python examples/voice_cloning.py

Demo weights are random — swap in trained checkpoints
(`cfm.load / load_torch`) for real cloned speech.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.models.codec import MelVoco
from voicebox_tpu.models.hubert import HubertWithKmeans
from voicebox_tpu.models.text_to_semantic import TextToSemantic
from voicebox_tpu.models.vocos import Vocos
from voicebox_tpu.serving import TTSEngine
from voicebox_tpu.utils.tokenizer import GraphemeTokenizer


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    w2v = HubertWithKmeans(num_clusters=500, dim=64, depth=2, heads=4)
    tts = TextToSemantic(dim=128, source_depth=2, target_depth=2, heads=4,
                         dim_head=32, wav2vec=w2v,
                         tokenizer=GraphemeTokenizer())
    tts.init_params(jax.random.PRNGKey(0))
    codec = MelVoco(vocos=Vocos(input_channels=100, dim=64,
                                intermediate_dim=128, num_layers=2))
    vb = VoiceBox(audio_enc_dec=codec, dim=256, depth=4, dim_head=64,
                  heads=4, dim_cond_emb=256, num_register_tokens=8,
                  condition_on_text=True, num_cond_tokens=500, dtype=dtype)
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(1), seq_len=64, batch=1)

    engine = TTSEngine(
        cfm, text_buckets=(32, 64), batch_buckets=(1,), steps=3,
        max_semantic_token_ids=256,
        long_window_frames=512, long_overlap_frames=64,
        prompt_seconds_buckets=(2.0, 4.0),
    )
    print(f"warmup (buckets + long-form + prompt grid): {engine.warmup():.1f}s")

    sr = codec.sampling_rate
    t = np.arange(int(3.0 * sr))
    prompt = (0.2 * np.sin(2 * np.pi * 180.0 * t / sr)).astype(np.float32)[None]

    wav = engine.clone(
        "this sentence continues in the voice of the three second prompt",
        prompt, rng=jax.random.PRNGKey(2),
    )
    print("cloned continuation:", wav.shape,
          f"({wav.shape[-1] / sr:.1f}s of audio)",
          "finite:", bool(np.isfinite(np.asarray(wav)).all()))

    chunks = list(engine.clone_stream(
        "streaming variant: audio chunks arrive while later windows still "
        "sample, so playback starts after one window",
        prompt, rng=jax.random.PRNGKey(3),
    ))
    print(f"streamed {len(chunks)} chunks,",
          f"{sum(c.shape[-1] for c in chunks) / sr:.1f}s total")


if __name__ == "__main__":
    main()
