"""Unbounded-length synthesis with a voice prompt (sample_long).

The reference generates one fixed horizon per call (its memory and latency
grow with the utterance). Here, Voicebox's infilling objective is used as
in-context continuation: each window is conditioned on the previous window's
tail, every window reuses ONE compiled program, and memory stays O(window) —
arbitrarily long audio on a single chip.

    python examples/long_form_tts.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = VoiceBox(
        num_cond_tokens=500, dim_in=128, dim_cond_emb=512, dim=512, depth=8,
        dim_head=128, heads=4, num_register_tokens=16, condition_on_text=True,
        dtype=dtype,
    )
    cfm = ConditionalFlowMatcherWrapper(model, cond_drop_prob=0.2)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=768, batch=1)

    # semantic ids for ~40 s of audio at the Encodec frame rate (75 Hz) —
    # in production these come from TextToSemantic.generate or a duration
    # pipeline; random here (untrained demo weights)
    total_frames = 3000
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, total_frames), 0, 500)

    # a 2 s voice prompt (latents; raw audio works too when a codec is attached)
    prompt = jax.random.normal(jax.random.PRNGKey(2), (1, 150, 128)) * 0.1

    latents = cfm.sample_long(
        semantic_token_ids=ids,
        total_frames=total_frames,
        window_frames=768,      # ~10 s windows
        overlap_frames=128,     # ~1.7 s of continuation context
        prompt=prompt,
        steps=3,
        cond_scale=1.3,
        rng=jax.random.PRNGKey(3),
        decode_to_audio=False,  # attach EncodecVoco/MelVoco for waveforms
    )
    print("latents:", latents.shape, "finite:", bool(jnp.all(jnp.isfinite(latents))))
    print("windows shared one compiled sampler:", len(cfm._sampler_cache) == 1)


if __name__ == "__main__":
    main()
