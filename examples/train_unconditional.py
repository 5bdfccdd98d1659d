"""Train an unconditional VoiceBox on latents (the reference README's
'unconditional training to a valid generative model' flow, README.md:102-137),
TPU-native: SPMD data parallelism over every available chip.

    python examples/train_unconditional.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo-root import

import jax
import jax.numpy as jnp
import numpy as np

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox, VoiceBoxTrainer
from voicebox_tpu.training.data import ArrayDataset


def main():
    seq_len, latent_dim = 256, 512

    model = VoiceBox(
        dim_in=latent_dim,
        dim=512,
        depth=8,
        condition_on_text=False,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
    )
    cfm_wrapper = ConditionalFlowMatcherWrapper(model)
    cfm_wrapper.init_params(jax.random.PRNGKey(0), seq_len=seq_len, batch=2)

    # mock latent dataset (swap for MelVoco/EncodecVoco-encoded audio)
    rs = np.random.RandomState(0)
    dataset = ArrayDataset(
        [rs.randn(seq_len, latent_dim).astype(np.float32) for _ in range(256)]
    )

    trainer = VoiceBoxTrainer(
        cfm_wrapper,
        batch_size=8,
        dataset=dataset,
        num_train_steps=200,
        num_warmup_steps=20,
        lr=3e-4,
        results_folder="./results/unconditional",
        bucket_multiple=seq_len,
    )
    trainer.train()

    sampled = trainer.generate(
        cond=jnp.zeros((1, seq_len, latent_dim)), steps=3
    )
    print("sampled latents:", sampled.shape)


if __name__ == "__main__":
    main()
