"""Resume a REFERENCE (lucidrains/voicebox-pytorch) training run here,
mid-stream — model weights, AdamW moments, and the step counter all port,
so the loss curve continues instead of the optimizer cold-starting.

The reference trainer periodically saves `results/voicebox.{steps}.pt`
(reference trainer.py:191-197) holding `model` + `optim` state dicts; its own
`.load` restores both plus the scheduler (trainer.py:199-207). This build's
`VoiceBoxTrainer.load_torch` is the cross-framework equivalent: weights map
through `utils/port_weights.load_voicebox_torch`, Adam's exp_avg/exp_avg_sq
map through the SAME layout transposes (Adam is elementwise, so moments
transform exactly like their params), and the step lands in both the Adam
bias-correction count and the warmup+cosine LR schedule (which is pure in
the step — there are no scheduler tensors to port).

    python examples/resume_from_reference.py path/to/voicebox.40000.pt

Caveats (see PARITY.md "Pretrained weights"):
- frozen `audio_enc_dec.*` codec weights inside the checkpoint are skipped;
  port the codec through its own loader (MelVoco/EncodecVoco weights).
- checkpoints with unknown submodule buffer layouts refuse the optimizer
  port loudly (weights still load) rather than misalign moments.
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
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "results/voicebox.40000.pt"

    # construct the SAME architecture the reference run used (its kwargs map
    # 1:1 — see PARITY.md §2.1 VoiceBox row); reference defaults shown here
    model = VoiceBox(
        dim_in=512,
        dim=1024,
        depth=24,
        dim_head=64,
        heads=16,
        num_register_tokens=16,
        attn_qk_norm=True,
        condition_on_text=True,
        num_cond_tokens=500,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
    )
    cfm_wrapper = ConditionalFlowMatcherWrapper(model, cond_drop_prob=0.2)

    seq_len, latent_dim = 512, 512
    cfm_wrapper.init_params(jax.random.PRNGKey(0), seq_len=seq_len, batch=2)

    # swap for the real corpus the reference run was training on
    rs = np.random.RandomState(0)
    dataset = ArrayDataset(
        [rs.randn(seq_len, latent_dim).astype(np.float32) for _ in range(64)]
    )

    trainer = VoiceBoxTrainer(
        cfm_wrapper,
        batch_size=8,
        dataset=dataset,
        num_train_steps=50_000,
        num_warmup_steps=5_000,
        lr=3e-4,  # match the reference run's hyperparameters
        results_folder="./results/resumed",
        bucket_multiple=seq_len,
    )

    trainer.load_torch(ckpt)
    print(f"resumed at step {trainer.steps} "
          f"(Adam moments + LR schedule restored — not a cold restart)")
    trainer.train()  # continues from trainer.steps toward num_train_steps


if __name__ == "__main__":
    main()
