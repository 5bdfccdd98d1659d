"""LoRA voice adaptation: fine-tune rank-r adapters on a frozen base model,
then fold them into plain kernels for zero-overhead serving.

    python examples/lora_finetune.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.ops.lora import (
    fold_lora,
    lora_dense,
    lora_init,
    lora_scale,
    merge_lora_params,
)


def main():
    model = VoiceBox(dim_in=64, dim=256, depth=4, condition_on_text=False)
    cfm = ConditionalFlowMatcherWrapper(model)
    base = cfm.init_params(jax.random.PRNGKey(0), seq_len=128, batch=4)
    # in practice: cfm.load(...) a trained checkpoint, or cfm.load_torch(...)
    # a checkpoint trained on the reference build

    rank, alpha = 8, 16
    scale = lora_scale(alpha, rank)
    lora = lora_init(jax.random.PRNGKey(1), base, rank=rank)
    n_lora = sum(x.size for x in jax.tree.leaves(lora))
    n_base = sum(x.size for x in jax.tree.leaves(base))
    print(f"trainable adapter params: {n_lora:,} ({100 * n_lora / n_base:.1f}% of base)")

    # the new-voice dataset (latents); random stand-in here
    voice = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 64)) * 0.1

    def loss_fn(lora_tree, key):
        merged = merge_lora_params(base, lora_tree)  # base stays frozen
        with lora_dense(scale):
            return cfm.loss_fn(merged, voice, key)

    opt = optax.adam(1e-3)
    opt_state = opt.init(lora)  # optimizer state covers ADAPTERS ONLY

    @jax.jit
    def step(lora_tree, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora_tree, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lora_tree, updates), opt_state, loss

    key = jax.random.PRNGKey(3)
    for i in range(50):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step(lora, opt_state, sub)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")

    # deployment: bake the adapters in — a PLAIN param tree, zero overhead,
    # composes with quantize= / param_store_dtype= / TTSEngine
    served = fold_lora(base, lora, scale)
    out = cfm.sample(cond=voice, steps=3, params=served,
                     rng=jax.random.PRNGKey(4), decode_to_audio=False)
    print("adapted sample:", out.shape)


if __name__ == "__main__":
    main()
