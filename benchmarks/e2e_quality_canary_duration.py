"""End-to-end quality canary for the DURATION-PREDICTOR pipeline
(BASELINE config 4; VERDICT r3 item 5).

Sibling of `e2e_quality_canary.py` (which covers config 5's
text->semantic->CFM path): this one overfits the reference's OTHER
first-class conditioning branch (voicebox_pytorch.py:1231-1241) —

    text -> grapheme ids -> DurationPredictor (trained with the NS2
    aligner + MAS durations + forward-sum loss) -> per-phoneme durations ->
    aligned ids at frame rate -> CFM denoiser -> log-mel latents

on the same tiny synthetic melody corpus, then samples each utterance FROM
TEXT ALONE through `cfm.sample(texts=..., frame_length=...)` — the exact
serving entry point — and reports mel-spectral distance to ground truth,
with untrained-model (chance) and cross-utterance anchors.

Run: python benchmarks/e2e_quality_canary.py --duration or this file
directly (CPU, a few minutes). Measured numbers live in PERFORMANCE.md;
tests/test_e2e_quality.py::TestDurationPipeline is the shortened gate.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from benchmarks.e2e_quality_canary import (  # shared corpus + metric
    TEXTS,
    log_mel_latents,
    mel_msd,
    synth,
)


def build_and_train_duration(dp_steps: int = 400, cfm_steps: int = 2000,
                             seed: int = 0, verbose=print):
    """Returns (pipeline dict, gt latents): trained DurationPredictor + CFM."""
    import optax

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.duration import DurationPredictor
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    wav24 = np.stack([synth(t, 24000) for t in TEXTS])
    gt = log_mel_latents(wav24)  # (4, frames, 40)
    b, n_frames, n_mels = gt.shape

    tok = GraphemeTokenizer()
    phoneme_ids = jnp.asarray(tok.texts_to_tensor_ids(TEXTS))  # (4, 7)
    n_ph = phoneme_ids.shape[1]

    # duration predictor trained against MAS-aligned hard durations + the
    # forward-sum alignment loss (SURVEY §3.4). The corpus mel doubles as
    # both the aligner input and the conditioning latents; latent_dim is
    # declared via a minimal codec-shaped stub (only .latent_dim is read).
    dp = DurationPredictor(
        tokenizer=tok, dim=64, depth=2, dim_phoneme_emb=64, dim_head=16,
        heads=4, aligner_dim_in=n_mels, aligner_attn_channels=n_mels,
        audio_enc_dec=SimpleNamespace(latent_dim=n_mels),
    )
    dp.init_params(jax.random.PRNGKey(seed), seq_len=n_frames,
                   n_phonemes=n_ph, batch=b)
    ph_mask = phoneme_ids != -1
    mel_mask = jnp.ones((b, n_frames), dtype=bool)
    ph_len = ph_mask.sum(-1).astype(jnp.int32)
    mel_len = jnp.full((b,), n_frames, dtype=jnp.int32)

    dopt = optax.adam(2e-3)
    dopt_state = jax.jit(dopt.init)(dp.params)

    @jax.jit
    def dp_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(dp.loss_fn)(
            params, rng, cond=gt, phoneme_ids=phoneme_ids, mel=gt,
            phoneme_len=ph_len, mel_len=mel_len, phoneme_mask=ph_mask,
            mel_mask=mel_mask,
        )
        updates, opt_state = dopt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 1)
    for _ in range(dp_steps):
        rng, k = jax.random.split(rng)
        dp.params, dopt_state, dl = dp_step(dp.params, dopt_state, k)
    verbose(f"duration-predictor loss after {dp_steps} steps: {float(dl):.4f}")

    # CFM conditioned on the TRAINED predictor's aligned ids — exactly the
    # conditioning stream inference will produce, so train/sample match
    _, aligned = dp.forward_with_cond_scale(
        cond=None, phoneme_ids=phoneme_ids,
        return_aligned_phoneme_ids=True, total_length=n_frames,
    )
    aligned = jnp.asarray(aligned)  # (4, n_frames) grapheme ids
    verbose(f"aligned ids: {aligned.shape}, "
            f"{len(np.unique(np.asarray(aligned)))} distinct")

    vb = VoiceBox(dim_in=n_mels, dim=128, depth=4, dim_head=32, heads=4,
                  dim_cond_emb=64, num_register_tokens=2,
                  condition_on_text=True, num_cond_tokens=tok.vocab_size)
    cfm = ConditionalFlowMatcherWrapper(vb, duration_predictor=dp,
                                        cond_drop_prob=0.1)
    cfm.init_params(jax.random.PRNGKey(seed + 2), seq_len=n_frames, batch=b)
    copt = optax.adam(1e-3)
    copt_state = jax.jit(copt.init)(cfm.params)
    x1 = gt

    @jax.jit
    def cfm_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            params, x1, rng, cond_token_ids=aligned
        )
        updates, opt_state = copt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 3)
    for _ in range(cfm_steps):
        rng, k = jax.random.split(rng)
        cfm.params, copt_state, cl = cfm_step(cfm.params, copt_state, k)
    verbose(f"cfm loss after {cfm_steps} steps: {float(cl):.4f}")

    return {"cfm": cfm, "dp": dp, "tok": tok,
            "n_frames": n_frames, "n_mels": n_mels}, gt


def sample_from_text_duration(pipe, params=None, steps: int = 16,
                              cond_scale: float = 1.0, rng=None):
    """TEXT -> log-mel latents through cfm.sample's duration branch
    (texts -> predicted durations -> aligned ids -> ODE), one batched call —
    the serving path itself."""
    cfm = pipe["cfm"]
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    return cfm.sample(
        texts=list(TEXTS), frame_length=pipe["n_frames"], steps=steps,
        cond_scale=cond_scale, decode_to_audio=False, rng=rng, params=params,
    )


def main():
    pipe, gt = build_and_train_duration()
    gen = sample_from_text_duration(pipe)
    msd = mel_msd(gen, gt)

    untrained = pipe["cfm"].init_params(jax.random.PRNGKey(99),
                                        seq_len=pipe["n_frames"], batch=1)
    msd0 = mel_msd(sample_from_text_duration(pipe, params=untrained), gt)
    cross = mel_msd(gt, jnp.asarray(np.roll(np.asarray(gt), 1, axis=0)))

    print(f"mel-spectral distance, trained duration pipeline "
          f"(text->durations->speech): {msd:.2f} dB/frame")
    print(f"  untrained anchor: {msd0:.2f}   cross-utterance anchor: "
          f"{cross:.2f}")
    print({"metric": "e2e_mel_spectral_distance_duration",
           "value": round(msd, 3), "unit": "dB L2/frame",
           "untrained": round(msd0, 3), "cross_utterance": round(cross, 3)})


if __name__ == "__main__":
    main()
