"""Held-out generalization canary (VERDICT r4 missing #2).

`e2e_quality_canary.py` proves the full text->speech stack converges by
overfitting 4 utterances and sampling the SAME texts. This sibling is the
first *generalization* number: a ~32-utterance synthetic corpus with a
held-out text split — the pipeline (text -> TextToSemantic -> semantic ids
(k-means vocabulary fit on the TRAIN split only) -> CFM -> log-mel latents)
trains on the train split and is scored on mel-spectral distance for texts
it NEVER saw, against the same two anchors (untrained model = chance,
cross-utterance corpus spread). Reference bar: the reference's own
convergence claim is corpus-level ("validating that the code ... converges",
/root/reference/README.md:23) with no held-out evidence at all.

Two held-out numbers are reported:
  * full pipeline: text -> tts.generate -> CFM (the product path);
  * oracle ids: ground-truth semantic ids -> CFM (isolates the CFM's
    generalization from the seq2seq's).

Run: python benchmarks/e2e_generalization_canary.py  (CPU, ~10 min)
Measured numbers are recorded in PERFORMANCE.md; tests/test_e2e_quality.py
gates a shortened version.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax

if __name__ == "__main__":
    # standalone runs pin CPU: thousands of tiny train steps dispatch
    # op-by-op over the tunneled TPU backend (~30 ms RTT each) — the CPU
    # finishes the whole canary faster (CLAUDE.md environment facts)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from e2e_quality_canary import (  # noqa: E402
    NOTE_FREQS,
    log_mel_latents,
    mel_msd,
    stretch_ids,
    synth,
)


def make_corpus(n_train: int = 24, n_held: int = 8, seed: int = 0):
    """Distinct 4-note melodies over the 8-note vocabulary, split so the
    held-out TEXTS never appear in training (notes individually do — that is
    the point: generalization to unseen composition, not unseen phonemes)."""
    rs = np.random.RandomState(seed)
    names = sorted(NOTE_FREQS)
    texts = set()
    while len(texts) < n_train + n_held:
        texts.add(" ".join(rs.choice(names, 4)))
    texts = sorted(texts)
    rs.shuffle(texts)
    return texts[:n_train], texts[n_train : n_train + n_held]


def build_and_train_gen(
    n_train: int = 24,
    n_held: int = 8,
    tts_steps: int = 1000,
    cfm_steps: int = 2000,
    num_clusters: int = 12,
    seed: int = 0,
    verbose=print,
):
    """Train the full stack on the train split only. Returns
    (pipe, train_texts, held_texts, gt_train, gt_held)."""
    import optax

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.hubert import HubertWithKmeans
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    train_texts, held_texts = make_corpus(n_train, n_held, seed)
    wav24_tr = np.stack([synth(t, 24000) for t in train_texts])
    wav16_tr = np.stack([synth(t, 16000) for t in train_texts])
    wav24_he = np.stack([synth(t, 24000) for t in held_texts])
    wav16_he = np.stack([synth(t, 16000) for t in held_texts])
    gt_tr = log_mel_latents(wav24_tr)
    gt_he = log_mel_latents(wav24_he)
    b, n_frames, n_mels = gt_tr.shape

    # k-means vocabulary from the TRAIN split only
    w2v = HubertWithKmeans(num_clusters=num_clusters, dim=32, depth=2,
                           heads=4, seed=seed)
    w2v.fit_kmeans(wavs=wav16_tr, rng=jax.random.PRNGKey(seed), iters=25)
    sem_tr = np.asarray(w2v(jnp.asarray(wav16_tr)))
    sem_he = np.asarray(w2v(jnp.asarray(wav16_he)))  # eval oracle only
    verbose(f"semantic ids: {sem_tr.shape}, "
            f"{len(np.unique(sem_tr))}/{num_clusters} clusters used")

    # text -> semantic seq2seq on the train split
    tok = GraphemeTokenizer()
    tts = TextToSemantic(dim=64, source_depth=2, target_depth=2, heads=4,
                         dim_head=16, wav2vec=w2v, tokenizer=tok)
    tts.init_params(jax.random.PRNGKey(seed + 1))
    text_ids = jnp.asarray(tok.texts_to_tensor_ids(train_texts))
    sem = jnp.asarray(sem_tr)
    opt = optax.adam(3e-3)
    opt_state = jax.jit(opt.init)(tts.params)

    @jax.jit
    def tts_step(params, opt_state):
        loss, grads = jax.value_and_grad(tts.loss_fn)(params, text_ids, sem)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(tts_steps):
        tts.params, opt_state, tl = tts_step(tts.params, opt_state)
    verbose(f"tts loss after {tts_steps} steps: {float(tl):.4f}")

    ids_frames = jnp.asarray(stretch_ids(sem_tr, n_frames))
    vb = VoiceBox(dim_in=n_mels, dim=128, depth=4, dim_head=32, heads=4,
                  dim_cond_emb=64, num_register_tokens=2,
                  condition_on_text=True, num_cond_tokens=num_clusters)
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts,
                                        cond_drop_prob=0.1)
    cfm.init_params(jax.random.PRNGKey(seed + 2), seq_len=n_frames, batch=b)
    copt = optax.adam(1e-3)
    copt_state = jax.jit(copt.init)(cfm.params)
    x1 = gt_tr

    @jax.jit
    def cfm_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            params, x1, rng, cond_token_ids=ids_frames
        )
        updates, opt_state = copt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 3)
    for _ in range(cfm_steps):
        rng, k = jax.random.split(rng)
        cfm.params, copt_state, cl = cfm_step(cfm.params, copt_state, k)
    verbose(f"cfm loss after {cfm_steps} steps: {float(cl):.4f}")

    pipe = {"cfm": cfm, "tts": tts, "tok": tok, "w2v": w2v,
            "n_frames": n_frames, "n_mels": n_mels,
            "sem_held": sem_he}
    return pipe, train_texts, held_texts, gt_tr, gt_he


def sample_texts(pipe, texts, params=None, steps: int = 16,
                 cond_scale: float = 1.0, rng=None):
    """texts -> generated log-mel latents through the full trained stack."""
    cfm, tts = pipe["cfm"], pipe["tts"]
    n_frames, n_mels = pipe["n_frames"], pipe["n_mels"]
    outs = []
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    for t in texts:
        ids, mask = tts.generate([t], source_type="text",
                                 target_type="speech", max_length=48,
                                 return_target_mask=True)
        ids = np.asarray(jnp.where(mask, ids, 0))
        n_valid = max(int(np.asarray(mask)[0].sum()), 1)
        ids_f = jnp.asarray(stretch_ids(ids[:, :n_valid], n_frames))
        rng, k = jax.random.split(rng)
        out = cfm.sample(
            cond=jnp.zeros((1, n_frames, n_mels)),
            semantic_token_ids=ids_f, ids_at_frame_rate=True,
            steps=steps, cond_scale=cond_scale, decode_to_audio=False,
            rng=k, params=params,
        )
        outs.append(np.asarray(out))
    return jnp.asarray(np.concatenate(outs, axis=0))


def sample_oracle_ids(pipe, sem_ids: np.ndarray, params=None,
                      steps: int = 16, rng=None):
    """Ground-truth semantic ids -> CFM samples (isolates the CFM's
    generalization from the seq2seq's)."""
    cfm = pipe["cfm"]
    n_frames, n_mels = pipe["n_frames"], pipe["n_mels"]
    ids_f = jnp.asarray(stretch_ids(sem_ids, n_frames))
    rng = rng if rng is not None else jax.random.PRNGKey(43)
    out = cfm.sample(
        cond=jnp.zeros((sem_ids.shape[0], n_frames, n_mels)),
        semantic_token_ids=ids_f, ids_at_frame_rate=True,
        steps=steps, cond_scale=1.0, decode_to_audio=False,
        rng=rng, params=params,
    )
    return jnp.asarray(np.asarray(out))


def build_and_train_gen_duration(
    n_train: int = 24,
    n_held: int = 8,
    dp_steps: int = 800,
    cfm_steps: int = 2000,
    seed: int = 0,
    verbose=print,
):
    """Duration-pipeline sibling (BASELINE config 4): DurationPredictor
    (NS2 aligner + MAS) and CFM both train on the train split only; held-out
    texts sample through cfm.sample's duration branch — the serving path.
    Returns (pipe, train_texts, held_texts, gt_train, gt_held)."""
    import optax
    from types import SimpleNamespace

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.duration import DurationPredictor
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    train_texts, held_texts = make_corpus(n_train, n_held, seed)
    gt_tr = log_mel_latents(np.stack([synth(t, 24000) for t in train_texts]))
    gt_he = log_mel_latents(np.stack([synth(t, 24000) for t in held_texts]))
    b, n_frames, n_mels = gt_tr.shape

    tok = GraphemeTokenizer()
    phoneme_ids = jnp.asarray(tok.texts_to_tensor_ids(train_texts))
    n_ph = phoneme_ids.shape[1]

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
            params, rng, cond=gt_tr, phoneme_ids=phoneme_ids, mel=gt_tr,
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

    _, aligned = dp.forward_with_cond_scale(
        cond=None, phoneme_ids=phoneme_ids,
        return_aligned_phoneme_ids=True, total_length=n_frames,
    )
    aligned = jnp.asarray(aligned)

    vb = VoiceBox(dim_in=n_mels, dim=128, depth=4, dim_head=32, heads=4,
                  dim_cond_emb=64, num_register_tokens=2,
                  condition_on_text=True, num_cond_tokens=tok.vocab_size)
    cfm = ConditionalFlowMatcherWrapper(vb, duration_predictor=dp,
                                        cond_drop_prob=0.1)
    cfm.init_params(jax.random.PRNGKey(seed + 2), seq_len=n_frames, batch=b)
    copt = optax.adam(1e-3)
    copt_state = jax.jit(copt.init)(cfm.params)

    @jax.jit
    def cfm_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            params, gt_tr, rng, cond_token_ids=aligned
        )
        updates, opt_state = copt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 3)
    for _ in range(cfm_steps):
        rng, k = jax.random.split(rng)
        cfm.params, copt_state, cl = cfm_step(cfm.params, copt_state, k)
    verbose(f"cfm loss after {cfm_steps} steps: {float(cl):.4f}")

    pipe = {"cfm": cfm, "dp": dp, "tok": tok,
            "n_frames": n_frames, "n_mels": n_mels}
    return pipe, train_texts, held_texts, gt_tr, gt_he


def sample_texts_duration(pipe, texts, params=None, steps: int = 16,
                          cond_scale: float = 1.0, rng=None):
    """texts -> log-mel latents through cfm.sample's duration branch."""
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    return pipe["cfm"].sample(
        texts=list(texts), frame_length=pipe["n_frames"], steps=steps,
        cond_scale=cond_scale, decode_to_audio=False, rng=rng, params=params,
    )


def main_duration():
    pipe, train_texts, held_texts, gt_tr, gt_he = build_and_train_gen_duration()
    msd_he = mel_msd(sample_texts_duration(pipe, held_texts), gt_he)
    msd_tr = mel_msd(sample_texts_duration(pipe, train_texts), gt_tr)
    untrained = pipe["cfm"].init_params(jax.random.PRNGKey(99),
                                        seq_len=pipe["n_frames"], batch=1)
    msd0_he = mel_msd(
        sample_texts_duration(pipe, held_texts, params=untrained), gt_he
    )
    cross_he = mel_msd(gt_he, jnp.asarray(np.roll(np.asarray(gt_he), 1,
                                                  axis=0)))
    print(f"held-out mel-spectral distance (duration pipeline, UNSEEN "
          f"texts): {msd_he:.2f} dB/frame")
    print(f"  train-split: {msd_tr:.2f}   untrained anchor: {msd0_he:.2f}   "
          f"cross-utterance anchor: {cross_he:.2f}")
    print({"metric": "e2e_heldout_mel_spectral_distance_duration",
           "value": round(msd_he, 3), "unit": "dB L2/frame",
           "train_split": round(msd_tr, 3), "untrained": round(msd0_he, 3),
           "cross_utterance": round(cross_he, 3)})


def main():
    pipe, train_texts, held_texts, gt_tr, gt_he = build_and_train_gen()

    gen_he = sample_texts(pipe, held_texts)
    msd_he = mel_msd(gen_he, gt_he)
    gen_tr = sample_texts(pipe, train_texts)
    msd_tr = mel_msd(gen_tr, gt_tr)
    oracle_he = mel_msd(sample_oracle_ids(pipe, pipe["sem_held"]), gt_he)

    untrained = pipe["cfm"].init_params(jax.random.PRNGKey(99),
                                        seq_len=pipe["n_frames"], batch=1)
    msd0_he = mel_msd(sample_texts(pipe, held_texts, params=untrained), gt_he)
    cross_he = mel_msd(gt_he, jnp.asarray(np.roll(np.asarray(gt_he), 1,
                                                  axis=0)))

    print(f"held-out mel-spectral distance (text->speech, UNSEEN texts): "
          f"{msd_he:.2f} dB/frame")
    print(f"  train-split: {msd_tr:.2f}   oracle-id held-out: {oracle_he:.2f}")
    print(f"  untrained anchor (held-out): {msd0_he:.2f}   "
          f"cross-utterance anchor (held-out): {cross_he:.2f}")
    print({"metric": "e2e_heldout_mel_spectral_distance",
           "value": round(msd_he, 3), "unit": "dB L2/frame",
           "train_split": round(msd_tr, 3),
           "oracle_ids_heldout": round(oracle_he, 3),
           "untrained": round(msd0_he, 3),
           "cross_utterance": round(cross_he, 3)})


if __name__ == "__main__":
    if "--duration" in sys.argv:
        main_duration()
    else:
        main()
