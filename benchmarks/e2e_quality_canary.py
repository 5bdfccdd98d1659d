"""End-to-end quality canary on the north-star metric (VERDICT r2 item 9).

BASELINE.md's quality north star is mel-spectral distance. This script
overfits the FULL text->speech pipeline — text -> TextToSemantic (AR seq2seq)
-> semantic ids (HuBERT k-means vocabulary fit on the corpus) -> CFM denoiser
-> log-mel latents — on a tiny synthetic tone corpus, then samples each
utterance FROM TEXT ALONE and reports the mel-spectral distance between the
generated log-mels and the ground truth.

The CFM operates directly in log-mel latent space (the MelVoco latent,
SURVEY §3.5), so the reported number IS the north-star metric: L2 between
per-frame log-mel vectors, exactly `utils/metrics.py::mel_spectral_distance`'s
inner computation, without routing both sides through the same vocoder (which
cancels out of the comparison). Two scale anchors are reported alongside:
the same model UNTRAINED (chance level) and the corpus's cross-utterance
distance (how far apart different ground-truth utterances sit).

Run: python benchmarks/e2e_quality_canary.py   (CPU, a few minutes)
The measured numbers are recorded in PERFORMANCE.md;
tests/test_e2e_quality.py runs a shortened version as a regression gate.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


# --- synthetic corpus: 4-note melodies, analytic at both sample rates -----

NOTE_FREQS = {
    "c": 261.6, "d": 293.7, "e": 329.6, "f": 349.2,
    "g": 392.0, "a": 440.0, "b": 493.9, "h": 523.3,
}
TEXTS = ["c e g h", "g e c e", "a f d f", "h g e c"]
NOTE_S = 0.2  # seconds per note


def synth(text: str, sr: int) -> np.ndarray:
    """Melody -> waveform with harmonics + vibrato (spectrally non-trivial)."""
    notes = text.split()
    n = int(NOTE_S * sr)
    t = np.arange(n) / sr
    out = []
    for i, name in enumerate(notes):
        f = NOTE_FREQS[name]
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t + i)
        w = (
            0.6 * np.sin(2 * np.pi * f * vib * t)
            + 0.25 * np.sin(2 * np.pi * 2 * f * t)
            + 0.1 * np.sin(2 * np.pi * 3 * f * t)
        )
        env = np.minimum(1.0, np.minimum(t / 0.02, (NOTE_S - t) / 0.05))
        out.append((w * env).astype(np.float32))
    return np.concatenate(out)


def log_mel_latents(wavs24: np.ndarray, n_mels: int = 40) -> jnp.ndarray:
    """(b, n) 24 kHz -> (b, frames, n_mels) log-mel latents (the MelVoco
    latent layout, SURVEY §3.5 / voicebox_pytorch.py:518-541)."""
    from voicebox_tpu.ops.stft import amplitude_to_db, mel_spectrogram

    mel = mel_spectrogram(
        jnp.asarray(wavs24), n_mels=n_mels, sample_rate=24000,
        f_max=8000.0, n_fft=512, win_length=400, hop_length=160,
    )
    return jnp.transpose(amplitude_to_db(mel), (0, 2, 1))


def mel_msd(lat_a, lat_b) -> float:
    """mel_spectral_distance's inner computation on (b, frames, mels)
    latents: mean over frames of the L2 across mel bins."""
    n = min(lat_a.shape[1], lat_b.shape[1])
    d = jnp.sqrt(jnp.sum(jnp.square(lat_a[:, :n] - lat_b[:, :n]), axis=-1))
    return float(jnp.mean(d))


def stretch_ids(ids: np.ndarray, n_frames: int) -> np.ndarray:
    """(b, m) -> (b, n_frames) nearest-neighbour stretch (the same id ->
    latent-frame mapping cfm._sample_long_chunks uses)."""
    m = ids.shape[1]
    idx = np.minimum((np.arange(n_frames) * m) // n_frames, m - 1)
    return ids[:, idx]


def build_and_train(tts_steps: int = 400, cfm_steps: int = 2000,
                    num_clusters: int = 12, seed: int = 0, verbose=print):
    """Returns (pipeline dict, gt latents). Tiny models, full stack."""
    import optax

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.hubert import HubertWithKmeans
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    wav24 = np.stack([synth(t, 24000) for t in TEXTS])
    wav16 = np.stack([synth(t, 16000) for t in TEXTS])
    gt = log_mel_latents(wav24)  # (4, frames, 40)
    b, n_frames, n_mels = gt.shape
    # NOTE (measured): CFM trains on the RAW dB latents. Standardizing them
    # to unit scale was tried and scored WORSE at this budget (145 vs 70
    # dB/frame): with ~30x-unit targets the x0 noise is negligible and the
    # flow regresses the conditional mean, which is exactly what a
    # deterministic tiny corpus rewards.

    # frozen HuBERT features + corpus-fit k-means vocabulary
    w2v = HubertWithKmeans(num_clusters=num_clusters, dim=32, depth=2,
                           heads=4, seed=seed)
    w2v.fit_kmeans(wavs=wav16, rng=jax.random.PRNGKey(seed), iters=25)
    sem_ids = np.asarray(w2v(jnp.asarray(wav16)))  # (4, ~38)
    verbose(f"semantic ids: {sem_ids.shape}, "
            f"{len(np.unique(sem_ids))}/{num_clusters} clusters used")

    # text -> semantic seq2seq, overfit
    tok = GraphemeTokenizer()
    tts = TextToSemantic(dim=64, source_depth=2, target_depth=2, heads=4,
                         dim_head=16, wav2vec=w2v, tokenizer=tok)
    tts.init_params(jax.random.PRNGKey(seed + 1))
    text_ids = jnp.asarray(tok.texts_to_tensor_ids(TEXTS))
    sem = jnp.asarray(sem_ids)
    opt = optax.adam(3e-3)
    opt_state = jax.jit(opt.init)(tts.params)

    @jax.jit
    def tts_step(params, opt_state):
        loss, grads = jax.value_and_grad(tts.loss_fn)(params, text_ids, sem)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(tts_steps):
        tts.params, opt_state, tl = tts_step(tts.params, opt_state)
    verbose(f"tts loss after {tts_steps} steps: {float(tl):.4f}")

    # CFM denoiser in log-mel latent space, ids pre-stretched to frame rate
    ids_frames = jnp.asarray(stretch_ids(sem_ids, n_frames))
    vb = VoiceBox(dim_in=n_mels, dim=128, depth=4, dim_head=32, heads=4,
                  dim_cond_emb=64, num_register_tokens=2,
                  condition_on_text=True, num_cond_tokens=num_clusters)
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts,
                                        cond_drop_prob=0.1)
    cfm.init_params(jax.random.PRNGKey(seed + 2), seq_len=n_frames, batch=b)
    copt = optax.adam(1e-3)
    copt_state = jax.jit(copt.init)(cfm.params)
    x1 = gt

    @jax.jit
    def cfm_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            params, x1, rng, cond_token_ids=ids_frames
        )
        updates, opt_state = copt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 3)
    for i in range(cfm_steps):
        rng, k = jax.random.split(rng)
        cfm.params, copt_state, cl = cfm_step(cfm.params, copt_state, k)
    verbose(f"cfm loss after {cfm_steps} steps: {float(cl):.4f}")

    return {"cfm": cfm, "tts": tts, "tok": tok, "w2v": w2v,
            "n_frames": n_frames, "n_mels": n_mels}, gt


def sample_from_text(pipe, params=None, steps: int = 16,
                     cond_scale: float = 1.0, rng=None):
    """TEXT -> generated log-mel latents through the whole trained stack."""
    cfm, tts = pipe["cfm"], pipe["tts"]
    n_frames, n_mels = pipe["n_frames"], pipe["n_mels"]
    outs = []
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    for t in TEXTS:
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


def main():
    pipe, gt = build_and_train()
    gen = sample_from_text(pipe)
    msd = mel_msd(gen, gt)

    # anchors: untrained model (chance), and cross-utterance corpus spread
    untrained = pipe["cfm"].init_params(jax.random.PRNGKey(99),
                                        seq_len=pipe["n_frames"], batch=1)
    gen0 = sample_from_text(pipe, params=untrained)
    msd0 = mel_msd(gen0, gt)
    cross = mel_msd(gt, jnp.asarray(np.roll(np.asarray(gt), 1, axis=0)))

    print(f"mel-spectral distance, trained pipeline (text->speech): "
          f"{msd:.2f} dB/frame")
    print(f"  untrained anchor: {msd0:.2f}   cross-utterance anchor: "
          f"{cross:.2f}")
    print({"metric": "e2e_mel_spectral_distance", "value": round(msd, 3),
           "unit": "dB L2/frame", "untrained": round(msd0, 3),
           "cross_utterance": round(cross, 3)})


if __name__ == "__main__":
    main()
