"""Train EVERY trainable stage of the TTS pipeline in this framework, then
synthesize — the full from-scratch path a migrating user follows when no
pretrained spear-tts / duration checkpoints exist (spear-tts checkpoint
migration is a declared non-goal, PARITY.md; the HuBERT+kmeans vocabulary
DOES port, utils/port_weights.py):

  1. TextToSemanticTrainer — (text, wave) pairs; semantic targets derive
     through the frozen HubertWithKmeans per batch.
  2. DurationPredictorTrainer — (text, latents) items; aligner + masked-L1 +
     forward-sum losses (the training loop the reference leaves to users).
  3. VoiceBoxTrainer — the reference's trainer, SPMD over the mesh.
  4. cfm.sample conditioned on generated semantic ids.

Runs mechanically on a tiny synthetic corpus + random-init (tiny) HuBERT so
it executes anywhere; swap the dataset for SpeechTextDataset("corpus/") and
the HuBERT for a ported checkpoint for real use.

    python examples/train_tts_pipeline.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo-root import

import jax
import numpy as np

import jax.numpy as jnp

from voicebox_tpu import (
    ConditionalFlowMatcherWrapper,
    DurationPredictor,
    DurationPredictorTrainer,
    HubertWithKmeans,
    TextToSemantic,
    TextToSemanticTrainer,
    VoiceBox,
    VoiceBoxTrainer,
)
from voicebox_tpu.models.codec import AudioEncoderDecoder
from voicebox_tpu.training.data import PairedDataset


class LinearCodec(AudioEncoderDecoder):
    """Toy invertible codec (strided orthogonal projection) standing in for
    MelVoco/EncodecVoco so the example runs without pretrained vocoder
    weights — also the minimal template for bringing a custom codec: the
    trainer and sampler consume only this ABC surface."""

    sampling_rate = 16000
    latent_dim = 16
    downsample_factor = 320

    def __init__(self):
        # orthonormal columns: decode is the exact transpose inverse
        q, _ = np.linalg.qr(np.random.RandomState(7).randn(320, 320))
        self._proj = jnp.asarray(q[:, : self.latent_dim], dtype=jnp.float32)

    def encode(self, audio):
        b, n = audio.shape
        frames = audio.reshape(b, n // self.downsample_factor,
                               self.downsample_factor)
        return frames @ self._proj

    def decode(self, latents):
        frames = latents @ self._proj.T
        return frames.reshape(frames.shape[0], -1)


def main():
    out = Path(tempfile.mkdtemp(prefix="tts_pipeline_"))
    rs = np.random.RandomState(0)
    n_clusters = 24
    codec = LinearCodec()
    latent_dim = codec.latent_dim

    # tiny synthetic corpus: (text, 16 kHz wave) + per-utterance latents
    texts = [f"utterance number {i}" for i in range(16)]
    waves = [rs.randn(rs.randint(10, 20) * 320).astype(np.float32) * 0.1
             for _ in texts]
    latents = [np.asarray(codec.encode(w[None]))[0] for w in waves]

    # frozen feature model (random-init here; port a real one with
    # HubertWithKmeans(checkpoint_path=..., kmeans_path=...))
    wav2vec = HubertWithKmeans(
        num_clusters=n_clusters, conv_dim=8, dim=16, depth=1, heads=2,
    )

    # ---- stage 1: text -> semantic --------------------------------------
    t2s = TextToSemantic(
        dim=32, source_depth=2, target_depth=1, heads=2, dim_head=16,
        wav2vec=wav2vec,
    )
    t2s.init_params(jax.random.PRNGKey(0))
    TextToSemanticTrainer(
        t2s, batch_size=4, dataset=PairedDataset(list(zip(texts, waves))),
        num_train_steps=20, valid_frac=0.25,
        results_folder=str(out / "t2s"), use_mesh=False,
        text_bucket_multiple=16, semantic_bucket_multiple=2,
        prefetch_batches=0,
    ).train()

    # ---- stage 2: phoneme durations --------------------------------------
    from types import SimpleNamespace

    dp = DurationPredictor(
        dim_phoneme_emb=16, dim=32, depth=2, dim_head=8, heads=2,
        aligner_dim_in=latent_dim, aligner_attn_channels=latent_dim,
        audio_enc_dec=SimpleNamespace(latent_dim=latent_dim),
    )
    dp.init_params(jax.random.PRNGKey(0), seq_len=16, n_phonemes=8, batch=2)
    DurationPredictorTrainer(
        dp, batch_size=4, dataset=PairedDataset(list(zip(texts, latents))),
        num_train_steps=20, valid_frac=0.25,
        results_folder=str(out / "dur"), use_mesh=False,
        phoneme_bucket_multiple=8, frame_bucket_multiple=8,
        prefetch_batches=0,
    ).train()

    # ---- stage 3: the CFM denoiser ---------------------------------------
    # raw-audio dataset: the trainer encodes waves through the codec and
    # derives semantic conditioning ids through t2s.wav2vec, exactly the
    # reference training flow (voicebox_pytorch.py:1356-1389)
    vb = VoiceBox(
        dim_in=latent_dim, dim=32, depth=2, dim_head=8, heads=4,
        num_cond_tokens=n_clusters + 1, dim_cond_emb=16,
        condition_on_text=True, audio_enc_dec=codec,
    )
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=t2s)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)

    class WaveDataset:
        def __len__(self):
            return len(waves)

        def __getitem__(self, i):
            return waves[i]

        def item_length(self, i):
            return len(waves[i])

    VoiceBoxTrainer(
        cfm, batch_size=4, dataset=WaveDataset(),
        num_train_steps=20, valid_frac=0.25,
        results_folder=str(out / "cfm"), use_mesh=False,
        bucket_multiple=320 * 4,
    ).train()

    # ---- synthesis through the trained stages ----------------------------
    ids, mask = t2s.generate(
        ["utterance number three"], max_length=16, return_target_mask=True
    )
    audio = cfm.sample(semantic_token_ids=ids, steps=3)
    print("synthesized audio:", np.asarray(audio).shape)
    print("artifacts under", out)


if __name__ == "__main__":
    main()
