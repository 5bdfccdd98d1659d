"""DurationPredictorTrainer: train the phoneme-duration model end to end.

The reference defines `DurationPredictor` with a full training forward
(aligner soft/hard alignment + masked-L1 duration loss + forward-sum CTC
loss, voicebox_pytorch.py:596-693,841-876) but ships NO trainer for it —
its README's open todo list includes "cleanup duration predictor training"
and users are left to hand-roll a loop. This trainer closes that gap with
the same loop discipline as `VoiceBoxTrainer` (warmup→cosine AdamW, in-jit
grad accumulation, bucketed static shapes, buffered device losses,
msgpack/orbax checkpoints, tracker fan-out).

Dataset items are tuples:

* `(text | phoneme_ids, wave)` — the codec attached to the predictor
  encodes waves to conditioning latents; the aligner mel derives from the
  same latents when `latent_dim == aligner_dim_in` (the MelVoco case —
  mirrors `benchmarks/e2e_quality_canary_duration.py`), else from a log-mel
  transform at `n_mels=aligner_dim_in` on the codec's hop grid.
* `(text | phoneme_ids, latents)` — precomputed `(n, latent_dim)`
  conditioning latents, doubling as the aligner mel (dims must match).
* `(text | phoneme_ids, latents_or_wave, mel)` — explicit aligner mel
  `(n_mel, aligner_dim_in)` when the two feature spaces differ.

Phoneme ids pad with -1 (the framework-wide id pad); texts tokenize through
the predictor's tokenizer once, host-side, cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import StageTrainer, build_accum_train_step

__all__ = ["DurationPredictorTrainer"]


class DurationPredictorTrainer(StageTrainer):
    project_name = "duration_predictor"
    ckpt_prefix = "duration"

    def __init__(
        self,
        duration_predictor,
        *,
        batch_size: int,
        dataset,
        num_train_steps: Optional[int] = None,
        num_warmup_steps: Optional[int] = None,
        num_epochs: Optional[int] = None,
        lr: float = 3e-4,
        initial_lr: float = 1e-5,
        grad_accum_every: int = 1,
        wd: float = 0.0,
        moment_dtype=None,
        ema_decay: Optional[float] = None,
        ema_dtype=None,
        max_grad_norm: Optional[float] = 0.5,
        valid_frac: float = 0.05,
        random_split_seed: int = 42,
        log_every: int = 10,
        save_results_every: int = 100,
        save_model_every: int = 1000,
        results_folder: str = "./results",
        force_clear_prev_results: bool = False,
        mesh=None,
        use_mesh: bool = True,
        seed: int = 0,
        phoneme_bucket_multiple: int = 16,
        frame_bucket_multiple: int = 128,
        max_phoneme_len: Optional[int] = None,
        max_frame_len: Optional[int] = None,
        prefetch_batches: int = 2,
        checkpoint_backend: str = "msgpack",
        trackers: tuple = (),
    ):
        self.dp = duration_predictor
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every

        assert duration_predictor.params is not None, (
            "initialise the predictor first: dp.init_params(rng, ...)"
        )
        self.params = duration_predictor.params

        assert num_train_steps is not None or num_epochs is not None, (
            "either num_train_steps or num_epochs must be specified"
        )
        if num_epochs is not None:
            num_train_steps = self._steps_from_epochs(
                num_epochs, len(dataset), batch_size, grad_accum_every,
                valid_frac,
            )
        self._setup_core(
            num_train_steps=num_train_steps,
            num_warmup_steps=num_warmup_steps,
            lr=lr, initial_lr=initial_lr, wd=wd, max_grad_norm=max_grad_norm,
            moment_dtype=moment_dtype, ema_decay=ema_decay, ema_dtype=ema_dtype,
            log_every=log_every, save_results_every=save_results_every,
            save_model_every=save_model_every, results_folder=results_folder,
            force_clear_prev_results=force_clear_prev_results,
            checkpoint_backend=checkpoint_backend, trackers=trackers,
            seed=seed,
        )

        self._setup_data_mesh(mesh, use_mesh, batch_size)
        self.opt_state = jax.jit(self.optimizer.init)(self.params)

        # dataset shape: 2-field (cond source doubles as mel) or 3-field
        # (explicit mel); waves vs latents from the second field's ndim
        probe = dataset[0]
        assert len(probe) in (2, 3), (
            "items must be (phonemes, wave|latents[, mel])"
        )
        self._has_explicit_mel = len(probe) == 3
        second = np.asarray(probe[1])
        self._cond_is_wave = second.ndim == 1
        codec = duration_predictor.audio_enc_dec
        aligner_dim = int(duration_predictor.net.aligner_dim_in)
        if self._cond_is_wave:
            assert codec is not None, (
                "wave datasets need the predictor's audio_enc_dec to encode "
                "conditioning latents"
            )
            ds_factor = int(codec.downsample_factor)
            cond_multiple = frame_bucket_multiple * ds_factor
            max_cond_len = (
                max_frame_len * ds_factor if max_frame_len is not None else None
            )
            self._derive_mel = (
                not self._has_explicit_mel
                and int(codec.latent_dim) != aligner_dim
            )
        else:
            assert second.ndim == 2, "latents must be (n, latent_dim)"
            cond_multiple = frame_bucket_multiple
            max_cond_len = max_frame_len
            self._derive_mel = False
            if not self._has_explicit_mel:
                assert second.shape[-1] == aligner_dim, (
                    f"2-field latent items reuse the latents as the aligner "
                    f"mel, but latent dim {second.shape[-1]} != "
                    f"aligner_dim_in {aligner_dim}; add an explicit mel field"
                )

        multiples = [phoneme_bucket_multiple, cond_multiple]
        pads = [-1, 0.0]
        maxes = [max_phoneme_len, max_cond_len]
        if self._has_explicit_mel:
            multiples.append(frame_bucket_multiple)
            pads.append(0.0)
            maxes.append(max_frame_len)

        self._setup_paired_loaders(
            dataset, duration_predictor.tokenizer,
            batch_size=batch_size, grad_accum_every=grad_accum_every,
            valid_frac=valid_frac, random_split_seed=random_split_seed,
            seed=seed,
            bucket_multiples=tuple(multiples), pad_values=tuple(pads),
            max_lengths=tuple(maxes), prefetch_batches=prefetch_batches,
        )

        dp = duration_predictor

        def loss(params, rng, phoneme_ids, cond, mel,
                 phoneme_len, mel_len, phoneme_mask, mel_mask):
            return dp.loss_fn(
                params, rng, cond=cond, phoneme_ids=phoneme_ids, mel=mel,
                phoneme_len=phoneme_len, mel_len=mel_len,
                phoneme_mask=phoneme_mask, mel_mask=mel_mask,
            )

        self._train_step = build_accum_train_step(
            self.optimizer, loss, grad_accum_every
        )
        self._valid_loss = jax.jit(loss)

        self._log_init_hps()

    # ------------------------------------------------------------------

    def _encode_cond(self, waves: np.ndarray, wave_mask: np.ndarray):
        """Padded waves -> (cond latents, frame mask) through the frozen
        codec (stop_gradient — the reference's no_grad encode analogue,
        voicebox_pytorch.py:1356-1371)."""
        codec = self.dp.audio_enc_dec
        x = jax.lax.stop_gradient(codec.encode(jnp.asarray(waves)))
        lengths = wave_mask.sum(axis=-1)
        ds = wave_mask.shape[-1] / x.shape[1]
        frame_lengths = np.ceil(lengths / ds).astype(np.int64)
        mask = np.arange(x.shape[1])[None, :] < frame_lengths[:, None]
        return x, mask

    def _mel_for_aligner(self, waves: np.ndarray, wave_mask: np.ndarray):
        """Log-mel at n_mels=aligner_dim_in on the codec's hop grid (the
        MelVoco.encode chain with the aligner's mel count).

        The whole chain runs as ONE jitted program per bucket shape — eager
        stft/mel/db ops here would dispatch ~10 ops per train step over the
        tunnel (CLAUDE.md's always-jit rule); jit's own cache handles the
        per-bucket shapes."""
        mel_fn = getattr(self, "_mel_jit", None)
        if mel_fn is None:
            from ..ops.stft import amplitude_to_db, mel_spectrogram

            codec = self.dp.audio_enc_dec
            hop = int(codec.downsample_factor)
            n_mels = int(self.dp.net.aligner_dim_in)
            sample_rate = int(codec.sampling_rate)

            def impl(w):
                m = mel_spectrogram(
                    w, n_mels=n_mels, sample_rate=sample_rate,
                    hop_length=hop,
                )
                return amplitude_to_db(m).transpose(0, 2, 1)  # (b, n, mels)

            mel_fn = self._mel_jit = jax.jit(impl)
        mel = mel_fn(jnp.asarray(waves))
        lengths = wave_mask.sum(axis=-1)
        ds = wave_mask.shape[-1] / mel.shape[1]
        frame_lengths = np.ceil(lengths / ds).astype(np.int64)
        mask = np.arange(mel.shape[1])[None, :] < frame_lengths[:, None]
        return jax.lax.stop_gradient(mel), mask

    def _prepare_batch(self, fields, flat: bool = False):
        (ph_ids, ph_mask) = fields[0]
        (second, second_mask) = fields[1]
        if self._cond_is_wave:
            cond, cond_mask = self._encode_cond(second, second_mask)
        else:
            cond, cond_mask = jnp.asarray(second), second_mask
        if self._has_explicit_mel:
            mel, mel_mask = jnp.asarray(fields[2][0]), fields[2][1]
        elif self._derive_mel:
            mel, mel_mask = self._mel_for_aligner(second, second_mask)
        else:
            mel, mel_mask = cond, cond_mask

        ph_ids = jnp.asarray(ph_ids)
        ph_mask = jnp.asarray(ph_mask)
        mel_mask = jnp.asarray(mel_mask)
        ph_len = ph_mask.sum(axis=-1).astype(jnp.int32)
        mel_len = mel_mask.sum(axis=-1).astype(jnp.int32)

        arrays = [ph_ids, cond, mel, ph_len, mel_len, ph_mask, mel_mask]
        if not flat:
            accum = self.grad_accum_every
            micro = ph_ids.shape[0] // accum
            arrays = [a.reshape(accum, micro, *a.shape[1:]) for a in arrays]
            sharding = self._batch_sharding
        else:
            sharding = self._flat_sharding
        arrays = [self._put_batch(a, sharding) for a in arrays]
        return arrays

    # ------------------------------------------------------------------
    # train_step: the shared StageTrainer loop

    def _on_train_end(self):
        self.dp.params = self.params

    def load(self, path):
        super().load(path)
        self.dp.params = self.params
