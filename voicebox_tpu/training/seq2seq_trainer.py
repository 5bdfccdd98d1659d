"""TextToSemanticTrainer: train the text→semantic seq2seq in this framework.

The reference consumes a PRETRAINED spear-tts `TextToSemantic` as a frozen
pip dependency (voicebox_pytorch.py:29,1127-1150) and ships no trainer for
it; its own README defers to the spear-tts repo's trainer
(`spear_tts_pytorch` is "[contract inferred from call site]" in SURVEY.md
§2.2). Because upstream spear-tts checkpoints are a declared port non-goal
(PARITY.md — the seq2seq here is a contract re-implementation with no
verifiable 1:1 module map), a migrating user must RETRAIN the text→semantic
stage in this framework; this trainer is that path.

Training recipe (Spear-TTS stage-3 reader, arXiv 2302.03540 §4; matching
what the reference consumes): teacher-forced cross-entropy from text/phoneme
ids to HuBERT-kmeans semantic ids with EOS supervision at each row's true
length (`TextToSemantic.loss_fn`). Targets come either precomputed (id
pairs) or derived on the fly from raw audio through the frozen
`HubertWithKmeans` (`wav2vec`), mirroring how the reference's own CFM
trainer derives conditioning ids from audio (voicebox_pytorch.py:1384-1389).

TPU shape discipline: text and audio lengths vary independently, so batches
ride `PairedDataLoader`'s per-field bucket grids (program count ≤ product of
per-field bucket counts); wav buckets are multiples of the wav2vec
downsample factor times the semantic bucket, so derived id lengths land on
their own small grid. Data parallelism shards the micro-batch over the mesh
'data' axis (gradient psum inserted by XLA, riding ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import StageTrainer, build_accum_train_step

__all__ = ["TextToSemanticTrainer"]


class TextToSemanticTrainer(StageTrainer):
    """Trainer for `TextToSemantic`. `dataset` items are 2-tuples of either

    * `(text | text_ids, semantic_ids)` — precomputed targets
      (ints, pad-free 1-D arrays), or
    * `(text | text_ids, wave)` — raw audio at `wav2vec.target_sample_hz`;
      semantic ids derive per batch through the frozen `t2s.wav2vec`.

    The two kinds are sniffed from the first item's second field (int dtype
    = ids, float = wave) and must be homogeneous."""

    project_name = "text_to_semantic"
    ckpt_prefix = "text_to_semantic"

    def __init__(
        self,
        t2s,
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
        text_bucket_multiple: int = 64,
        semantic_bucket_multiple: int = 128,
        max_text_len: Optional[int] = None,
        max_semantic_len: Optional[int] = None,
        prefetch_batches: int = 2,
        checkpoint_backend: str = "msgpack",
        trackers: tuple = (),
    ):
        self.t2s = t2s
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every

        assert t2s.params is not None, (
            "initialise the model first: t2s.init_params(rng, ...)"
        )
        self.params = t2s.params

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

        # dataset kind: ids vs wave, from the first item's second field
        probe = np.asarray(dataset[0][1])
        self._targets_are_waves = np.issubdtype(probe.dtype, np.floating)
        if self._targets_are_waves:
            assert probe.ndim == 1, (
                "float second field must be a 1-D wave at "
                "wav2vec.target_sample_hz"
            )
            wav2vec = t2s.wav2vec
            assert wav2vec is not None, (
                "(text, wave) datasets need t2s.wav2vec (HubertWithKmeans) "
                "to derive semantic-token targets"
            )
            ds_factor = int(wav2vec.downsample_factor)
            target_multiple = semantic_bucket_multiple * ds_factor
            max_target_len = (
                max_semantic_len * ds_factor
                if max_semantic_len is not None else None
            )
            pad_value = 0.0
        else:
            target_multiple = semantic_bucket_multiple
            max_target_len = max_semantic_len
            pad_value = -1

        self._setup_paired_loaders(
            dataset, t2s.tokenizer,
            batch_size=batch_size, grad_accum_every=grad_accum_every,
            valid_frac=valid_frac, random_split_seed=random_split_seed,
            seed=seed,
            bucket_multiples=(text_bucket_multiple, target_multiple),
            pad_values=(-1, pad_value),
            max_lengths=(max_text_len, max_target_len),
            prefetch_batches=prefetch_batches,
        )

        # the seq2seq loss carries no dropout/stochastic rngs, but both
        # jitted callables keep the uniform (params, rng, *arrays) contract
        # the shared StageTrainer loop drives
        def loss(params, rng, text_ids, semantic_ids):
            del rng
            return t2s.loss_fn(params, text_ids, semantic_ids)

        self._train_step = build_accum_train_step(
            self.optimizer, loss, grad_accum_every
        )
        self._valid_loss = jax.jit(loss)

        self._log_init_hps()

    # ------------------------------------------------------------------

    def _derive_semantic_ids(self, waves: np.ndarray, wave_mask: np.ndarray):
        """(b, n_samples) padded waves -> (b, frames) ids with every frame at
        or beyond a row's true frame count masked to -1 (padding silence
        would otherwise fabricate target tokens — and teach EOS at the WRONG
        position, since the loss reads lengths from the id mask)."""
        wav2vec = self.t2s.wav2vec
        ids = wav2vec(jnp.asarray(waves))  # jitted per bucket shape
        lengths = wave_mask.sum(axis=-1)
        frames = np.asarray(
            [wav2vec.num_frames(int(n)) for n in lengths], dtype=np.int32
        )
        live = jnp.arange(ids.shape[1])[None, :] < jnp.asarray(frames)[:, None]
        return jnp.where(live, ids.astype(jnp.int32), -1)

    def _prepare_batch(self, fields, flat: bool = False):
        (text_ids, _), (target, target_mask) = fields
        text_ids = jnp.asarray(text_ids)  # already padded with -1
        if self._targets_are_waves:
            sem_ids = self._derive_semantic_ids(target, target_mask)
        else:
            sem_ids = jnp.asarray(target)  # already padded with -1
        if not flat:
            accum = self.grad_accum_every
            micro = text_ids.shape[0] // accum
            text_ids = text_ids.reshape(accum, micro, -1)
            sem_ids = sem_ids.reshape(accum, micro, -1)
            sharding = self._batch_sharding
        else:
            sharding = self._flat_sharding
        text_ids = self._put_batch(text_ids, sharding)
        sem_ids = self._put_batch(sem_ids, sharding)
        return text_ids, sem_ids

    # ------------------------------------------------------------------
    # train_step: the shared StageTrainer loop

    def _on_train_end(self):
        self.t2s.params = self.params

    def load(self, path):
        super().load(path)
        self.t2s.params = self.params

    def generate(self, *args, use_ema: bool = False, **kwargs):
        """Sample from the trained seq2seq (optionally from the EMA tree)."""
        self.t2s.params = self.params
        if use_ema:
            ema = self.ema_params
            assert ema is not None, (
                "use_ema=True needs TextToSemanticTrainer(ema_decay=...)"
            )
            return self.t2s.generate(*args, params=ema, **kwargs)
        return self.t2s.generate(*args, **kwargs)
