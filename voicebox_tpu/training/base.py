"""Shared trainer core: optimizer/schedule, metrics + tracker logging,
checkpointing, the buffered-loss train loop.

The reference build has exactly one trainer (`VoiceBoxTrainer`,
reference trainer.py:60-321) because the other two trainable models in its
pipeline arrive pretrained as pip dependencies (spear-tts text→semantic,
NS2-style duration training loops live in their own repos). This framework's
checkpoint-migration policy makes those models RETRAINABLE here (PARITY.md:
spear-tts checkpoints are a declared port non-goal), so it ships trainers for
them too — `TextToSemanticTrainer`, `DurationPredictorTrainer` — and this
module holds the machinery they share with `VoiceBoxTrainer`:

* warmup→cosine schedule + AdamW with ndim<2 decay masking
  (`training/optimizer.py`, matching reference optimizer.py:3-35);
* `metrics.jsonl` + experiment-tracker fan-out (the accelerate
  `init_trackers`/`log` analogue, reference trainer.py:182-189,285,302);
* device-side loss buffering (a `float()` per step would force a
  device→host sync per step — tens of ms on a tunneled backend);
* msgpack/orbax checkpointing with the step stored IN the checkpoint;
* the generic donated, grad-accumulating jitted train step
  (`build_accum_train_step`).
"""

from __future__ import annotations

import json
import time
import warnings
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .optimizer import get_optimizer, warmup_cosine_schedule

__all__ = ["TrainerBase", "StageTrainer", "build_accum_train_step", "noop"]


def noop(*args, **kwargs):
    pass


def build_accum_train_step(optimizer, loss_fn, accum: int):
    """Jitted, donated train step with in-jit gradient accumulation.

    `loss_fn(params, rng, *arrays) -> scalar` is the pure per-micro-batch
    loss; each batch array carries a leading `(accum, micro, ...)` shape.
    Accumulation is a `lax.scan` INSIDE the program (one device sync per
    step — the analogue of accelerate's `no_sync`, see trainer.py module
    doc); with accum > 1 the accumulator is f32 so bf16 micro-gradients
    don't drop small contributions."""

    def accum_grads(params, rng, arrays):
        keys = jax.random.split(rng, accum)
        acc_dtype = jnp.float32 if accum > 1 else None

        def micro_step(carry, inp):
            grads_acc, loss_acc = carry
            key, xs = inp[0], inp[1:]
            loss, grads = jax.value_and_grad(loss_fn)(params, key, *xs)
            if acc_dtype is not None:
                grads = jax.tree.map(lambda g: g.astype(acc_dtype), grads)
            return (jax.tree.map(jnp.add, grads_acc, grads), loss_acc + loss), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, acc_dtype or p.dtype), params
        )
        (grads, loss_sum), _ = jax.lax.scan(
            micro_step, (zero_grads, 0.0), (keys, *arrays)
        )
        grads = jax.tree.map(lambda g: g / accum, grads)
        return grads, loss_sum / accum

    def train_step(params, opt_state, rng, *arrays):
        grads, loss = accum_grads(params, rng, arrays)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))


class TrainerBase:
    """Mixin-style base: subclass __init__ calls `_setup_core(...)`, sets
    `self.params` / `self.opt_state` / data iterators, builds its jitted
    step, then implements `train_step()`."""

    project_name = "voicebox"

    @staticmethod
    def _steps_from_epochs(num_epochs: int, dataset_len: int,
                           batch_size: int, grad_accum_every: int,
                           valid_frac: float) -> int:
        """num_epochs -> optimizer steps. One epoch = one pass over the
        TRAINING split; each optimizer step consumes
        `batch_size * grad_accum_every` items. (The reference's formula,
        trainer.py:141, ignores both the accumulation factor and the valid
        split, so num_epochs=1 with grad_accum_every=4 silently trains 4
        passes — fixed here like the other reference trainer bugs,
        PARITY.md.) The train-split size matches `random_split` exactly."""
        n_train = (int((1 - valid_frac) * dataset_len)
                   if valid_frac > 0 else dataset_len)
        return max(1, n_train // (batch_size * grad_accum_every)) * num_epochs

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    def _setup_core(
        self,
        *,
        num_train_steps: int,
        num_warmup_steps: Optional[int],
        lr: float,
        initial_lr: float,
        wd: float,
        max_grad_norm: Optional[float],
        moment_dtype,
        ema_decay: Optional[float],
        ema_dtype,
        log_every: int,
        save_results_every: int,
        save_model_every: int,
        results_folder,
        force_clear_prev_results: bool,
        checkpoint_backend: str,
        trackers: tuple,
        seed: int,
    ):
        self.steps = 0
        self.num_train_steps = num_train_steps
        self.num_warmup_steps = num_warmup_steps if num_warmup_steps is not None else 0

        # optimizer: warmup->cosine schedule, global-norm clip, ndim<2 no-decay
        # (reference optimizer.py:3-35 grouping)
        self.lr = lr
        self.initial_lr = initial_lr
        self.wd = wd
        schedule = warmup_cosine_schedule(
            lr, initial_lr, self.num_warmup_steps, self.num_train_steps
        )
        self.optimizer = get_optimizer(
            lr=schedule, wd=wd, max_grad_norm=max_grad_norm,
            moment_dtype=moment_dtype, ema_decay=ema_decay, ema_dtype=ema_dtype,
        )

        self.log_every = log_every
        self.save_results_every = save_results_every
        self.save_model_every = save_model_every

        self.results_folder = Path(results_folder)
        if force_clear_prev_results and self.results_folder.exists():
            import shutil

            shutil.rmtree(str(self.results_folder))
        self.results_folder.mkdir(parents=True, exist_ok=True)

        from .checkpoint import make_checkpointer

        self.checkpointer = make_checkpointer(checkpoint_backend, self.results_folder)

        self._metrics_path = self.results_folder / "metrics.jsonl"
        self._trackers = tuple(trackers) if jax.process_index() == 0 else ()
        self._loss_buffer: list = []
        self._rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    # logging / metrics
    # ------------------------------------------------------------------

    def print(self, msg):
        print(msg, flush=True)

    def _log_metrics(self, record: dict, step: Optional[int] = None):
        step = self.steps if step is None else step
        record = dict(record, step=step, time=time.time())
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        for tracker in self._trackers:
            if callable(tracker) and not hasattr(tracker, "log"):
                tracker(record, step)
                continue
            if record.get("event") == "init_trackers":
                init = getattr(tracker, "init_trackers", None)
                if init is not None:
                    init(self.project_name, record["config"])
                continue
            log = getattr(tracker, "log", None)
            if log is not None:
                values = {k: v for k, v in record.items()
                          if k not in ("step", "time")}
                log(values, step=step)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _flush_losses(self) -> Optional[float]:
        """Fetch all buffered device losses in ONE transfer and write them to
        metrics.jsonl; returns the most recent loss (or None if empty)."""
        if not self._loss_buffer:
            return None
        steps_, vals = zip(*self._loss_buffer)
        vals = np.asarray(jnp.stack(vals))  # single device->host transfer
        for s, v in zip(steps_, vals):
            self._log_metrics({"train_loss": float(v)}, step=s)
        self._loss_buffer.clear()
        return float(vals[-1])

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def save(self, path):
        self.checkpointer.save(path, self.params, self.opt_state, self.steps)

    def load(self, path):
        self.params, self.opt_state, steps = self.checkpointer.restore(
            path, self.params, self.opt_state
        )
        # steps is stored in the checkpoint itself — not regexed from the
        # filename like the reference (trainer.py:47-58)
        self.steps = steps

    @property
    def ema_params(self):
        """EMA param tree (None unless the trainer was built with ema_decay).
        Lives inside opt_state, so it checkpoints/shards with no extra
        plumbing."""
        from .optimizer import ema_params_from_state

        return ema_params_from_state(self.opt_state)

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def train_step(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _on_train_end(self):
        """Hook: runs after the loop completes (e.g. sync params back onto
        the model facade)."""

    def train(self, log_fn=noop):
        # an explicit log_fn keeps the old contract (a Python float per step)
        # at the cost of a per-step fetch; the default path stays async
        explicit_log = log_fn is not noop
        try:
            while self.steps < self.num_train_steps:
                logs = self.train_step()
                if explicit_log:
                    log_fn({**logs, "loss": float(logs["loss"])})
        finally:
            self._flush_losses()  # crash/interrupt-safe up to the last step
        self.print("training complete")
        self.checkpointer.wait()  # flush async checkpoint writes
        self._on_train_end()
        for tracker in self._trackers:
            # accelerate's end_training analogue (reference trainer.py:321)
            finish = getattr(tracker, "finish", None)
            if finish is not None:
                finish()


class StageTrainer(TrainerBase):
    """Shared machinery for the single-model STAGE trainers
    (`TextToSemanticTrainer`, `DurationPredictorTrainer`): a
    single-controller DP mesh, per-field-bucketed paired loaders, hps
    tracker init, and the buffered-loss step/valid/save loop.

    Subclasses implement `_prepare_batch(fields, flat=False)` (loader fields
    -> the jitted step's array tuple, device_put to
    `self._batch_sharding`/`self._flat_sharding`), set `ckpt_prefix`, and
    build `self._train_step(params, opt_state, rng, *arrays)` /
    `self._valid_loss(params, rng, *arrays)` jitted callables."""

    ckpt_prefix = "model"

    # ---------------------------------------------------------------- setup

    def _setup_data_mesh(self, mesh, use_mesh: bool, batch_size: int):
        """DP mesh: micro-batch over the 'data' axis, params replicated
        (gradient psum inserted by XLA, riding ICI). Multi-host (VERDICT r4
        missing #3): every process runs the same-seeded loader sharded to
        its rank-block rows (`PairedDataLoader(shard=...)`) and the global
        batch is assembled with `jax.make_array_from_process_local_data` in
        `_put_batch` — the same machinery as `VoiceBoxTrainer`'s
        process-sharded loader (reference bar: the reference's one trainer
        is multi-process via accelerate, trainer.py:89-95)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, make_mesh

        if mesh is None and use_mesh and len(jax.devices()) > 1:
            mesh = make_mesh()
        self.mesh = mesh
        if jax.process_count() > 1 and mesh is None:
            # a warning, not an assert: deliberately training a LOCAL
            # replica inside a multi-process runtime is legitimate (e.g. the
            # single-process reference runs in tests/mp_stage_worker.py) —
            # but doing it by accident trains N independent same-seeded
            # replicas that race on shared checkpoint paths
            warnings.warn(
                "multi-process stage training without a mesh: every process "
                "trains an INDEPENDENT replica (no gradient sync) — pass "
                "use_mesh=True (or mesh=) unless this is a deliberate "
                "process-local run, and keep results_folder process-unique",
                stacklevel=3,
            )
        self._multihost = jax.process_count() > 1 and mesh is not None
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            assert batch_size % n_data == 0, (
                f"batch_size {batch_size} must divide the data axis {n_data}"
            )
            self._batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
            self._flat_sharding = NamedSharding(mesh, P(DATA_AXIS))
        else:
            self._batch_sharding = None
            self._flat_sharding = None

    def _put_batch(self, a, sharding):
        """Ship one batch array to the mesh. Single-host: plain sharded
        device_put. Multi-host: `a` holds only this process's rows (the
        sharded loader yielded just those); assemble the global jax.Array
        from the per-process pieces."""
        if sharding is None:
            return a
        if self._multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(a)
            )
        return jax.device_put(a, sharding)

    def _setup_paired_loaders(
        self, dataset, tokenizer, *, batch_size: int, grad_accum_every: int,
        valid_frac: float, random_split_seed: int, seed: int,
        bucket_multiples, pad_values, max_lengths, prefetch_batches: int,
    ):
        """Tokenize-view + valid split + per-field-bucketed loaders +
        prefetch — identical across the stage trainers."""
        from .data import (
            PairedDataLoader,
            PrefetchLoader,
            TokenizedTextDataset,
            random_split,
        )

        self.ds = TokenizedTextDataset(dataset, tokenizer)
        if valid_frac > 0:
            self.ds, self.valid_ds = random_split(
                self.ds, valid_frac, random_split_seed
            )
            self.print(
                f"training with dataset of {len(self.ds)} samples and "
                f"validating with randomly splitted {len(self.valid_ds)} "
                "samples"
            )
        else:
            self.valid_ds = self.ds
        assert len(self.ds) >= batch_size and len(self.valid_ds) >= batch_size

        shard = None
        if getattr(self, "_multihost", False):
            world = jax.process_count()
            assert batch_size % world == 0, (
                f"batch_size {batch_size} must divide over {world} processes"
            )
            shard = (jax.process_index(), world)

        def loader(ds, bs, shuffle_seed, group=None):
            return PairedDataLoader(
                ds, bs,
                bucket_multiples=tuple(bucket_multiples),
                pad_values=tuple(pad_values),
                max_lengths=tuple(max_lengths),
                seed=shuffle_seed,
                shard=shard, shard_group_size=group,
            )

        # micro-batch groups of `batch_size` rows: each process takes its
        # rank-block inside every group, matching the (accum, micro) reshape
        self.dl = loader(self.ds, batch_size * grad_accum_every, seed,
                         group=batch_size)
        self.valid_dl = loader(self.valid_ds, batch_size, seed + 1)
        if prefetch_batches > 0:
            self.dl_iter = PrefetchLoader(self.dl, prefetch_batches).cycle()
            self.valid_dl_iter = PrefetchLoader(self.valid_dl, 1).cycle()
        else:
            self.dl_iter = self.dl.cycle()
            self.valid_dl_iter = self.valid_dl.cycle()

    def _log_init_hps(self):
        """Standard hps record + tracker init (reference
        trainer.py:182-189)."""
        self.hps = {
            "num_train_steps": self.num_train_steps,
            "num_warmup_steps": self.num_warmup_steps,
            "learning_rate": self.lr,
            "initial_learning_rate": self.initial_lr,
            "wd": self.wd,
        }
        self._log_metrics({"event": "init_trackers", "config": self.hps})

    # ----------------------------------------------------------------- loop

    def _prepare_batch(self, fields, flat: bool = False):  # pragma: no cover
        raise NotImplementedError

    def train_step(self):
        steps = self.steps
        arrays = self._prepare_batch(next(self.dl_iter))
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, self._next_rng(), *arrays
        )
        # loss stays on device; buffered fetch at the log boundary (see
        # _flush_losses)
        self._loss_buffer.append((steps, loss))
        logs = {"loss": loss}

        if steps % self.log_every == 0:
            self.print(f"{steps}: loss: {self._flush_losses():0.3f}")

        if steps % self.save_results_every == 0:
            v = self._prepare_batch(next(self.valid_dl_iter), flat=True)
            valid_loss = float(
                self._valid_loss(self.params, jax.random.PRNGKey(steps), *v)
            )
            self.print(f"{steps}: valid loss {valid_loss:0.3f}")
            self._log_metrics({"valid_loss": valid_loss})

        if steps % self.save_model_every == 0:
            self._flush_losses()
            path = str(
                self.results_folder / f"{self.ckpt_prefix}.{steps}.ckpt"
            )
            self.save(path)
            self.print(f"{steps}: saving model to {str(self.results_folder)}")

        self.steps += 1
        return logs
