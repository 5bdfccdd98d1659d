"""L5: the training loop — SPMD data parallelism over a TPU mesh.

Re-design of the reference `VoiceBoxTrainer` (trainer.py:60-321). The
accelerate/DDP machinery maps onto JAX SPMD as follows (SURVEY.md §5):

* DDP + NCCL allreduce          -> batch sharded over the mesh 'data' axis;
                                   gradient reduction is an XLA psum inserted
                                   by sharding propagation, riding ICI
* `no_sync` grad accumulation   -> `lax.scan` over micro-batches INSIDE the
                                   jitted step (one device sync per step, not
                                   per micro-batch)
* `accelerator.autocast`        -> model compute dtype (bfloat16 on TPU)
* `wait_for_everyone` barrier   -> implicit in SPMD program structure
* `find_unused_parameters=True` -> unnecessary: unused params just get zero
                                   gradients in JAX
* torch.save/load state dicts   -> flax msgpack serialization of
                                   {model, optim, steps} (keys mirror the
                                   reference pkg, trainer.py:191-197)

Differences from the reference, deliberate:
* checkpoint step metadata is stored IN the checkpoint, not regexed out of the
  filename (reference quirk, trainer.py:47-58);
* `generate` delegates to `.sample` (the reference's delegates to a
  nonexistent `.generate`, trainer.py:212-213 — documented bug, fixed here);
* no interactive y/n prompt for clearing results (trainer.py:37-39) — a
  `force_clear_prev_results=True` flag only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.cfm import ConditionalFlowMatcherWrapper
from ..parallel.mesh import DATA_AXIS, make_mesh
from .base import TrainerBase, noop
from .data import DataLoader, PrefetchLoader, random_split

__all__ = ["VoiceBoxTrainer", "noop"]


class VoiceBoxTrainer(TrainerBase):
    def __init__(
        self,
        cfm_wrapper: ConditionalFlowMatcherWrapper,
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
        # e.g. jnp.bfloat16: store Adam moments at reduced precision (HBM-
        # bandwidth lever; see training/optimizer.py). None = f32 (reference)
        moment_dtype=None,
        # e.g. jnp.bfloat16: mixed-precision parameter storage — the LIVE
        # param tree fwd/bwd read is stored at this dtype while an f32 MASTER
        # copy receives the optimizer updates (the standard TPU bf16-master
        # recipe). Gradients then flow in bf16 too (grad dtype follows the
        # primal), halving the weight-read, dgrad-read, and gradient
        # write+read HBM streams — measured at the dim-1024 reference scale
        # (PERFORMANCE.md). Checkpoints store the f32 master; sampling/eval
        # use it too. None = f32 params (reference parity). The global-norm
        # clip accumulates in f32 either way (optimizer.py::
        # clip_by_global_norm_f32).
        param_dtype=None,
        # e.g. 0.999: track an EMA of the params inside the optimizer chain
        # (sample from it via generate(use_ema=True) / .ema_params). Beyond
        # parity — the reference trains without EMA; off by default.
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
        # reference kwarg (trainer.py:83): under accelerate, split_batches=True
        # means `batch_size` is the GLOBAL batch split across processes. That
        # is ALWAYS the semantic here — one SPMD program shards the global
        # batch over the mesh's data axis — so the kwarg is accepted for
        # call-site compatibility. An explicit False under multi-host warns:
        # the reference would have given batch_size PER PROCESS.
        split_batches: Optional[bool] = None,
        mesh=None,
        use_mesh: bool = True,
        param_sharding: str = "replicated",  # replicated | fsdp | tp | fsdp+tp
        seq_parallel: int = 1,  # >1: shard the latent time axis over a 'seq' axis
        min_fsdp_size: int = 2**16,
        seed: int = 0,
        bucket_multiple: int = 256,
        max_length: Optional[int] = None,
        bucket_offset: Optional[int] = None,  # None = register-aligned auto
        drop_last: bool = False,
        prefetch_batches: int = 2,  # 0 disables background prefetch
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        checkpoint_backend: str = "msgpack",  # msgpack | orbax (async)
        # experiment trackers, mirroring the reference's
        # accelerator.init_trackers("voicebox", hps) + accelerator.log
        # (reference trainer.py:182-189,285,302): each item is EITHER a
        # callable invoked as tracker(record: dict, step: int) for every
        # metrics.jsonl record (including the one-time
        # {"event": "init_trackers", "config": hps}), OR an object with any
        # of .init_trackers(project_name, config) / .log(values, step) /
        # .finish() — the wandb/tensorboard writer shapes. Only rank 0 logs
        # under multi-host, like accelerate's main-process trackers.
        trackers: tuple = (),
    ):
        self.cfm_wrapper = cfm_wrapper
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every

        if split_batches is False and jax.process_count() > 1:
            import warnings

            warnings.warn(
                "split_batches=False under multi-host: the reference's "
                "accelerate semantics would make batch_size PER-PROCESS "
                f"(effective {batch_size * jax.process_count()}); here "
                f"batch_size is always GLOBAL ({batch_size} total, sharded "
                "over the mesh). Scale batch_size up if porting a reference "
                "config verbatim.",
                stacklevel=2,
            )

        # dataset split (reference trainer.py:126-136)
        self.ds = dataset
        if valid_frac > 0:
            self.ds, self.valid_ds = random_split(dataset, valid_frac, random_split_seed)
            self.print(
                f"training with dataset of {len(self.ds)} samples and validating "
                f"with randomly splitted {len(self.valid_ds)} samples"
            )
        else:
            self.valid_ds = self.ds
            self.print(
                f"training with shared training and valid dataset of {len(self.ds)} samples"
            )

        assert len(self.ds) >= batch_size, "dataset must have sufficient samples for training"
        assert len(self.valid_ds) >= batch_size, (
            f"validation dataset must have sufficient number of samples "
            f"(currently {len(self.valid_ds)}) for training"
        )

        assert num_train_steps is not None or num_epochs is not None, (
            "either num_train_steps or num_epochs must be specified"
        )
        if num_epochs is not None:
            # one epoch = one pass over the TRAINING split; each optimizer
            # step consumes batch_size * grad_accum_every items. The
            # reference's formula (trainer.py:141, len(dataset)//batch_size
            # * num_epochs) ignores both the accumulation factor and the
            # valid split, so num_epochs=1 with grad_accum_every=4 silently
            # trains 4 passes — fixed like the other reference trainer bugs
            # (PARITY.md).
            num_train_steps = max(
                1, len(self.ds) // (batch_size * grad_accum_every)
            ) * num_epochs

        # optimizer + schedule, results folder, checkpointer, metrics/trackers
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

        # mesh / sharding
        self.seq_parallel = int(seq_parallel)
        if self.seq_parallel > 1:
            # 2-D data x seq mesh: batch over 'data', latent time over 'seq'
            # (full-model sequence parallelism, parallel/sequence_parallel.py)
            assert mesh is None, "pass seq_parallel OR a prebuilt mesh, not both"
            assert use_mesh, "seq_parallel>1 requires a mesh (use_mesh=True)"
            assert param_sharding == "replicated", (
                "sequence parallelism keeps params replicated (the SP "
                "shard_map gathers them per step otherwise)"
            )
            devices = np.array(jax.devices())
            assert devices.size % self.seq_parallel == 0
            from jax.sharding import Mesh

            mesh_arr = devices.reshape(devices.size // self.seq_parallel,
                                       self.seq_parallel)
            # process-aligned rows: jax.devices() groups devices by process,
            # so when each process's device count is a multiple of
            # seq_parallel the row-major reshape puts every (data-)row's seq
            # slices on ONE host. Each host then owns whole batch rows and
            # the row-sharded loader can feed SP too — no full-batch decode
            # duplication (VERDICT r3 item 6). Verified, not assumed: a
            # custom jax.devices() order would silently break the property.
            self._sp_process_aligned = all(
                len({d.process_index for d in row}) == 1 for row in mesh_arr
            )
            mesh = Mesh(mesh_arr, (DATA_AXIS, "seq"))
        elif mesh is None and use_mesh and len(jax.devices()) > 1:
            mesh = make_mesh()
        self.mesh = mesh
        if mesh is not None:
            if self.seq_parallel > 1:
                # batches are (accum, micro, n, d): micro over 'data', the
                # latent time axis over 'seq' — matches the SP shard_map's
                # in_specs, so the host->device put ships each shard once
                # instead of replicating the long axis across 'seq'.
                # cond_ids are NOT seq-sharded: the SP loss expects token ids
                # replicated over 'seq' (in_specs P(batch, None) —
                # parallel/sequence_parallel.py), so placing them that way up
                # front avoids a silent per-step reshard/all-gather.
                self._batch_sharding = NamedSharding(
                    mesh, P(None, DATA_AXIS, "seq")
                )
                self._ids_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
                self._flat_sharding = NamedSharding(mesh, P(DATA_AXIS, "seq"))
                self._flat_ids_sharding = NamedSharding(mesh, P(DATA_AXIS))
            else:
                self._batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
                self._ids_sharding = self._batch_sharding
                self._flat_sharding = NamedSharding(mesh, P(DATA_AXIS))
                self._flat_ids_sharding = self._flat_sharding
            self._replicated = NamedSharding(mesh, P())
        else:
            self._batch_sharding = None
            self._ids_sharding = None
            self._flat_sharding = None
            self._flat_ids_sharding = None
            self._replicated = None
        self._param_sharding_mode = param_sharding
        self._min_fsdp_size = min_fsdp_size

        # params / optimizer state
        assert cfm_wrapper.params is not None, (
            "initialise the wrapper first: cfm_wrapper.init_params(rng, ...)"
        )
        self.params = cfm_wrapper.params
        if mesh is not None:
            from ..parallel.sharding_rules import shard_params

            # fsdp/tp rules shard weights over the mesh; optimizer state
            # inherits the layout through sharding propagation of jit(init)
            self.params = shard_params(
                mesh, self.params, param_sharding, min_fsdp_size=min_fsdp_size
            )
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
        else:
            self.opt_state = self.optimizer.init(self.params)

        # mixed-precision parameter storage: self.params stays the f32
        # MASTER (canonical for checkpoints/eval/sampling); self._live is
        # the reduced-precision tree the jitted step reads and rewrites
        self._param_dtype = param_dtype
        if param_dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda p: p.astype(param_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, t
            )
            self._live = jax.jit(cast)(self.params)
        else:
            self._live = None

        # register-aware bucket grid: keep (frames + register tokens) on the
        # 128 lane boundary — a 128-aligned *data* length plus registers lands
        # on a misaligned tile that XLA pads 13% wider (see data.py). For raw-
        # audio datasets the offset is expressed in samples via the codec's
        # sample->frame mapping (frames = n // downsample + frame_offset; the
        # +1 of center=True STFT codecs is folded into the offset).
        # precomputed-conditioning mode: dataset items are
        # (latents (n, d), frame-aligned cond ids (n,)) pairs — the duration
        # pipeline's aligned-phoneme training (reference voicebox_pytorch.py:
        # 1231-1241 conditions on aligned ids) or offline-extracted semantic
        # ids resampled to frame rate. Both fields ride ONE shared bucket
        # grid (data.py::AlignedPairedDataLoader) so the ids keep their
        # frame alignment through padding.
        probe_item = dataset[0]
        self._paired_cond_ids = (
            isinstance(probe_item, (tuple, list)) and len(probe_item) == 2
        )
        if self._paired_cond_ids:
            first, second = (np.asarray(f) for f in probe_item)
            assert first.ndim == 2, (
                "paired datasets must carry precomputed LATENTS (n, d) in the "
                "first field; raw-audio datasets derive conditioning ids "
                "through text_to_semantic.wav2vec instead"
            )
            assert second.ndim == 1 and np.issubdtype(second.dtype, np.integer), (
                "second field must be 1-D integer conditioning ids"
            )
            assert jax.process_count() == 1, (
                "paired-conditioning datasets are single-controller (the "
                "process-sharded loader covers audio datasets only)"
            )

        align_multiple = 128
        if bucket_offset is None:
            reg = int(getattr(cfm_wrapper.voicebox, "num_register_tokens", 0) or 0)
            codec = cfm_wrapper.voicebox.audio_enc_dec
            raw_audio_ds = (
                not self._paired_cond_ids and np.asarray(dataset[0]).ndim == 1
            )
            if raw_audio_ds and codec is not None:
                ds_factor = int(codec.downsample_factor)
                frame_off = int(getattr(codec, "frame_offset", 0))
                bucket_offset = (reg + frame_off) * ds_factor
                align_multiple = 128 * ds_factor
                if bucket_multiple % align_multiple != 0:
                    bucket_multiple = align_multiple
            else:
                bucket_offset = reg

        # data loaders (cycled infinitely, reference trainer.py:166-169).
        # Multi-host SPMD: every process runs the same-seeded loader but
        # decodes ONLY its own rows (DataLoader shard=); the global batch is
        # assembled device-side via jax.make_array_from_process_local_data —
        # a plain device_put of the global batch would both decode the whole
        # batch on every host AND fail on the non-addressable shards.
        micro_bs = batch_size
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            assert micro_bs % n_data == 0, (
                f"batch_size {micro_bs} must divide the data-parallel axis {n_data}"
            )
        self._multihost = jax.process_count() > 1 and mesh is not None
        # Multi-host sequence parallelism input path. PROCESS-ALIGNED meshes
        # (each data-row's seq slices all on one host — the normal case,
        # verified above) let the row-sharded loader feed SP exactly like
        # plain DP: each host decodes only its own batch rows. Only when a
        # row SPANS hosts (seq_parallel > local device count, or an exotic
        # device order) does every process decode the FULL global batch
        # (same seed -> identical batches) and each device pull its
        # (row, seq-slice) tile in _put_global — the fallback documented in
        # PARITY.md.
        world = jax.process_count()
        sp_aligned = (
            self.seq_parallel > 1
            and getattr(self, "_sp_process_aligned", False)
            and micro_bs % world == 0
        )
        self._mh_full_batch = (
            self._multihost and self.seq_parallel > 1 and not sp_aligned
        )
        shard = None
        if self._multihost and not self._mh_full_batch:
            assert micro_bs % world == 0, (
                f"batch_size {micro_bs} must divide over {world} processes"
            )
            shard = (jax.process_index(), world)
        if self._paired_cond_ids:
            from .data import AlignedPairedDataLoader

            self.dl = AlignedPairedDataLoader(
                self.ds, batch_size=micro_bs * grad_accum_every, seed=seed,
                bucket_multiple=bucket_multiple, max_length=max_length,
                drop_last=drop_last, bucket_offset=bucket_offset,
                align_multiple=align_multiple,
            )
            self.valid_dl = AlignedPairedDataLoader(
                self.valid_ds, batch_size=micro_bs, seed=seed + 1,
                bucket_multiple=bucket_multiple, max_length=max_length,
                drop_last=drop_last, bucket_offset=bucket_offset,
                align_multiple=align_multiple,
            )
        else:
            self.dl = DataLoader(
                self.ds, batch_size=micro_bs * grad_accum_every, shuffle=True, seed=seed,
                bucket_multiple=bucket_multiple, max_length=max_length, drop_last=drop_last,
                bucket_offset=bucket_offset, align_multiple=align_multiple,
                shard=shard, shard_group_size=micro_bs,
            )
            # valid batches are consumed FLAT (one (b, n, ...) forward), so the
            # whole batch is one contiguous shard group over the data axis
            self.valid_dl = DataLoader(
                self.valid_ds, batch_size=micro_bs, shuffle=True, seed=seed + 1,
                bucket_multiple=bucket_multiple, max_length=max_length, drop_last=drop_last,
                bucket_offset=bucket_offset, align_multiple=align_multiple,
                shard=shard,
            )
        if prefetch_batches > 0:
            # overlap host decode/collation with device compute
            # (reference: torch DataLoader workers, data.py:89-91)
            self.dl_iter = PrefetchLoader(self.dl, prefetch_batches).cycle()
            self.valid_dl_iter = PrefetchLoader(self.valid_dl, 1).cycle()
        else:
            self.dl_iter = self.dl.cycle()
            self.valid_dl_iter = self.valid_dl.cycle()

        # observability: jax.profiler trace window (the idiomatic replacement
        # for the reference's absent tracing hooks — SURVEY.md §5)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        self._loss = self._loss_callable()
        self._train_step = self._build_train_step()
        self._valid_loss = jax.jit(
            lambda params, x, mask, ids, rng: self._loss(
                params, x, rng, mask=mask, cond_token_ids=ids
            )
        )

        self.hps = {
            "num_train_steps": self.num_train_steps,
            "num_warmup_steps": self.num_warmup_steps,
            "learning_rate": self.lr,
            "initial_learning_rate": self.initial_lr,
            "wd": wd,
        }
        self._log_metrics({"event": "init_trackers", "config": self.hps})

    # ------------------------------------------------------------------
    # jitted train step: grad-accum scan + SPMD data parallelism
    # ------------------------------------------------------------------

    def _loss_callable(self):
        if self.seq_parallel > 1:
            return self.cfm_wrapper.sp_loss_fn(self.mesh, batch_axis=DATA_AXIS)
        return self.cfm_wrapper.loss_fn

    def _build_train_step(self):
        loss_fn = self._loss  # shared with _valid_loss (one SP clone/shard_map)
        opt = self.optimizer
        accum = self.grad_accum_every
        param_dtype = self._param_dtype

        def accum_grads(params, batch, mask, cond_ids, rng):
            # batch: (accum, micro_bs, n, d); mask: (accum, micro_bs, n);
            # cond_ids: (accum, micro_bs, n_cond) int or None.
            # With accum > 1 the accumulator is ALWAYS f32: summing many
            # bf16 micro-gradients in bf16 would drop small contributions.
            keys = jax.random.split(rng, accum)
            acc_dtype = jnp.float32 if accum > 1 else None

            def micro_step(carry, inp):
                grads_acc, loss_acc = carry
                x, m, ids, key = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, x, key, mask=m, cond_token_ids=ids
                )
                if acc_dtype is not None:
                    grads = jax.tree.map(lambda g: g.astype(acc_dtype), grads)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, acc_dtype or p.dtype), params
            )
            (grads, loss_sum), _ = jax.lax.scan(
                micro_step, (zero_grads, 0.0), (batch, mask, cond_ids, keys)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            return grads, loss_sum / accum

        if param_dtype is None:
            def train_step(params, opt_state, batch, mask, cond_ids, rng):
                grads, loss = accum_grads(params, batch, mask, cond_ids, rng)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            return jax.jit(train_step, donate_argnums=(0, 1))

        def mixed_step(live, master, opt_state, batch, mask, cond_ids, rng):
            # fwd/bwd read the reduced-precision live tree (grads inherit its
            # dtype); the update lands on the f32 master, which is recast to
            # the next step's live tree inside the same program
            grads, loss = accum_grads(live, batch, mask, cond_ids, rng)
            updates, opt_state = opt.update(grads, opt_state, master)
            master = optax.apply_updates(master, updates)
            live = jax.tree.map(
                lambda p: p.astype(param_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, master
            )
            return live, master, opt_state, loss

        return jax.jit(mixed_step, donate_argnums=(0, 1, 2))

    def _prepare_batch(self, wave: np.ndarray, mask: np.ndarray,
                       flat: bool = False, cond_ids=None):
        """Encode raw audio through the frozen codec (and, for semantic
        conditioning, derive HuBERT token ids) and reshape to
        (accum, micro_bs, ...). Encoding happens outside the train step under
        stop_gradient — the analogue of the reference's no_grad eval encode
        (voicebox_pytorch.py:1356-1371); the wav2vec semantic-id derivation
        mirrors voicebox_pytorch.py:1384-1389. Precomputed frame-aligned
        `cond_ids` (paired datasets) pass through instead of deriving."""
        x = jnp.asarray(wave)
        codec = self.cfm_wrapper.voicebox.audio_enc_dec
        if cond_ids is not None:
            cond_ids = jnp.asarray(cond_ids, dtype=jnp.int32)
        if x.ndim == 2 and codec is not None:  # raw audio (b, n_samples)
            raw = x
            lengths = mask.sum(axis=-1)
            x = jax.lax.stop_gradient(codec.encode(x))
            ds_factor = mask.shape[-1] / x.shape[1]
            frame_lengths = np.ceil(lengths / ds_factor).astype(np.int64)
            mask = np.arange(x.shape[1])[None, :] < frame_lengths[:, None]

            t2s = self.cfm_wrapper.text_to_semantic
            if self.cfm_wrapper.condition_on_text and t2s is not None:
                from ..ops.stft import resample

                wav2vec = t2s.wav2vec
                w_in = resample(raw, codec.sampling_rate, wav2vec.target_sample_hz)
                cond_ids = jax.lax.stop_gradient(wav2vec(w_in))
        elif x.ndim == 2:
            raise ValueError(
                "2-D batches look like raw audio but no audio_enc_dec is attached"
            )

        if self.seq_parallel > 1:
            assert x.shape[1] % self.seq_parallel == 0, (
                f"bucket length {x.shape[1]} must be divisible by "
                f"seq_parallel={self.seq_parallel}; pick bucket_multiple/"
                f"bucket_offset so every bucket length is a multiple of it"
            )
        if not flat:
            b = x.shape[0]
            accum = self.grad_accum_every
            micro = b // accum
            x = x.reshape(accum, micro, *x.shape[1:])
            mask = jnp.asarray(mask).reshape(accum, micro, -1)
            if cond_ids is not None:
                cond_ids = cond_ids.reshape(accum, micro, -1)
            batch_sharding, ids_sharding = self._batch_sharding, self._ids_sharding
        else:
            mask = jnp.asarray(mask)
            batch_sharding, ids_sharding = self._flat_sharding, self._flat_ids_sharding

        if batch_sharding is not None:
            x = self._put_global(x, batch_sharding)
            mask = self._put_global(mask, batch_sharding)
            if cond_ids is not None:
                cond_ids = self._put_global(cond_ids, ids_sharding)
        return x, mask, cond_ids

    def _put_global(self, local, sharding):
        """Single-host: a plain sharded device_put. Multi-host over 'data'
        only: `local` holds only this process's rows (the sharded DataLoader
        decoded just those); assemble the global jax.Array from the
        per-process pieces. Multi-host sequence parallelism: `local` IS the
        full global batch (same-seeded full decode on every process, see
        __init__) and each addressable device pulls its (row, seq) tile."""
        if not self._multihost:
            return jax.device_put(local, sharding)
        arr = np.asarray(local)
        if self._mh_full_batch:
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )
        return jax.make_array_from_process_local_data(sharding, arr)

    # ------------------------------------------------------------------
    # checkpointing (flax msgpack; keys mirror the reference pkg)
    # ------------------------------------------------------------------

    def load(self, path):
        super().load(path)
        if self.mesh is not None:
            from ..parallel.sharding_rules import shard_params

            self.params = shard_params(self.mesh, self.params,
                                       self._param_sharding_mode,
                                       min_fsdp_size=self._min_fsdp_size)
            # opt_state leaves are uncommitted host arrays after restore; the
            # first jitted step re-lays them out to follow the param shardings
        self.cfm_wrapper.params = self.params
        if self._param_dtype is not None:
            # rebuild the live tree from the restored f32 master
            dt = self._param_dtype
            self._live = jax.jit(lambda t: jax.tree.map(
                lambda p: p.astype(dt)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, t
            ))(self.params)

    def load_torch(self, path):
        """Resume a REFERENCE training run on this trainer: port a reference
        checkpoint (`results/voicebox.{steps}.pt`, reference
        trainer.py:191-197,306-310) — model weights AND AdamW moments AND the
        step counter — so a run started on the reference build continues here
        mid-stream, mirroring the reference's own `.load`
        (trainer.py:199-207, which restores model + optim + scheduler).

        The scheduler carries no tensor state to port: both builds compute
        the warmup+cosine LR purely from the step, which is restored into
        every stateful counter (Adam bias correction AND the lr schedule).
        Frozen `audio_enc_dec.*` codec weights are skipped as in
        `ConditionalFlowMatcherWrapper.load_torch`; checkpoints whose
        submodules carry unknown buffer layouts refuse the optimizer port
        loudly rather than misalign (see
        `utils/port_weights.load_optimizer_torch`)."""
        import torch

        from ..utils.port_weights import (
            load_optimizer_torch,
            load_voicebox_torch,
        )

        from .optimizer import restore_adam_state

        # deserialize ONCE — the reference's dim-1024 checkpoint is ~8 GB
        # (f32 params + both Adam moments); loading it separately for the
        # model and the optimizer would double load time and peak host RSS
        pkg = torch.load(path, map_location="cpu", weights_only=False)
        assert isinstance(pkg, dict) and "model" in pkg, (
            "expected a reference trainer checkpoint "
            "(trainer.py:191-197 saves {'model', 'optim', 'scheduler'})"
        )
        params = load_voicebox_torch(pkg["model"], self.params)
        try:
            mu, nu, count = load_optimizer_torch(pkg, params)
        except Exception:
            # the optimizer port refused loudly; still install the weights
            # CONSISTENTLY (trainer params, fresh optimizer state, wrapper
            # facade) before re-raising, so a caller that catches and
            # continues — the documented "weights still load" posture —
            # trains the same params it serves
            self._install_ported_params(params)
            self.opt_state = (
                jax.jit(self.optimizer.init)(self.params)
                if self.mesh is not None
                else self.optimizer.init(self.params)
            )
            raise
        self._install_ported_params(params)
        # fresh state carries the right dtypes/sharding; the ported moments
        # are installed into it leaf-by-leaf
        if self.mesh is not None:
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
        else:
            self.opt_state = self.optimizer.init(self.params)
        self.opt_state = restore_adam_state(
            self.opt_state, mu, nu, count, params=self.params
        )
        # the Adam step counter IS the number of completed optimizer steps —
        # authoritative, unlike the reference's filename regex
        self.steps = int(count)
        return self.params

    def _install_ported_params(self, params):
        """Adopt a freshly ported param tree everywhere the trainer serves it
        from: sharded `self.params`, the wrapper facade, and the bf16 live
        tree (when `param_dtype` is set) — one atomic step so the training
        state and the sampling facade can never diverge."""
        self.params = params
        if self.mesh is not None:
            from ..parallel.sharding_rules import shard_params

            self.params = shard_params(self.mesh, self.params,
                                       self._param_sharding_mode,
                                       min_fsdp_size=self._min_fsdp_size)
        self.cfm_wrapper.params = self.params
        if self._param_dtype is not None:
            dt = self._param_dtype
            self._live = jax.jit(lambda t: jax.tree.map(
                lambda p: p.astype(dt)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, t
            ))(self.params)

    def save_torch(self, path, extra_model_state=None):
        """The INVERSE of `load_torch`: export the current run as a
        reference trainer checkpoint (`voicebox.{steps}.pt` layout,
        reference trainer.py:191-197) — model weights AND AdamW moments AND
        the step counter — so a run trained HERE resumes on the reference
        build mid-stream. Moments stored at `moment_dtype=bfloat16` export
        widened to f32 (reference checkpoints are f32); the scheduler entry
        is `{}` (a no-op on torch scheduler `load_state_dict`; both builds
        derive warmup+cosine LR from the step). `extra_model_state`: verbatim
        entries merged into the model dict — e.g. the user's original frozen
        `voicebox.audio_enc_dec.*` torch weights, which never train here and
        are needed for a strict reference-side load when a codec is attached
        (when merging those, the reference optimizer's param INDICES shift,
        so resume the optimizer there only for codec-free wrappers)."""
        from ..utils.port_weights import (
            export_optimizer_torch,
            export_voicebox_torch,
            save_reference_checkpoint,
        )
        from .optimizer import adam_state_from_opt_state

        dim_head = self.cfm_wrapper.voicebox.dim_head
        mu, nu, count = adam_state_from_opt_state(self.opt_state)

        def vb(tree):
            return {
                f"voicebox.{k}": v
                for k, v in export_voicebox_torch(tree, dim_head=dim_head).items()
            }

        model = vb(self.params)
        optim = export_optimizer_torch(
            model, vb(mu), vb(nu), count,
            lr=self.lr, wd=self.wd,
        )
        if extra_model_state:
            model.update(extra_model_state)
        return save_reference_checkpoint(path, model, optim)

    def generate(self, *args, use_ema: bool = False, **kwargs):
        self.cfm_wrapper.params = self.params
        if use_ema:
            ema = self.ema_params
            assert ema is not None, (
                "use_ema=True needs VoiceBoxTrainer(ema_decay=...)"
            )
            return self.cfm_wrapper.sample(*args, params=ema, **kwargs)
        return self.cfm_wrapper.sample(*args, **kwargs)

    # ------------------------------------------------------------------

    def train_step(self):
        steps = self.steps

        if self.profile_dir is not None:
            if steps == self.profile_steps[0]:
                jax.profiler.start_trace(self.profile_dir)
            elif steps == self.profile_steps[1]:
                jax.profiler.stop_trace()
                self.print(f"{steps}: profiler trace written to {self.profile_dir}")

        wave, mask, pair_ids = self._next_item(self.dl_iter)
        x, m, cond_ids = self._prepare_batch(wave, mask, cond_ids=pair_ids)

        if self._param_dtype is not None:
            self._live, self.params, self.opt_state, loss = self._train_step(
                self._live, self.params, self.opt_state, x, m, cond_ids,
                self._next_rng(),
            )
        else:
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, x, m, cond_ids, self._next_rng()
            )
        # keep the loss ON DEVICE: a float() fetch every step forces a
        # device->host sync that serialises the dispatch pipeline (tens of ms
        # per step on a remote/tunneled backend). Losses buffer as device
        # arrays and are fetched together (one transfer) at the log boundary;
        # logs["loss"] is therefore a device array, not a Python float.
        self._loss_buffer.append((steps, loss))
        logs = {"loss": loss}

        if steps % self.log_every == 0:
            self.print(f"{steps}: loss: {self._flush_losses():0.3f}")

        if steps % self.save_results_every == 0:
            wave, mask, v_pair_ids = self._next_item(self.valid_dl_iter)
            x, m, v_ids = self._prepare_batch(
                wave, mask, flat=True, cond_ids=v_pair_ids
            )
            valid_loss = float(
                self._valid_loss(self.params, x, m, v_ids, jax.random.PRNGKey(steps))
            )
            self.print(f"{steps}: valid loss {valid_loss:0.3f}")
            self._log_metrics({"valid_loss": valid_loss})

        if steps % self.save_model_every == 0:
            self._flush_losses()  # metrics durability matches checkpoints
            model_path = str(self.results_folder / f"voicebox.{steps}.ckpt")
            self.save(model_path)
            self.print(f"{steps}: saving model to {str(self.results_folder)}")

        self.steps += 1
        return logs

    def _next_item(self, iterator):
        """Normalise loader items to (wave_or_latents, mask, pair_ids):
        paired-conditioning loaders yield ((x, mask), (ids, mask)); audio
        loaders yield (x, mask)."""
        item = next(iterator)
        if self._paired_cond_ids:
            (wave, mask), (pair_ids, _) = item
            return wave, mask, pair_ids
        wave, mask = item
        return wave, mask, None

    def _prepare_batch_flat(self, wave, mask):
        # no accum leading axis: single-forward validation on (b, n, ...)
        return self._prepare_batch(wave, mask, flat=True)

    def _on_train_end(self):
        self.cfm_wrapper.params = self.params
