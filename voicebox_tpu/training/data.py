"""Host-side data pipeline: audio dataset + bucketed, statically-shaped
batching.

Re-design of the reference `data.py` (AudioDataset + pad-to-longest /
curtail-to-shortest collation, data.py:26-91) under the jit constraint the
PyTorch version didn't have: XLA compiles one program per input shape, so
"pad to the longest in the batch" would trigger a recompile per batch. Batches
are therefore padded to *bucketed* lengths (next multiple of
`bucket_multiple`), bounding the number of compiled shapes, and every batch
carries an explicit boolean length mask that flows into the loss/attention
masking.

Audio file I/O is host-side and torch-free: WAV and FLAC (the reference
dataset's format, reference data.py:26-53) decode through the framework's own
native C++ decoders (`voicebox_tpu/native`, GIL-releasing ctypes calls so the
prefetch thread really overlaps); other formats fall back to soundfile when
available (gated — not in this image).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "AudioDataset",
    "ArrayDataset",
    "PairedDataset",
    "SpeechTextDataset",
    "PairedDataLoader",
    "AlignedPairedDataLoader",
    "load_audio",
    "pad_to_multiple",
    "collate_with_mask",
    "get_dataloader",
    "DataLoader",
    "PrefetchLoader",
    "TokenizedTextDataset",
    "random_split",
]


def load_audio(path) -> Tuple[np.ndarray, int]:
    """Load an audio file -> (float32 mono wave in [-1, 1], sample_rate).

    .wav goes through the native C++ decoder (`voicebox_tpu.native`) when the
    toolchain is available, else scipy."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        from ..native import wav_read

        native = wav_read(path)
        if native is not None:
            return native

        from scipy.io import wavfile

        sr, data = wavfile.read(str(path))
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 2:  # channels-last -> mono (match reference's '1 ... -> ...')
            data = data.mean(axis=1)
        return data, sr
    if suffix == ".flac":
        # the reference dataset's format (reference data.py:26-53): decoded
        # by the framework's own native C++ FLAC decoder (native/flacio.cpp)
        from ..native import flac_read

        native = flac_read(path)
        if native is not None:
            return native
    # fallback for other formats (or flac without a toolchain): soundfile
    # when available (not baked into this image — gated)
    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            f"loading {suffix} requires the native decoder toolchain (g++) "
            "for .flac or the 'soundfile' package; convert to .wav otherwise"
        ) from e
    data, sr = sf.read(str(path), dtype="float32")
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data, sr


class AudioDataset:
    """Glob audio files under a folder (reference data.py:26-53 globs
    `**/*.flac`; here the extension is configurable and .wav needs no extra
    deps)."""

    def __init__(self, folder, audio_extension: str = ".flac", sample_rate: Optional[int] = None):
        path = Path(folder)
        assert path.exists(), "folder does not exist"
        self.audio_extension = audio_extension
        self.sample_rate = sample_rate
        files = sorted(path.glob(f"**/*{audio_extension}"))
        assert len(files) > 0, "no files found"
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx) -> np.ndarray:
        wave, sr = load_audio(self.files[idx])
        if self.sample_rate is not None and sr != self.sample_rate:
            from ..ops.stft import resample_np

            wave = resample_np(wave, sr, self.sample_rate)
        return wave

    def item_length(self, idx) -> int:
        """Length (samples at the output rate) WITHOUT decoding the audio —
        header-only for .wav. Used by the process-sharded DataLoader to agree
        on bucket shapes across hosts without every host decoding every item
        (consistency across processes is what matters: all hosts compute the
        same number from the same header). Cached per index."""
        cache = getattr(self, "_length_cache", None)
        if cache is None:
            cache = self._length_cache = {}
        if idx in cache:
            return cache[idx]
        path = self.files[idx]
        n = sr = None
        if path.suffix.lower() == ".wav":
            import wave as wave_mod

            try:
                with wave_mod.open(str(path), "rb") as w:
                    n, sr = w.getnframes(), w.getframerate()
            except Exception:
                pass
        elif path.suffix.lower() == ".flac":
            from ..native import flac_info

            info = flac_info(path)  # STREAMINFO total, header-only
            if info is not None:
                n, sr = info
        if n is None:  # unknown format or unreadable header: decode once
            n = len(self[idx])
            sr = self.sample_rate
        if self.sample_rate is not None and sr != self.sample_rate:
            # same output-length rule as ops/stft.resample_np
            n = int(round(n * self.sample_rate / sr))
        cache[idx] = int(n)
        return cache[idx]


class ArrayDataset:
    """In-memory dataset of numpy arrays (waves `(n,)` or latents `(n, d)`) —
    the jit-friendly analogue of the README's mock-random-data smoke paths."""

    def __init__(self, arrays: Sequence[np.ndarray]):
        self.arrays = [np.asarray(a) for a in arrays]

    def __len__(self):
        return len(self.arrays)

    def __getitem__(self, idx):
        return self.arrays[idx]

    def item_length(self, idx) -> int:
        return int(self.arrays[idx].shape[0])


class PairedDataset:
    """In-memory dataset of K-field tuples — (text_ids, semantic_ids) pairs
    for the seq2seq trainer, (phoneme_ids, wave-or-latents) for the duration
    trainer. Non-string fields coerce to numpy; strings pass through (the
    trainers tokenize them)."""

    def __init__(self, items: Sequence[tuple]):
        self.items = [
            tuple(f if isinstance(f, str) else np.asarray(f) for f in it)
            for it in items
        ]
        assert len(self.items) > 0, "empty dataset"
        n_fields = len(self.items[0])
        assert all(len(it) == n_fields for it in self.items), (
            "all items must have the same number of fields"
        )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return self.items[idx]


class SpeechTextDataset:
    """Audio files paired with same-stem transcript sidecars — the standard
    LibriTTS/LJSpeech-style layout (`x.flac` + `x.txt`) the reference pipeline
    assumes its users bring for the text→semantic / duration stages
    (voicebox_pytorch.py:1127-1150 consume texts alongside audio). Yields
    `(text: str, wave: np.float32[n])`."""

    def __init__(self, folder, audio_extension: str = ".flac",
                 text_extension: str = ".txt",
                 sample_rate: Optional[int] = None):
        path = Path(folder)
        assert path.exists(), "folder does not exist"
        self.sample_rate = sample_rate
        files = []
        for audio in sorted(path.glob(f"**/*{audio_extension}")):
            txt = audio.with_suffix(text_extension)
            if txt.exists():
                files.append((audio, txt))
        assert len(files) > 0, (
            f"no ({audio_extension}, {text_extension}) pairs under {folder}"
        )
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        audio_path, txt_path = self.files[idx]
        wave, sr = load_audio(audio_path)
        if self.sample_rate is not None and sr != self.sample_rate:
            from ..ops.stft import resample_np

            wave = resample_np(wave, sr, self.sample_rate)
        text = txt_path.read_text().strip()
        return text, wave


class AlignedPairedDataLoader:
    """Batches `(latents, frame_aligned_cond_ids)` pairs on ONE shared bucket
    grid — both fields pad to the same target length so the conditioning ids
    keep their frame alignment (padding them to independent grids would
    stretch the ids relative to the latents when the model interpolates the
    conditioning embedding to the latent length). This is VoiceBoxTrainer's
    precomputed-conditioning mode: training the CFM denoiser on aligned
    phoneme ids (the duration pipeline, reference voicebox_pytorch.py:
    1231-1241) or offline-extracted semantic ids resampled to frame rate.

    Yields `((latents, mask), (ids, mask))` — one mask, since lengths are
    equal by contract (asserted per item). Uses the same register-offset
    bucket grid as `DataLoader` (`_bucket_target`)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        bucket_multiple: int = 256,
        bucket_offset: int = 0,
        align_multiple: int = 128,
        max_length: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.bucket_multiple = bucket_multiple
        self.bucket_offset = bucket_offset
        self.align_multiple = align_multiple
        self.max_length = max_length
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __iter__(self):
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                idx = np.concatenate(
                    [idx, np.resize(order, self.batch_size - len(idx))]
                )
            rows = [self.dataset[int(i)] for i in idx]
            for x, ids in rows:
                assert np.shape(x)[0] == np.shape(ids)[0], (
                    f"aligned pairs must have equal lengths per item, got "
                    f"latents {np.shape(x)[0]} vs ids {np.shape(ids)[0]}"
                )
            target = _bucket_target(
                max(np.shape(x)[0] for x, _ in rows),
                self.bucket_multiple, self.bucket_offset, self.align_multiple,
            )
            if self.max_length is not None and target > self.max_length:
                # snap the cap DOWN onto the offset grid (same rule as
                # collate_with_mask) so a legacy k*multiple max_length with
                # bucket_offset>0 doesn't silently reintroduce the
                # misaligned post-register tile the grid exists to avoid
                snapped = ((self.max_length + self.bucket_offset)
                           // self.bucket_multiple * self.bucket_multiple
                           - self.bucket_offset)
                target = snapped if 0 < snapped else self.max_length
            xs, mask = collate_with_mask(
                [np.asarray(x) for x, _ in rows], force_target=target
            )
            # -1 = the framework's id pad convention (see PairedDataLoader);
            # pad positions must not carry a real vocabulary id (0)
            ids = np.full((len(rows), target), -1, dtype=np.int32)
            for i, (_, row_ids) in enumerate(rows):
                m = min(np.shape(row_ids)[0], target)
                ids[i, :m] = np.asarray(row_ids)[:m]
            yield (xs, mask), (ids, mask)

    def cycle(self):
        while True:
            yield from iter(self)


class PairedDataLoader:
    """Shuffling batch iterator over K-field tuple datasets, with an
    INDEPENDENT bucket grid per field — the static-shape requirement of the
    seq2seq/duration trainers, where text length and audio length vary
    independently (program count is bounded by the product of per-field
    bucket counts, each small).

    Yields a tuple of `(padded, mask)` per field. Integer fields pad with
    `pad_values[i]` (-1 = the framework's id pad convention); float fields
    pad with 0. 1-D int fields, 1-D waves, and 2-D `(n, d)` latents are all
    supported (length is axis 0).

    Multi-host SPMD (`shard=(rank, world)`, mirroring `DataLoader`): every
    process runs the same-seeded loader, MATERIALISES the full batch's items
    to agree on the per-field bucket targets (token/latent items are cheap —
    unlike `DataLoader`'s audio datasets there is no header-only length
    shortcut for arbitrary tuple fields), and yields only its rank-block of
    `shard_group_size/world` rows inside each group of `shard_group_size`
    (default: the whole batch); the trainer assembles the global jax.Array
    with `jax.make_array_from_process_local_data`."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        bucket_multiples: Sequence[int],
        pad_values: Optional[Sequence] = None,
        max_lengths: Optional[Sequence[Optional[int]]] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        shard: Optional[Tuple[int, int]] = None,
        shard_group_size: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.bucket_multiples = tuple(bucket_multiples)
        k = len(self.bucket_multiples)
        self.pad_values = tuple(pad_values) if pad_values is not None else (0,) * k
        self.max_lengths = tuple(max_lengths) if max_lengths is not None else (None,) * k
        assert len(self.pad_values) == k and len(self.max_lengths) == k
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        if shard is not None:
            rank, world = shard
            assert 0 <= rank < world, shard
            group = shard_group_size if shard_group_size is not None else batch_size
            assert batch_size % group == 0, (batch_size, group)
            assert group % world == 0, (
                f"micro-batch group {group} must divide over {world} processes"
            )
        self.shard = shard
        self.shard_group_size = shard_group_size

    def _local_positions(self, n_rows: int) -> np.ndarray:
        """Positions within the global batch this process yields: its
        rank-block inside each `shard_group_size` group (same grouping as
        `DataLoader._local_rows`, matching the (accum, micro) reshape)."""
        if self.shard is None:
            return np.arange(n_rows)
        rank, world = self.shard
        group = self.shard_group_size or self.batch_size
        block = group // world
        out = []
        for g_start in range(0, n_rows, group):
            lo = g_start + rank * block
            out.append(np.arange(lo, lo + block))
        return np.concatenate(out)

    def _collate_field(self, items: List[np.ndarray], multiple: int,
                       pad_value, max_length: Optional[int],
                       force_target: Optional[int] = None):
        if force_target is not None:
            target = force_target
        else:
            target = pad_to_multiple(max(it.shape[0] for it in items), multiple)
        if max_length is not None and target > max_length:
            target = max_length
        batch = np.full(
            (len(items), target, *items[0].shape[1:]), pad_value,
            dtype=items[0].dtype,
        )
        mask = np.zeros((len(items), target), dtype=bool)
        for i, it in enumerate(items):
            n = min(it.shape[0], target)
            batch[i, :n] = it[:n]
            mask[i, :n] = True
        return batch, mask

    def __iter__(self):
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                # static batch shape: wrap around rather than going ragged
                idx = np.concatenate(
                    [idx, np.resize(order, self.batch_size - len(idx))]
                )
            rows = [self.dataset[int(i)] for i in idx]
            if self.shard is not None:
                # per-field targets from the FULL batch (all hosts agree),
                # then collate only this process's rank-block rows
                local = self._local_positions(len(rows))
                yield tuple(
                    self._collate_field(
                        [np.asarray(rows[int(p)][f]) for p in local],
                        self.bucket_multiples[f], self.pad_values[f],
                        self.max_lengths[f],
                        force_target=pad_to_multiple(
                            max(np.asarray(row[f]).shape[0] for row in rows),
                            self.bucket_multiples[f],
                        ),
                    )
                    for f in range(len(self.bucket_multiples))
                )
                continue
            yield tuple(
                self._collate_field(
                    [np.asarray(row[f]) for row in rows],
                    self.bucket_multiples[f], self.pad_values[f],
                    self.max_lengths[f],
                )
                for f in range(len(self.bucket_multiples))
            )

    def cycle(self):
        while True:
            yield from iter(self)


def random_split(dataset, valid_frac: float, seed: int = 42):
    """95/5-style split with a fixed seed (reference trainer.py:126-133)."""
    n = len(dataset)
    n_train = int((1 - valid_frac) * n)
    perm = np.random.RandomState(seed).permutation(n)
    train_idx, valid_idx = perm[:n_train], perm[n_train:]
    return _Subset(dataset, train_idx), _Subset(dataset, valid_idx)


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]

    def item_length(self, idx) -> int:
        return _item_length(self.dataset, self.indices[idx])


class TokenizedTextDataset:
    """Dataset view over K-field tuple items: a str FIRST field tokenizes to
    a pad-free int32 id array (cached — host string work runs once per item,
    not once per epoch); every other field passes through as an np array.
    Shared by the stage trainers (`StageTrainer._setup_paired_loaders`)."""

    def __init__(self, dataset, tokenizer):
        self.dataset = dataset
        self.tokenizer = tokenizer
        self._cache: dict = {}

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        row = self.dataset[idx]
        first, rest = row[0], row[1:]
        if isinstance(first, str):
            ids = self._cache.get(idx)
            if ids is None:
                assert self.tokenizer is not None, (
                    "dataset yields raw text but the model has no tokenizer"
                )
                arr = np.asarray(
                    self.tokenizer.texts_to_tensor_ids([first]),
                    dtype=np.int32,
                )[0]
                ids = self._cache[idx] = arr[arr != -1]
            first = ids
        return (np.asarray(first), *(np.asarray(f) for f in rest))


def _item_length(dataset, idx) -> int:
    """Length of item `idx` along axis 0, via the dataset's cheap
    `item_length` accessor when it has one, else by decoding."""
    fn = getattr(dataset, "item_length", None)
    if fn is not None:
        return int(fn(idx))
    return int(np.asarray(dataset[idx]).shape[0])


def pad_to_multiple(length: int, multiple: int) -> int:
    return int(math.ceil(length / multiple)) * multiple


def _bucket_target(max_len: int, multiple: int, offset: int, align: int) -> int:
    """Pick the bucket length for a batch whose longest item is `max_len`.

    Two candidate grids: the legacy `k*multiple` grid and the register-offset
    `k*multiple - offset` grid. The winner is whichever yields the smaller
    *effective model length* `pad(t + offset, align)` — i.e. what XLA will
    actually tile after the model prepends its register tokens — tie-broken by
    less data padding. This keeps datasets curated to exact `k*multiple`
    lengths (e.g. items of exactly 256 frames) from being pushed a whole
    bucket up, while still aligning variable-length data."""
    t0 = pad_to_multiple(max_len, multiple)
    if offset <= 0:
        return t0
    t1 = pad_to_multiple(max_len + offset, multiple) - offset
    cost = lambda t: pad_to_multiple(t + offset, align)
    return min((t0, t1), key=lambda t: (cost(t), t))


def collate_with_mask(
    items: List[np.ndarray],
    bucket_multiple: int = 256,
    pad_to_longest: bool = True,
    max_length: Optional[int] = None,
    bucket_offset: int = 0,
    align_multiple: int = 128,
    force_target: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length items into (batch, mask).

    pad_to_longest=True: pad to the bucketed max length (static-shape analogue
    of data.py:85-87). False: curtail to the shortest (data.py:78-82).

    `bucket_offset` enables a second bucket grid at `k*multiple - offset`. TPU
    rationale: the transformer prepends `num_register_tokens` registers, so a
    128-aligned *data* length makes the *padded model* length misaligned —
    e.g. 768 frames + 16 registers = 784 tokens, which XLA pads to 896-wide
    tiles (measured 13% slower than an aligned 768 at dim 512/depth 12 on
    v5e). Each batch picks whichever grid gives the smaller post-register
    tile-padded length (`align_multiple` = 128 lanes, scaled by the codec
    downsample factor for raw-audio datasets) — see `_bucket_target`.
    """
    lengths = [it.shape[0] for it in items]
    if force_target is not None:
        # process-sharded loading: the caller supplies a globally-agreed
        # bucket length (computed from ALL rows' metadata, not just the
        # local ones); max_length capping still applies below
        target = force_target
        if max_length is not None and target > max_length:
            snapped = (max_length + bucket_offset) // bucket_multiple * bucket_multiple - bucket_offset
            target = snapped if 0 < snapped else max_length
    elif pad_to_longest:
        target = _bucket_target(max(lengths), bucket_multiple, bucket_offset, align_multiple)
        if max_length is not None and target > max_length:
            # snap the cap DOWN onto the offset grid so a legacy k*multiple
            # max_length doesn't silently reintroduce the misaligned shape
            snapped = (max_length + bucket_offset) // bucket_multiple * bucket_multiple - bucket_offset
            target = snapped if 0 < snapped else max_length
    else:
        target = min(lengths)

    batch = []
    mask = np.zeros((len(items), target), dtype=bool)
    for i, it in enumerate(items):
        n = min(it.shape[0], target)
        pad_width = [(0, target - n)] + [(0, 0)] * (it.ndim - 1)
        batch.append(np.pad(it[:n], pad_width))
        mask[i, :n] = True
    return np.stack(batch), mask


class DataLoader:
    """Infinite (or epoch-wise) shuffling batch iterator yielding
    (batch, mask) numpy pairs with bucketed static shapes.

    Multi-host SPMD (`shard=(rank, world)`): every process runs this loader
    with the SAME seed, so all agree on the item order, the global batch
    composition, and — via cheap `item_length` metadata, computed over ALL
    rows on every host — the bucketed batch length. Each process then decodes
    ONLY its own rows and yields a LOCAL `(batch_size/world, target)` batch,
    padded to the globally-agreed target; the trainer assembles the global
    jax.Array with `jax.make_array_from_process_local_data`. With
    `shard_group_size=g` (the trainer's micro-batch size), the global batch
    is treated as `batch_size/g` groups of `g` rows and the process takes its
    rank-block of `g/world` rows inside EACH group — matching how the
    (accum, micro) reshape maps micro rows onto the mesh's data axis."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        pad_to_longest: bool = True,
        bucket_multiple: int = 256,
        max_length: Optional[int] = None,
        drop_last: bool = False,
        bucket_offset: int = 0,
        align_multiple: int = 128,
        shard: Optional[Tuple[int, int]] = None,
        shard_group_size: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pad_to_longest = pad_to_longest
        self.bucket_multiple = bucket_multiple
        self.max_length = max_length
        self.drop_last = drop_last
        self.bucket_offset = bucket_offset
        self.align_multiple = align_multiple
        if shard is not None:
            rank, world = shard
            assert 0 <= rank < world, shard
            group = shard_group_size if shard_group_size is not None else batch_size
            assert batch_size % group == 0, (batch_size, group)
            assert group % world == 0, (
                f"micro-batch group {group} must divide over {world} processes"
            )
        self.shard = shard
        self.shard_group_size = shard_group_size

    def _local_rows(self, idx: np.ndarray) -> np.ndarray:
        """The rows of the global batch this process decodes (see class doc)."""
        if self.shard is None:
            return idx
        rank, world = self.shard
        group = self.shard_group_size or self.batch_size
        block = group // world
        out = []
        for g_start in range(0, len(idx), group):
            lo = g_start + rank * block
            out.append(idx[lo : lo + block])
        return np.concatenate(out)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                # static batch shape: wrap around (cycling as many times as
                # needed for batch_size > dataset size) instead of emitting a
                # ragged batch. Wrapped entries are duplicates — for unbiased
                # eval statistics use drop_last=True.
                idx = np.concatenate(
                    [idx, np.resize(order, self.batch_size - len(idx))]
                )
            if self.shard is not None and self.pad_to_longest:
                # bucket target from GLOBAL lengths (all hosts agree), decode
                # only the local rows, pad to the agreed target
                target = _bucket_target(
                    max(_item_length(self.dataset, int(i)) for i in idx),
                    self.bucket_multiple, self.bucket_offset,
                    self.align_multiple,
                )
                items = [
                    np.asarray(self.dataset[int(i)]) for i in self._local_rows(idx)
                ]
                yield collate_with_mask(
                    items,
                    bucket_multiple=self.bucket_multiple,
                    pad_to_longest=self.pad_to_longest,
                    max_length=self.max_length,
                    bucket_offset=self.bucket_offset,
                    align_multiple=self.align_multiple,
                    force_target=target,
                )
                continue
            items = [np.asarray(self.dataset[int(i)]) for i in self._local_rows(idx)]
            yield collate_with_mask(
                items,
                bucket_multiple=self.bucket_multiple,
                pad_to_longest=self.pad_to_longest,
                max_length=self.max_length,
                bucket_offset=self.bucket_offset,
                align_multiple=self.align_multiple,
            )

    def cycle(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield from iter(self)


def get_dataloader(ds, *, batch_size: int, pad_to_longest: bool = True, **kwargs) -> DataLoader:
    """Reference-parity constructor (data.py:89-91)."""
    return DataLoader(ds, batch_size=batch_size, pad_to_longest=pad_to_longest, **kwargs)


class PrefetchLoader:
    """Bounded background-thread prefetch around any (batch, mask) iterable —
    the SPMD-side equivalent of the reference DataLoader's worker processes
    (data.py:89-91 relies on torch's loader workers): audio decode + collation
    for batch k+1 overlaps device compute for batch k. The native threaded WAV
    decoder (native/wavio.cpp) releases the GIL, so the overlap is real even
    on a single host core.

    Wraps either a `DataLoader` (exposing both epoch `__iter__` and infinite
    `cycle()`) or any plain iterable (epoch only). Producer exceptions
    re-raise in the consumer; abandoning the iterator mid-epoch unblocks and
    stops the producer thread."""

    _SENTINEL = object()

    def __init__(self, loader, prefetch: int = 2):
        assert prefetch >= 1
        self.loader = loader
        self.prefetch = prefetch

    def _iterate(self, source) -> Iterator:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:  # False if the consumer went away
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in source:
                    if not _put((None, item)):
                        return
                _put((self._SENTINEL, None))
            except BaseException as e:  # re-raised consumer-side
                _put((e, None))

        t = threading.Thread(target=producer, daemon=True,
                             name="voicebox-prefetch")
        t.start()
        try:
            while True:
                flag, item = q.get()
                if flag is self._SENTINEL:
                    return
                if flag is not None:
                    raise flag
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator:
        return self._iterate(iter(self.loader))

    def cycle(self) -> Iterator:
        if hasattr(self.loader, "cycle"):
            return self._iterate(self.loader.cycle())

        def forever():
            while True:
                yield from iter(self.loader)

        return self._iterate(forever())
