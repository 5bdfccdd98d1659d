"""Process-sharded data loading (multi-host SPMD readiness).

True multi-process execution isn't available in this image, so these tests
pin the pieces that make multi-host correct by construction: every rank's
same-seeded loader agrees on batch composition and bucket shapes while
decoding only its own rows; ranks reassemble exactly the unsharded batch; and
the single-process `jax.make_array_from_process_local_data` degenerate case
equals a plain sharded device_put.
"""

import jax
import jax.numpy as jnp
import numpy as np

from voicebox_tpu.training.data import (
    ArrayDataset,
    DataLoader,
    collate_with_mask,
    random_split,
)


def _ds(n=32, seed=0):
    rs = np.random.RandomState(seed)
    return ArrayDataset([rs.randn(rs.randint(40, 200), 4) for _ in range(n)])


def test_item_length_accessors():
    ds = _ds()
    assert ds.item_length(3) == ds[3].shape[0]
    train, valid = random_split(ds, 0.25, seed=1)
    assert train.item_length(0) == train[0].shape[0]


def test_collate_force_target():
    items = [np.ones((100, 4)), np.ones((50, 4))]
    batch, mask = collate_with_mask(items, bucket_multiple=64, force_target=192)
    assert batch.shape == (2, 192, 4)
    assert mask.sum(-1).tolist() == [100, 50]


def test_sharded_ranks_reassemble_global_batch():
    ds = _ds()
    world, batch, group = 4, 16, 8  # 2 groups of 8 (accum=2, micro=8)
    full = DataLoader(ds, batch_size=batch, seed=7, bucket_multiple=64)
    rank_loaders = [
        DataLoader(ds, batch_size=batch, seed=7, bucket_multiple=64,
                   shard=(r, world), shard_group_size=group)
        for r in range(world)
    ]
    for (gb, gm), *locals_ in zip(iter(full), *(iter(l) for l in rank_loaders)):
        block = group // world
        for g in range(batch // group):
            for r in range(world):
                lb, lm = locals_[r]
                # every rank agrees on the bucketed shape without decoding
                # the other ranks' rows
                assert lb.shape[1] == gb.shape[1]
                lo_local = g * block
                lo_global = g * group + r * block
                np.testing.assert_array_equal(
                    lb[lo_local : lo_local + block],
                    gb[lo_global : lo_global + block],
                )
                np.testing.assert_array_equal(
                    lm[lo_local : lo_local + block],
                    gm[lo_global : lo_global + block],
                )


def test_sharded_wraparound_batch_agrees():
    ds = _ds(n=5)  # batch 8 > dataset: exercises the wrap-around fill
    world = 2
    full = next(iter(DataLoader(ds, batch_size=8, seed=3, bucket_multiple=64)))
    parts = [
        next(iter(DataLoader(ds, batch_size=8, seed=3, bucket_multiple=64,
                             shard=(r, world))))
        for r in range(world)
    ]
    gb, gm = full
    np.testing.assert_array_equal(np.concatenate([p[0] for p in parts]), gb)
    np.testing.assert_array_equal(np.concatenate([p[1] for p in parts]), gm)


def test_make_array_from_process_local_data_single_process():
    # the degenerate single-process case must equal a plain sharded put —
    # this is exactly what the trainer's _put_global does per process
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices.reshape(8), ("data",))
    sharding = NamedSharding(mesh, P(None, "data"))
    local = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    global_arr = jax.make_array_from_process_local_data(sharding, local)
    direct = jax.device_put(local, sharding)
    assert global_arr.shape == direct.shape == (2, 8, 3)
    np.testing.assert_array_equal(np.asarray(global_arr), np.asarray(direct))


def test_trainer_flat_valid_prep_shapes():
    # _prepare_batch(flat=True) yields (b, n, ...) with the data-axis sharding
    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.parallel.mesh import make_mesh
    from voicebox_tpu.training.trainer import VoiceBoxTrainer

    vb = VoiceBox(dim_in=8, dim=16, depth=2, dim_head=8, heads=2,
                  num_register_tokens=2, condition_on_text=False)
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
    ds = ArrayDataset([np.random.RandomState(i).randn(16, 8) for i in range(48)])
    tr = VoiceBoxTrainer(
        cfm, batch_size=8, dataset=ds, num_train_steps=1, valid_frac=0.25,
        results_folder="/tmp/mh_flat", mesh=make_mesh(), grad_accum_every=2,
        bucket_multiple=16, prefetch_batches=0,
    )
    wave, mask = next(iter(tr.valid_dl))
    x, m, ids = tr._prepare_batch_flat(wave, mask)
    assert x.ndim == 3 and x.shape[0] == 8  # flat (b, n, d)
    assert m.shape == (8, 16)
    # and one full train step (incl the step-0 valid eval) still runs
    tr.train_step()
