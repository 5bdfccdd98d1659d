"""Multi-process (multi-controller) sequence-parallelism worker.

Spawned by tests/test_multiproc_sp.py: TWO processes x 4 virtual CPU devices
= an 8-device global mesh spanning a process boundary — the CPU stand-in for
a multi-host TPU pod (ring collectives ride the distributed runtime instead
of ICI; jax multi-controller semantics are identical). Stages:

A. library level: `make_sp_loss_fn` loss + grads on the cross-process 'seq'
   mesh must match the LOCAL single-device plain model (same tolerances as
   the in-process tests/test_sequence_parallel.py parity test).
B. trainer level: `VoiceBoxTrainer(seq_parallel=4)` under process_count=2
   runs two optimizer steps — exercises the multi-host SP input path
   (full-global-batch decode + per-device tile pulls in `_put_global`).

Usage: python tests/mp_sp_worker.py <process_id> <port> <tmpdir>
Prints `MP_SP_OK loss=<v>` and `MP_TRAINER_OK steps=2` on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from voicebox_tpu import VoiceBox
    from voicebox_tpu.parallel.sequence_parallel import (
        make_sp_loss_fn,
        make_sp_pair,
    )

    assert jax.process_count() == 2
    devs = jax.devices()
    assert len(devs) == 8, devs
    mesh = Mesh(np.array(devs), ("seq",))

    def glob(arr, spec):
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    def local(x):
        """Fetch a fully-replicated global array's value from a local shard."""
        return np.asarray(x.addressable_shards[0].data)

    # ---------------- stage A: SP loss/grad parity across processes -------
    plain, sp = make_sp_pair(
        VoiceBox, dim_in=8, dim=32, depth=2, dim_head=8, heads=4,
        num_register_tokens=2, conv_pos_embed_kernel_size=7,
        condition_on_text=False,
    )
    b, n = 2, 64
    rs = np.random.RandomState(0)
    x1 = rs.randn(b, n, 8).astype(np.float32)
    x0 = rs.randn(b, n, 8).astype(np.float32)
    times = rs.rand(b).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    params = plain.init(
        {"params": jax.random.PRNGKey(2)}, jnp.asarray(x1),
        times=jnp.asarray(times), target=jnp.asarray(x1 - x0),
        cond=jnp.asarray(x1), cond_mask=jnp.ones((b, n), bool),
        cond_drop_mask=jnp.zeros((b,), bool), cond_drop_prob=0.0,
    )["params"]

    def plain_loss(params, rng, x1, x0, times):
        # make_sp_loss_fn's exact RNG recipe (tests/test_sequence_parallel.py)
        from voicebox_tpu.ops.masks import mask_from_frac_lengths, prob_mask_like

        k_frac, k_span, k_drop = jax.random.split(rng, 3)
        t = times[:, None, None]
        w = (1.0 - t) * x0 + t * x1
        flow = x1 - x0
        lo, hi = sp.frac_lengths_mask
        frac = jax.random.uniform(k_frac, (b,), minval=lo, maxval=hi)
        cond_mask = mask_from_frac_lengths(k_span, n, frac)
        drop = prob_mask_like(k_drop, (b,), 0.25)
        return plain.apply(
            {"params": params}, w, times=times, target=flow,
            cond_mask=cond_mask, cond_drop_mask=drop,
            self_attn_mask=jnp.ones((b, n), bool), cond_drop_prob=0.0,
        )

    l_ref, g_ref = jax.jit(jax.value_and_grad(plain_loss))(
        params, rng, jnp.asarray(x1), jnp.asarray(x0), jnp.asarray(times)
    )

    sp_loss = make_sp_loss_fn(sp, mesh, cond_drop_prob=0.25)
    params_g = jax.tree.map(lambda a: glob(a, P()), params)
    l_sp, g_sp = jax.jit(jax.value_and_grad(sp_loss))(
        params_g,
        glob(jax.random.key_data(rng), P()),
        glob(x1, P(None, "seq", None)),
        glob(x0, P(None, "seq", None)),
        glob(times, P()),
        None,
    )

    l_ref_v, l_sp_v = float(np.asarray(l_ref)), float(local(l_sp))
    assert np.isfinite(l_sp_v)
    np.testing.assert_allclose(l_sp_v, l_ref_v, rtol=1e-4)
    for a, bb in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        a, bb = np.asarray(a), local(bb)
        ref_n = np.linalg.norm(a.ravel())
        diff_n = np.linalg.norm((bb - a).ravel())
        assert diff_n <= 1e-2 * max(ref_n, 1e-3), (
            f"grad leaf rel-norm diff {diff_n / max(ref_n, 1e-12):.3e}"
        )
    print(f"MP_SP_OK loss={l_sp_v:.6f}", flush=True)

    # ---------------- stage B: trainer with seq_parallel across processes -
    # The (2, 4) mesh is PROCESS-ALIGNED (each row's seq slices on one host),
    # so the trainer must take the row-sharded loader path: each process
    # decodes ONLY its own batch rows (VERDICT r3 item 6).
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper
    from voicebox_tpu.training.data import ArrayDataset
    from voicebox_tpu.training.trainer import VoiceBoxTrainer

    class CountingDataset:
        """ArrayDataset + decode counter; item_length stays decode-free so
        the global bucket agreement doesn't count as decoding."""

        def __init__(self, items):
            self.items = items
            self.decodes = 0

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            self.decodes += 1
            return self.items[i]

        def item_length(self, i):
            return len(self.items[i])

    vb = VoiceBox(dim_in=8, dim=32, depth=2, dim_head=8, heads=4,
                  num_register_tokens=2, conv_pos_embed_kernel_size=7,
                  condition_on_text=False)
    cfm = ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
    items = [np.random.RandomState(i).randn(64, 8).astype(np.float32)
             for i in range(16)]
    ds = CountingDataset(items)
    tr = VoiceBoxTrainer(
        cfm, batch_size=2, dataset=ds, num_train_steps=2, valid_frac=0.25,
        results_folder=os.path.join(tmp, f"res{pid}"), seq_parallel=4,
        bucket_multiple=16, bucket_offset=0, save_model_every=100,
        save_results_every=100, prefetch_batches=0,
    )
    assert tr.mesh.shape == {"data": 2, "seq": 4}
    assert tr._sp_process_aligned, "2x4 over 2 procs must be aligned"
    assert not tr._mh_full_batch, (
        "aligned multi-host SP must use the row-sharded loader"
    )

    # content parity of the row-sharded global assembly: the global-mean of
    # the assembled batch (a cross-process jit reduction) must equal the
    # same-seeded UNSHARDED loader's batch mean computed host-side
    from voicebox_tpu.training.data import DataLoader as _DL, random_split

    # unsharded reference loader: same split/seed/shape config as the
    # trainer's, but decoding EVERY row on this host
    ref_train, _ = random_split(list(items), 0.25, 42)
    ref_dl = _DL(ref_train, batch_size=2, shuffle=True, seed=0,
                 bucket_multiple=16, bucket_offset=0)
    ref_wave, _ = next(iter(ref_dl))
    wave, mask = next(tr.dl_iter)
    x, m, _ = tr._prepare_batch(wave, mask)
    gmean = jax.jit(
        jnp.mean,
        out_shardings=NamedSharding(tr.mesh, P()),
    )(x)
    gmean = float(np.asarray(gmean.addressable_shards[0].data))
    np.testing.assert_allclose(gmean, float(ref_wave.mean()), rtol=1e-5)

    before = ds.decodes
    tr.train()
    assert tr.steps == 2
    decoded = ds.decodes
    # 2 train steps x 2 global rows + 1 valid batch x 2 rows = 6 global rows;
    # a row-sharded process decodes HALF (the content-parity probe above
    # consumed one extra local batch before training)
    assert decoded <= before + 4, (
        f"process decoded {decoded - before} rows during training — "
        "expected only its own (<= 3 batches x 1 local row + slack)"
    )
    print(f"MP_TRAINER_OK steps=2 decodes={decoded}", flush=True)

    # ---------------- stage C: row-spanning mesh falls back to full decode -
    cfm2 = ConditionalFlowMatcherWrapper(
        VoiceBox(dim_in=8, dim=32, depth=2, dim_head=8, heads=4,
                 num_register_tokens=2, conv_pos_embed_kernel_size=7,
                 condition_on_text=False), cond_drop_prob=0.2,
    )
    cfm2.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
    tr2 = VoiceBoxTrainer(
        cfm2, batch_size=2, dataset=CountingDataset(items), num_train_steps=1,
        valid_frac=0.25, results_folder=os.path.join(tmp, f"res{pid}_sp8"),
        seq_parallel=8, bucket_multiple=16, bucket_offset=0,
        save_model_every=100, save_results_every=100, prefetch_batches=0,
    )
    assert tr2.mesh.shape == {"data": 1, "seq": 8}
    assert not tr2._sp_process_aligned  # rows span both processes
    assert tr2._mh_full_batch, "row-spanning SP must take the full-batch path"
    tr2.train()
    assert tr2.steps == 1
    print("MP_FALLBACK_OK steps=1", flush=True)


if __name__ == "__main__":
    main()
