"""Dynamic batching under concurrent load — measured on the real chip.

A server receives requests one at a time; `serving.DynamicBatcher` coalesces
them into the engine's pre-compiled bucket batches. This benchmark drives the
same offered load through (a) sequential batch-1 calls and (b) the batcher,
and reports throughput + p50/p95 latency.

Uses precomputed semantic ids via a tiny deterministic TextToSemantic so the
measured work is the CFM+vocoder pipeline (the AR stage is measured
separately; PERFORMANCE.md).

Run on the TPU:  python benchmarks/dynamic_batching.py
"""

import json
import sys
import threading
import time

sys.path.insert(0, ".")

import jax
import numpy as np

N_REQUESTS = 32
TEXT = "the quick brown fox jumps over the lazy dog"


def build_engine():
    import jax.numpy as jnp

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.hubert import HubertWithKmeans
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.serving import TTSEngine
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    w2v = HubertWithKmeans(num_clusters=500, dim=64, depth=2, heads=4)
    tts = TextToSemantic(dim=256, source_depth=4, target_depth=4, heads=4,
                         dim_head=64, wav2vec=w2v,
                         tokenizer=GraphemeTokenizer())
    tts.init_params(jax.random.PRNGKey(0))
    vb = VoiceBox(
        num_cond_tokens=500, dim_in=128, dim_cond_emb=512, dim=512, depth=24,
        dim_head=128, heads=4, num_register_tokens=16, attn_qk_norm=True,
        condition_on_text=True, dtype=jnp.bfloat16,
    )
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(1), seq_len=64, batch=1)
    return TTSEngine(
        cfm,
        text_buckets=(64,),
        batch_buckets=(1, 2, 4, 8),
        steps=3,
        max_semantic_token_ids=768,
        spec_decode=False,
        decode_to_audio=False,  # isolate the transformer pipeline
    )


def drive_sequential(engine):
    lat = []
    t0 = time.perf_counter()
    for i in range(N_REQUESTS):
        s = time.perf_counter()
        clips = engine.synthesize([TEXT], rng=jax.random.PRNGKey(i),
                                  trim=True)
        np.asarray(clips[0])
        lat.append(time.perf_counter() - s)
    return time.perf_counter() - t0, lat


def drive_batched(engine, max_wait_ms=25.0, workers=8):
    from voicebox_tpu.serving import DynamicBatcher

    lat = []
    lock = threading.Lock()

    with DynamicBatcher(engine, max_wait_ms=max_wait_ms) as batcher:
        def client(k):
            for i in range(N_REQUESTS // workers):
                s = time.perf_counter()
                np.asarray(batcher.synthesize(TEXT, timeout=600))
                with lock:
                    lat.append(time.perf_counter() - s)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        occ = batcher.mean_occupancy
    return wall, lat, occ


def main():
    print("backend:", jax.default_backend(), flush=True)
    engine = build_engine()
    warm = engine.warmup()
    print(f"warmup {warm:.1f}s", flush=True)

    seq_wall, seq_lat = drive_sequential(engine)
    bat_wall, bat_lat, occ = drive_batched(engine)

    def pct(xs, p):
        return float(np.percentile(np.asarray(xs), p))

    print(json.dumps({
        "metric": "serving_throughput_requests_per_s",
        "n_requests": N_REQUESTS,
        "sequential": {
            "req_per_s": round(N_REQUESTS / seq_wall, 2),
            "p50_ms": round(1e3 * pct(seq_lat, 50), 1),
            "p95_ms": round(1e3 * pct(seq_lat, 95), 1),
        },
        "dynamic_batched": {
            "req_per_s": round(N_REQUESTS / bat_wall, 2),
            "p50_ms": round(1e3 * pct(bat_lat, 50), 1),
            "p95_ms": round(1e3 * pct(bat_lat, 95), 1),
            "mean_batch_occupancy": round(occ, 2),
        },
        "speedup": round(seq_wall / bat_wall, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
