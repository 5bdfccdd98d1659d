"""Measure quantize= on the TextToSemantic AR decode (real TPU).

The m=1-token decode step is weight-HBM-bound: every step reads the whole
decoder (+ vocab head) from HBM, so int8 weights cut per-token latency by
the weight-read ratio (4x vs the f32 params the facade keeps by default,
2x vs a bf16-params deployment). Modes measured at dim 512, 6+6 layers,
256-token outputs, batch 1 — plain greedy vs quantize="w8a16"/"int8", and
the speculative x w8a16 composition.

Timing per CLAUDE.md rules: programs end in a fetched scalar, fresh inputs
per call (varied text), min over repeats.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from voicebox_tpu.models.text_to_semantic import TextToSemantic

MAX_LEN = 256
VOCAB_TEXT, VOCAB_SEM = 256, 1024


def bench(tts, reps=6, **kw):
    def one(i):
        src = jnp.full((1, 32), (7 + i) % VOCAB_TEXT, dtype=jnp.int32)
        toks = tts.generate(src, max_length=MAX_LEN, **kw)
        return int(jnp.sum(toks))

    one(0)  # compile (+ param surgery, cached)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        one(i + 1)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    return t, MAX_LEN / t


def main():
    print("backend:", jax.default_backend(), flush=True)
    tts = TextToSemantic(
        dim=512, num_text_token_ids=VOCAB_TEXT,
        num_semantic_token_ids=VOCAB_SEM, source_depth=6, target_depth=6,
        heads=8, dim_head=64,
    )
    tts.init_params(jax.random.PRNGKey(0))
    n_dec = sum(
        x.size for k in list(tts.params) + ["to_logits"]
        if k.startswith("dec_") or k == "to_logits"
        for x in jax.tree.leaves(tts.params[k])
    )
    print(f"decoder+head params: {n_dec/1e6:.1f}M "
          f"({n_dec*4/1e6:.0f} MB f32 read per decode step)", flush=True)

    t0, tok0 = bench(tts)
    print(f"greedy f32      : {t0*1e3:7.1f} ms  {tok0:7.0f} tok/s", flush=True)
    for mode in ("w8a16", "int8"):
        t, tok = bench(tts, quantize=mode)
        print(f"greedy {mode:7s}: {t*1e3:7.1f} ms  {tok:7.0f} tok/s "
              f"({t0/t:0.2f}x)", flush=True)
    ts_, tok_s = bench(tts, spec_decode=True, spec_decode_gamma=5)
    print(f"spec   f32      : {ts_*1e3:7.1f} ms  {tok_s:7.0f} tok/s "
          f"({t0/ts_:0.2f}x)", flush=True)
    tsq, tok_sq = bench(tts, spec_decode=True, spec_decode_gamma=5,
                        quantize="w8a16")
    print(f"spec   w8a16    : {tsq*1e3:7.1f} ms  {tok_sq:7.0f} tok/s "
          f"({t0/tsq:0.2f}x)", flush=True)


if __name__ == "__main__":
    main()
