"""Minimal production-style HTTP TTS server — stdlib only.

Wires `TTSEngine` (pre-compiled bucket programs, zero request-path compiles)
behind `DynamicBatcher` (concurrent requests coalesce into batched device
programs) behind a threading HTTP server: every concurrent POST is a separate
server thread, and the batcher funnels them onto the single device worker.

    python examples/serve_http.py [port]

    curl -s -X POST localhost:8080/synthesize -d '{"text": "hello world"}' \
         -o out.wav
    curl -s localhost:8080/healthz

Demo weights are random — the audio is noise; swap in a trained checkpoint
via ConditionalFlowMatcherWrapper.load / load_torch for real speech.
"""

import io
import json
import struct
import sys
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_engine():
    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.hubert import HubertWithKmeans
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.serving import TTSEngine
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    w2v = HubertWithKmeans(num_clusters=500, dim=64, depth=2, heads=4)
    tts = TextToSemantic(dim=256, source_depth=4, target_depth=4, heads=4,
                         dim_head=64, wav2vec=w2v,
                         tokenizer=GraphemeTokenizer())
    tts.init_params(jax.random.PRNGKey(0))
    vb = VoiceBox(
        num_cond_tokens=500, dim_in=128, dim_cond_emb=512, dim=512, depth=8,
        dim_head=128, heads=4, num_register_tokens=16, attn_qk_norm=True,
        condition_on_text=True, dtype=dtype,
    )
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(1), seq_len=64, batch=1)
    return TTSEngine(
        cfm, text_buckets=(32, 64), batch_buckets=(1, 2, 4),
        steps=3, max_semantic_token_ids=512, spec_decode=False,
        decode_to_audio=False,  # random demo weights; no codec attached
    )


def to_wav_bytes(x: np.ndarray, sample_rate: int = 24000) -> bytes:
    """float waveform (or latents, flattened for the demo) -> 16-bit WAV."""
    x = np.asarray(x, np.float32).reshape(-1)
    peak = max(float(np.abs(x).max()), 1e-6)
    pcm = np.clip(x / peak, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def main():
    from voicebox_tpu.serving import DynamicBatcher

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080
    print("building engine...", flush=True)
    engine = build_engine()
    print(f"warmup: {engine.warmup():.1f}s", flush=True)
    batcher = DynamicBatcher(engine, max_wait_ms=10.0)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body: bytes, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                stats = dict(batcher.stats,
                             mean_occupancy=batcher.mean_occupancy)
                self._send(200, json.dumps(stats).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/synthesize":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except Exception as e:
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            try:
                clip = batcher.synthesize(text, timeout=600)
            except Exception as e:
                self._send(500, f"synthesis failed: {e}".encode(),
                           "text/plain")
                return
            self._send(200, to_wav_bytes(np.asarray(clip)), "audio/wav")

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on :{port}  (POST /synthesize, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
