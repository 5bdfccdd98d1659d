"""Minimal production-style HTTP TTS server — stdlib only.

Wires `TTSEngine` (pre-compiled bucket programs, zero request-path compiles)
behind `DynamicBatcher` (concurrent requests coalesce into batched device
programs) behind a threading HTTP server: every concurrent POST is a separate
server thread, and the batcher funnels them onto the single device worker.
The engine carries a MelVoco codec + Vocos vocoder, so responses are real
WAV audio, and voice cloning is served on its own endpoint
(`DynamicBatcher.submit_clone` — the prompt conditions the first infilling
window, reference `sample(cond=prompt_audio, texts=...)`,
voicebox_pytorch.py:1175-1201).

    python examples/serve_http.py [port]

    curl -s -X POST localhost:8080/synthesize -d '{"text": "hello world"}' \
         -o out.wav
    # voice cloning: prompt is base64 of a mono 16-bit 24 kHz WAV (< 4 s)
    curl -s -X POST localhost:8080/clone \
         -d "{\"text\": \"in the prompt's voice\", \
              \"prompt_wav\": \"$(base64 -w0 prompt.wav)\"}" -o cloned.wav
    curl -s localhost:8080/healthz

Demo weights are random — the audio is noise; swap in a trained checkpoint
via ConditionalFlowMatcherWrapper.load / load_torch for real speech.
"""

import base64
import io
import json
import sys
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24000


def build_engine():
    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.codec import MelVoco
    from voicebox_tpu.models.hubert import HubertWithKmeans
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.models.vocos import Vocos
    from voicebox_tpu.serving import TTSEngine
    from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    w2v = HubertWithKmeans(num_clusters=500, dim=64, depth=2, heads=4)
    tts = TextToSemantic(dim=128, source_depth=2, target_depth=2, heads=4,
                         dim_head=32, wav2vec=w2v,
                         tokenizer=GraphemeTokenizer())
    tts.init_params(jax.random.PRNGKey(0))
    codec = MelVoco(vocos=Vocos(input_channels=100, dim=64,
                                intermediate_dim=128, num_layers=2))
    vb = VoiceBox(
        audio_enc_dec=codec, num_cond_tokens=500, dim_cond_emb=256, dim=256,
        depth=4, dim_head=64, heads=4, num_register_tokens=8,
        attn_qk_norm=True, condition_on_text=True, dtype=dtype,
    )
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(1), seq_len=64, batch=1)
    return TTSEngine(
        cfm, text_buckets=(32, 64), batch_buckets=(1, 2, 4),
        steps=3, max_semantic_token_ids=512, spec_decode=False,
        long_window_frames=512, long_overlap_frames=64,
        prompt_seconds_buckets=(2.0, 4.0),
    )


def to_wav_bytes(x: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """float waveform -> 16-bit mono WAV bytes."""
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


def wav_bytes_to_float(b: bytes) -> np.ndarray:
    """16-bit mono WAV bytes -> float waveform in [-1, 1]."""
    with wave.open(io.BytesIO(b), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("prompt must be mono 16-bit PCM WAV")
        if w.getframerate() != SAMPLE_RATE:
            raise ValueError(f"prompt must be {SAMPLE_RATE} Hz")
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    return pcm.astype(np.float32) / 32767.0


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

        def _read_json(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self):
            if self.path == "/synthesize":
                try:
                    text = self._read_json()["text"]
                except Exception as e:
                    self._send(400, f"bad request: {e}".encode(),
                               "text/plain")
                    return
                try:
                    clip = batcher.synthesize(text, timeout=600)
                except Exception as e:
                    self._send(500, f"synthesis failed: {e}".encode(),
                               "text/plain")
                    return
                self._send(200, to_wav_bytes(np.asarray(clip)), "audio/wav")
            elif self.path == "/clone":
                try:
                    req = self._read_json()
                    text = req["text"]
                    prompt = wav_bytes_to_float(
                        base64.b64decode(req["prompt_wav"])
                    )
                except Exception as e:
                    self._send(400, f"bad request: {e}".encode(),
                               "text/plain")
                    return
                try:
                    fut = batcher.submit_clone(text, prompt[None, :])
                    clip = fut.result(timeout=600)
                except Exception as e:
                    self._send(500, f"cloning failed: {e}".encode(),
                               "text/plain")
                    return
                self._send(200, to_wav_bytes(np.asarray(clip)), "audio/wav")
            else:
                self._send(404, b"not found", "text/plain")

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on :{port}  (POST /synthesize, POST /clone, "
          "GET /healthz)", flush=True)
    try:
        server.serve_forever()
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
