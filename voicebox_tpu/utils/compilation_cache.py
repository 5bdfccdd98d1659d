"""Persistent XLA compilation cache for fast serving/training cold starts.

TPU compiles are the dominant cold-start cost (20-40 s per program shape in
this environment; a TTSEngine warmup compiles one program per (batch, length)
bucket). JAX's persistent compilation cache stores the compiled executables
keyed by HLO fingerprint, so every process after the first skips compilation
entirely — measured 15.4 s -> 9.2 s end-to-end for one small sampler program
(the residual is tracing + execution), and proportionally much more for a
multi-bucket warmup. Works over the remote-compile (axon) backend: the cache
stores the serialized executables client-side.

The reference has no equivalent (torch.compile caches are per-process; its
torchode path even recompiles per CALL — voicebox_pytorch.py:1315).
"""

from __future__ import annotations

import jax

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str, min_compile_seconds: float = 1.0):
    """Point JAX's persistent compilation cache at `path` (created lazily).
    `min_compile_seconds`: only programs that took at least this long to
    compile are persisted (keeps the cache free of trivial kernels)."""
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_seconds)
    )
