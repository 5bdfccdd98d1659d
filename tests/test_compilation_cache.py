"""Persistent compilation cache (utils/compilation_cache.py): executables
survive process restarts — warmup after the first deploy skips XLA compiles."""

import os
import subprocess
import sys
import textwrap


def test_cache_persists_across_processes(tmp_path):
    cache = tmp_path / "xla_cache"
    code = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from voicebox_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache({str(cache)!r}, min_compile_seconds=0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        print(float(f(jnp.ones((256, 256)))))
    """)
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    for i in range(2):
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, cwd=os.getcwd())
        assert proc.returncode == 0, proc.stderr[-2000:]
    entries = os.listdir(cache)
    assert entries, "no executables persisted"


def test_engine_kwarg_enables_cache(monkeypatch, tmp_path):
    import jax

    import voicebox_tpu.utils.compilation_cache as cc

    calls = []
    monkeypatch.setattr(cc, "enable_compilation_cache",
                        lambda path, min_compile_seconds=1.0: calls.append(path))

    from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
    from voicebox_tpu.models.text_to_semantic import TextToSemantic
    from voicebox_tpu.serving import TTSEngine

    tts = TextToSemantic(dim=32, num_text_token_ids=40,
                         num_semantic_token_ids=50, source_depth=2,
                         target_depth=2, heads=2, dim_head=16)
    tts.init_params(jax.random.PRNGKey(0))
    vb = VoiceBox(num_cond_tokens=52, dim_in=16, dim_cond_emb=16, dim=32,
                  depth=2, dim_head=16, heads=2, condition_on_text=True)
    cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=1)
    TTSEngine(cfm, text_buckets=(8,), batch_buckets=(1,),
              compilation_cache_dir=str(tmp_path / "c"))
    assert calls == [str(tmp_path / "c")]
