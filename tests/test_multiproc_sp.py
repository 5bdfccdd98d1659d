"""Multi-host (multi-controller) sequence parallelism — previously a declared
single-host-only limitation (PARITY.md). Spawns TWO real jax processes
(4 virtual CPU devices each, `jax.distributed` coordinator over localhost) so
the 8-device 'seq' mesh spans a process boundary, and asserts:

* the SP loss/grads match the single-device plain model (stage A),
* `VoiceBoxTrainer(seq_parallel=4)` trains under `process_count == 2` on the
  PROCESS-ALIGNED row-sharded input path — each process decodes only its own
  batch rows, and the assembled global batch matches an unsharded decode
  (stage B, VERDICT r3 item 6), and
* a row-spanning mesh (`seq_parallel=8` over 2x4 devices) still trains via
  the full-global-batch fallback (stage C).

See tests/mp_sp_worker.py for the per-process program.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sequence_parallel(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(REPO, "tests", "mp_sp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-4000:]}"
        assert "MP_SP_OK" in out, out
        assert "MP_TRAINER_OK steps=2" in out, out
        assert "MP_FALLBACK_OK steps=1" in out, out
    # both processes computed the SAME global SP loss
    losses = [
        line.split("loss=")[1]
        for _, out, _ in outs
        for line in out.splitlines()
        if line.startswith("MP_SP_OK")
    ]
    assert len(losses) == 2 and losses[0] == losses[1], losses
