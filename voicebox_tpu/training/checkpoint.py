"""Checkpoint backends for the trainer.

Two interchangeable formats (SURVEY.md §5 checkpoint/resume):

* `msgpack` — single-file flax serialization of {model, optim, steps}; key
  names mirror the reference's torch pkg (reference trainer.py:191-197).
  Simple, dependency-light, good for single-host.
* `orbax` — `orbax.checkpoint.CheckpointManager` with async saves and
  retention; the idiomatic choice for large sharded params / multi-host
  (each process writes its own shards). Step metadata lives in the manager's
  step directories.

Both store the step IN the checkpoint rather than regexing it out of the
filename (reference quirk, trainer.py:47-58)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
from flax import serialization

__all__ = ["MsgpackCheckpointer", "OrbaxCheckpointer", "make_checkpointer"]


class MsgpackCheckpointer:
    def save(self, path, params, opt_state, steps: int):
        pkg = {
            "model": serialization.to_state_dict(jax.device_get(params)),
            "optim": serialization.to_state_dict(jax.device_get(opt_state)),
            "steps": steps,
        }
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(pkg))

    def restore(self, path, params_template, opt_state_template):
        with open(path, "rb") as f:
            pkg = serialization.msgpack_restore(f.read())
        params = serialization.from_state_dict(params_template, pkg["model"])
        opt_state = serialization.from_state_dict(opt_state_template, pkg["optim"])
        return params, opt_state, int(pkg["steps"])

    def wait(self):
        pass


class OrbaxCheckpointer:
    """Async orbax manager rooted at a directory; save(path=step dir ignored,
    steps used as the orbax step key)."""

    def __init__(self, directory, max_to_keep: Optional[int] = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, path, params, opt_state, steps: int):
        # `path` is unused: orbax owns the layout under self.directory
        self.manager.save(
            steps,
            args=self._ocp.args.Composite(
                params=self._ocp.args.StandardSave(params),
                opt_state=self._ocp.args.StandardSave(opt_state),
            ),
        )

    def restore(self, step_or_path, params_template, opt_state_template):
        """`step_or_path`: an int step, a string/path whose BASENAME carries
        the step number (the trainer's 'voicebox.{step}.ckpt', or any name
        with exactly one digit group), or None/'latest' for the newest.
        Ambiguous or unparseable names raise — guessing from stray digits in
        directories ('run_v2/...') or suffixes ('...ckpt.bak3') would silently
        restore the wrong step."""
        import re

        if step_or_path is None or str(step_or_path) == "latest":
            step = self.manager.latest_step()
        elif isinstance(step_or_path, int):
            step = step_or_path
        else:
            name = Path(str(step_or_path)).name
            anchored = re.fullmatch(r"voicebox\.(\d+)(?:\.ckpt)?", name)
            if anchored:
                step = int(anchored.group(1))
            else:
                digits = re.findall(r"\d+", name)
                if len(digits) != 1:
                    raise ValueError(
                        f"cannot unambiguously parse a checkpoint step out of "
                        f"{name!r} ({len(digits)} digit groups); pass an int "
                        "step, a 'voicebox.{step}.ckpt' name, or 'latest'"
                    )
                step = int(digits[0])
        if step is None:
            step = self.manager.latest_step()
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                params=self._ocp.args.StandardRestore(params_template),
                opt_state=self._ocp.args.StandardRestore(opt_state_template),
            ),
        )
        return restored["params"], restored["opt_state"], int(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()


def make_checkpointer(backend: str, results_folder) -> Any:
    if backend == "msgpack":
        return MsgpackCheckpointer()
    if backend == "orbax":
        return OrbaxCheckpointer(Path(results_folder) / "orbax")
    raise ValueError(f"unknown checkpoint backend {backend!r}")
