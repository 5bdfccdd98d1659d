"""Thin dataclass config layer for the trainer/mesh (SURVEY.md §5: the
reference has no config system — all constructor kwargs; API parity keeps
kwargs as the primary interface, this layer adds a serialisable record of a
run's hyperparameters on top of it).

    cfg = TrainConfig(batch_size=32, num_train_steps=100_000, lr=3e-4,
                      mesh=MeshConfig(model_parallel=2), param_sharding="fsdp+tp")
    trainer = cfg.build(cfm_wrapper, dataset)
    json.dumps(cfg.to_dict())   # goes straight into experiment tracking
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

__all__ = ["MeshConfig", "TrainConfig"]


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape; data_parallel=None = all remaining devices."""

    data_parallel: Optional[int] = None
    model_parallel: int = 1

    def build(self):
        from ..parallel.mesh import make_mesh

        return make_mesh(data_parallel=self.data_parallel,
                         model_parallel=self.model_parallel)


@dataclass(frozen=True)
class TrainConfig:
    """Everything `VoiceBoxTrainer` takes, as a serialisable record."""

    batch_size: int = 32
    num_train_steps: Optional[int] = None
    num_warmup_steps: Optional[int] = None
    num_epochs: Optional[int] = None
    lr: float = 3e-4
    initial_lr: float = 1e-5
    grad_accum_every: int = 1
    wd: float = 0.0
    max_grad_norm: Optional[float] = 0.5
    valid_frac: float = 0.05
    random_split_seed: int = 42
    log_every: int = 10
    save_results_every: int = 100
    save_model_every: int = 1000
    results_folder: str = "./results"
    param_sharding: str = "replicated"
    seq_parallel: int = 1
    # "bfloat16" stores Adam moments at reduced precision (string so the
    # config stays JSON-round-trippable; see training/optimizer.py)
    moment_dtype: Optional[str] = None
    # "bfloat16" stores the LIVE params at reduced precision with an f32
    # master copy (mixed-precision training; see trainer param_dtype)
    param_dtype: Optional[str] = None
    # e.g. 0.999 tracks an EMA of the params for sampling
    # (trainer.generate(use_ema=True)); ema_dtype "bfloat16" halves its
    # HBM traffic
    ema_decay: Optional[float] = None
    ema_dtype: Optional[str] = None
    min_fsdp_size: int = 2 ** 16
    seed: int = 0
    bucket_multiple: int = 256
    max_length: Optional[int] = None
    bucket_offset: Optional[int] = None
    checkpoint_backend: str = "msgpack"
    mesh: Optional[MeshConfig] = field(default=None)
    use_mesh: bool = True

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        d = dict(d)
        if isinstance(d.get("mesh"), dict):
            d["mesh"] = MeshConfig(**d["mesh"])
        return cls(**d)

    def build(self, cfm_wrapper, dataset, **overrides):
        """Construct the trainer; kwargs here override config fields."""
        from .trainer import VoiceBoxTrainer

        kwargs = self.to_dict()
        mesh_cfg = kwargs.pop("mesh")
        kwargs.update(overrides)
        for key in ("moment_dtype", "ema_dtype", "param_dtype"):
            if isinstance(kwargs.get(key), str):
                import jax.numpy as jnp

                kwargs[key] = jnp.dtype(kwargs[key])
        if "mesh" not in kwargs:
            kwargs["mesh"] = (
                MeshConfig(**mesh_cfg).build() if isinstance(mesh_cfg, dict)
                else (self.mesh.build() if self.mesh is not None else None)
            )
        return VoiceBoxTrainer(cfm_wrapper, dataset=dataset, **kwargs)
