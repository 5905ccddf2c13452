"""Weights & Biases configuration + gated import (reference: utils/wandb.py).

wandb is optional in this environment; when missing, logging degrades to
no-ops and the trainer prints a single notice.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class WandBConfig:
    enabled: bool = False
    entity: Optional[str] = None
    project: str = "future-od-tpu"
    name: Optional[str] = None
    hyperparams: Optional[dict] = None
    watch_model: bool = False
    notes: Optional[str] = None
    num_images: int = 0
    resume_id: Optional[str] = None


def maybe_import_wandb():
    try:
        import wandb  # type: ignore

        return wandb
    except ImportError:
        return None
