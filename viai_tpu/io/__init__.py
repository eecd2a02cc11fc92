"""Checkpoint IO layer: reference-format .pth tier + orbax resume."""

from .checkpoint import (
    available_epochs,
    flatten_state,
    load_networks,
    load_train_state,
    save_networks,
    save_train_state,
    unflatten_into,
)

__all__ = [
    "save_networks", "load_networks", "available_epochs",
    "save_train_state", "load_train_state",
    "flatten_state", "unflatten_into",
]
