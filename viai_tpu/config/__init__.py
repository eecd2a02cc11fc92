"""Config layer (L5): reference-flag-compatible options."""

from .options import BaseOptions, TestOptions, TrainOptions

__all__ = ["BaseOptions", "TrainOptions", "TestOptions"]
