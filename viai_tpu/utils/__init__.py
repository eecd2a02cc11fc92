"""Observability layer (L7): metrics, loss logging, HTML galleries."""

from .metrics import masked_psnr, psnr, snr
from .visualizer import HTMLGallery, Visualizer, spec_to_png, write_wav

__all__ = [
    "psnr", "snr", "masked_psnr",
    "Visualizer", "HTMLGallery", "spec_to_png", "write_wav",
]
