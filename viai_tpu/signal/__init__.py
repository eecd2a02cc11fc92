"""Signal processing layer (L1): STFT, ISTFT, mel, masks, Griffin-Lim.

All functions are pure, jit-able, and batch-leading; they replace the
reference's librosa/CPU preprocessing (SURVEY.md §1 L1, §2.4).
"""

from .stft import (
    STFTConfig,
    frame_signal,
    hann_window,
    istft,
    overlap_add,
    stft,
    stft_magnitude,
)
from .mask import (
    MaskConfig,
    apply_mask,
    expand_to_image,
    sample_batch_masks,
    sample_time_mask,
)
from .mel import apply_mel, compress, decompress, mel_filterbank, \
    sharpen_mag
from .griffin_lim import griffin_lim
from .pallas_gl import griffin_lim_pallas

__all__ = [
    "STFTConfig",
    "MaskConfig",
    "frame_signal",
    "hann_window",
    "stft",
    "stft_magnitude",
    "istft",
    "overlap_add",
    "griffin_lim",
    "griffin_lim_pallas",
    "sample_time_mask",
    "sample_batch_masks",
    "apply_mask",
    "expand_to_image",
    "mel_filterbank",
    "apply_mel",
    "compress",
    "decompress",
    "sharpen_mag",
]
