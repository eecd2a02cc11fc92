"""Data pipeline layer (L2): datasets, manifests, loader factory."""

from .audio import AudioFolderDataset, find_wavs, load_wav
from .av import AVFolderDataset, MusicesManifest, load_frames_for
from .loader import NativeAudioIterator, create_dataloader
from .synthetic import SyntheticAVDataset, SyntheticConfig

__all__ = [
    "AudioFolderDataset", "AVFolderDataset", "MusicesManifest",
    "SyntheticAVDataset", "SyntheticConfig", "create_dataloader",
    "NativeAudioIterator", "find_wavs", "load_wav", "load_frames_for",
]
