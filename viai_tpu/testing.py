"""Tiny model/config builders shared by tests, dryruns, and CI.

Miniature versions of the real networks (same code paths, ~1000x fewer
FLOPs) so integration tests and the driver's multichip dryrun compile
in seconds on CPU.
"""

from __future__ import annotations

import numpy as np
from flax import nnx

from .nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    PatchDiscriminator,
    UNetGenerator,
    VideoFeatureNet,
    VideoNetConfig,
)
from .signal import MaskConfig, STFTConfig
from .train import TrainConfig

TINY_STFT = STFTConfig(n_fft=126, hop_length=64)  # 64 bins
TINY_CFG = TrainConfig(
    stft=TINY_STFT,
    mask=MaskConfig(min_gap_frames=8, max_gap_frames=16),
    image_frames=64,
    lambda_l1=100.0,
)


def tiny_models(use_video: bool = False, seed: int = 0):
    """(G, D, V) sized for 64x64 spectrogram images."""
    rngs = nnx.Rngs(seed)
    gcfg = GeneratorConfig(
        ngf=8,
        strides=((2, 2), (2, 2), (2, 1)),
        mults=(1, 2, 4),
    )
    G = UNetGenerator(gcfg, rngs, fusion_channels=16 if use_video else 0)
    D = PatchDiscriminator(
        DiscriminatorConfig(in_channels=3, ndf=8, n_layers=2), rngs
    )
    V = None
    if use_video:
        V = VideoFeatureNet(
            VideoNetConfig(
                base=4, mults=(1, 2), strides=((1, 2, 2), (2, 2, 2)),
                out_features=16, out_time=16,  # = G bottleneck time axis
            ),
            rngs,
        )
    return G, D, V


def tone_batch(batch: int = 4, n: int = 4032, seed: int = 0) -> np.ndarray:
    """Batch of random-pitch sine clips (deterministic)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    f = rng.uniform(100, 1000, size=(batch, 1))
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
