"""viai_tpu — TPU-native Vision-Infused Audio Inpainter.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
Hangz-nju-cuhk/Vision-Infused-Audio-Inpainter-VIAI (ICCV 2019,
"Vision-Infused Deep Audio Inpainting"). See SURVEY.md for the
capability inventory this implements. The reference mount was empty
this round (SURVEY.md §0), so reference pointers cite SURVEY.md /
BASELINE.json sections instead of file:line.

Layers (SURVEY.md §1):
  signal/  — STFT / ISTFT / mel / mask / Griffin-Lim, all jit-able (L1)
  data/    — grain pipelines + native C++ wav loader (L2)
  nn/      — generator, video net, fusion, discriminator, losses (L3)
  train/   — GAN step, mesh/sharding, schedules (L4)
  io/      — checkpointing with reference naming + torch shim (L4)
  config/  — reference-flag-compatible options (L5)
  cli/     — train/test entry points (L6)
  utils/   — visualizer, metrics, HTML gallery (L7)
"""

__version__ = "0.1.0"

_LAZY = {
    "create_model": ".model",
    "VIAIModel": ".model",
    "TrainOptions": ".config",
    "TestOptions": ".config",
    "InpaintService": ".serving",
    "create_dataloader": ".data",
}


def __getattr__(name):
    # Lazy top-level API: `from viai_tpu import create_model` without
    # paying jax/flax import cost for `import viai_tpu.native` users.
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(name)
