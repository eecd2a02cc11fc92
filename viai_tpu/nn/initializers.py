"""Weight initializers — the pix2pix `init_weights` surface.

Reference capability (SURVEY.md §2.1 "Networks" row: "init/schedulers";
VERDICT.md round-1 missing item #4): the pix2pix template initializes
every conv with one of normal(0, 0.02) [default] / xavier / kaiming /
orthogonal, selected by `--init_type` with `--init_gain` (0.02). GAN
training dynamics are init-sensitive, so the rebuild must offer the
same four (flax's lecun_normal default is kept as a fifth, non-parity
option for A/B).

Semantics pinned against torch.nn.init:
  * normal:     N(0, gain²)                       (init_gain is the std)
  * xavier:     N(0, gain²·2/(fan_in+fan_out))    (xavier_normal_(gain))
  * kaiming:    N(0, 2/fan_in)                    (kaiming_normal_, a=0,
                                                   fan_in, no gain — as in
                                                   the pix2pix init_func)
  * orthogonal: orthogonal matrix · gain          (orthogonal_(gain))
All distributions are UNtruncated normals, matching torch (jax's
glorot/he defaults truncate; we use variance_scaling(..., "normal")).
Biases are zeros in both frameworks — unchanged.
"""

from __future__ import annotations

from jax import nn as jnn

INIT_TYPES = ("normal", "xavier", "kaiming", "orthogonal", "lecun")


def kernel_init_for(init_type: str, gain: float = 0.02):
    """init_type string → flax/jax kernel initializer."""
    if init_type == "normal":
        return jnn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        # std = gain·sqrt(2/(fan_in+fan_out)) → variance scale gain².
        return jnn.initializers.variance_scaling(
            gain * gain, "fan_avg", "normal"
        )
    if init_type == "kaiming":
        return jnn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return jnn.initializers.orthogonal(scale=gain)
    if init_type == "lecun":  # flax default; non-parity A/B option
        return jnn.initializers.lecun_normal()
    raise ValueError(
        f"init_type {init_type!r} not in {INIT_TYPES}"
    )
