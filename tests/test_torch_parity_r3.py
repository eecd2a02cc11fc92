"""Torch-twin parity for the round-3 components (multi-scale D, gated
conv blocks), extending tests/test_torch_parity.py's contract: a torch
user consuming our .pth checkpoints reproduces our numbers.
"""

import numpy as np
import torch
import torch.nn.functional as F
from flax import nnx

from viai_tpu.io import save_networks
from viai_tpu.nn import DiscriminatorConfig, MultiScaleDiscriminator

from tests.test_torch_parity import (
    TorchPatchD,
    _flax_same_pad,
    _import_into_torch,
)


def test_multiscale_d_matches_torch_twin(tmp_path):
    """Each scale is the verified TorchPatchD twin; the pyramid's
    avg-pool must replicate nnx.avg_pool's SAME semantics: asymmetric
    (lo=0, hi=1) zero pad, mean divides by the FULL 3x3 window
    (count_include_pad=True)."""
    cfg = DiscriminatorConfig(in_channels=3, ndf=16, n_layers=3)
    D = MultiScaleDiscriminator(cfg, 2, nnx.Rngs(0))
    expr = str(tmp_path)
    # Export each scale through the same .pth shim the product uses.
    for i, net in enumerate(D.nets):
        _, st = nnx.split(net)
        save_networks({"D": st}, f"s{i}", expr)

    twins = []
    for i in range(2):
        t = TorchPatchD(cfg).eval()
        _import_into_torch(t, f"{expr}/s{i}_net_D.pth")
        twins.append(t)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    ours = [np.asarray(l) for l in D(x)]

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = [twins[0](xt)]
        # nnx.avg_pool(.., (3,3), (2,2), "SAME") on even H/W: pad
        # total 1 per dim -> (left 0, right 1); zeros count in mean.
        xp = F.pad(xt, (0, 1, 0, 1))
        xt2 = F.avg_pool2d(xp, 3, 2, 0, count_include_pad=True)
        theirs.append(twins[1](xt2))
    for o, t in zip(ours, theirs):
        t = t.permute(0, 2, 3, 1).numpy()
        assert o.shape == t.shape
        np.testing.assert_allclose(o, t, atol=2e-4, rtol=1e-3)


def test_gated_downblock_matches_torch_twin():
    """Gated DownBlock: conv(cin -> 2*cout) split into (feat, gate);
    out = leaky_relu(InstanceNorm(feat)) * sigmoid(gate). The twin
    reproduces it from the flax kernel directly (channel split order
    preserved under the (kh,kw,cin,cout) -> (cout,cin,kh,kw) permute)."""
    import jax.numpy as jnp

    from viai_tpu.nn.generator import DownBlock

    blk = DownBlock(3, 8, (2, 2), "instance", jnp.float32, nnx.Rngs(0),
                    gated=True)
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32
    )
    ours = np.asarray(blk(jnp.asarray(x)))

    w = torch.from_numpy(np.asarray(blk.conv.kernel.value)).permute(
        3, 2, 0, 1
    ).contiguous()
    b = torch.from_numpy(np.asarray(blk.conv.bias.value))
    scale = torch.from_numpy(np.asarray(blk.norm.scale.value))
    bias = torch.from_numpy(np.asarray(blk.norm.bias.value))
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        h = F.conv2d(_flax_same_pad(xt, 4, 2), w, b, stride=2)
        feat, gate = h[:, :8], h[:, 8:]
        # InstanceNorm twin: GroupNorm(C, C) with eps 1e-6.
        feat = F.group_norm(feat, 8, scale, bias, eps=1e-6)
        out = F.leaky_relu(feat, 0.2) * torch.sigmoid(gate)
    theirs = out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
