"""Torch-twin parity: our nets vs torch CPU twins with imported weights.

SURVEY.md §4 "Parity" row: the reference tree/weights are unavailable
(SURVEY.md §0), so parity is established against torch twin networks
built to this survey's spec, fed OUR weights through the .pth
export/import shim (viai_tpu/io). This proves the interop contract:
a torch user can consume our checkpoints and reproduce our numbers.

Padding note: flax SAME padding for even kernels pads asymmetrically
(left 1, right 2 for k=4,s=2); the twins use explicit F.pad.
"""

import numpy as np
import torch
import torch.nn.functional as F
from flax import nnx

from viai_tpu.io import flatten_state, save_networks
from viai_tpu.nn import DiscriminatorConfig, PatchDiscriminator


def _flax_same_pad(x, k, s):
    """Replicate flax/XLA SAME padding for kernel k, stride s (NCHW)."""
    ih = x.shape[2]
    pad = max((-ih) % s + k - s, 0) if ih % s == 0 else max(k - ih % s, 0)
    lo, hi = pad // 2, pad - pad // 2
    return F.pad(x, (lo, hi, lo, hi))


class TorchPatchD(torch.nn.Module):
    """CPU twin of PatchDiscriminator (same layer plan, NCHW)."""

    def __init__(self, cfg: DiscriminatorConfig):
        super().__init__()
        self.cfg = cfg
        chans = [cfg.in_channels, cfg.ndf]
        self.convs = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        self.strides = [2]
        self.convs.append(torch.nn.Conv2d(cfg.in_channels, cfg.ndf, 4, 2))
        self.norms.append(torch.nn.Identity())
        cout = cfg.ndf
        for n in range(1, cfg.n_layers + 1):
            cin, cout_prev = cout, cout
            cout = cfg.ndf * min(2 ** n, 8)
            stride = 2 if n < cfg.n_layers else 1
            self.strides.append(stride)
            self.convs.append(torch.nn.Conv2d(cin, cout, 4, stride))
            # InstanceNorm-with-affine == GroupNorm(groups=C). eps must
            # match viai_tpu InstanceNorm (1e-6): with normal(0.02)
            # init, pre-norm variances are small enough that an eps
            # mismatch shows up at the 5e-4 level post-norm.
            self.norms.append(torch.nn.GroupNorm(cout, cout, eps=1e-6))
            del cout_prev
        self.head = torch.nn.Conv2d(cout, 1, 4, 1)

    def forward(self, x):  # x NCHW
        h = x
        for conv, norm, s in zip(self.convs, self.norms, self.strides):
            h = conv(_flax_same_pad(h, 4, s))
            h = norm(h)
            h = F.leaky_relu(h, 0.2)
        return self.head(_flax_same_pad(h, 4, 1))


def _import_into_torch(twin: TorchPatchD, pth_path: str):
    sd = torch.load(pth_path, weights_only=True)
    new_sd = {}
    for i in range(len(twin.convs)):
        k = f"convs.{i}.kernel"  # flax (kh, kw, cin, cout)
        new_sd[f"convs.{i}.weight"] = sd[k].permute(3, 2, 0, 1).contiguous()
        new_sd[f"convs.{i}.bias"] = sd[f"convs.{i}.bias"]
        if i > 0:
            new_sd[f"norms.{i}.weight"] = sd[f"norms.{i}.scale"]
            new_sd[f"norms.{i}.bias"] = sd[f"norms.{i}.bias"]
    new_sd["head.weight"] = sd["head.kernel"].permute(3, 2, 0, 1).contiguous()
    new_sd["head.bias"] = sd["head.bias"]
    twin.load_state_dict(new_sd)


def test_patchgan_matches_torch_twin(tmp_path):
    cfg = DiscriminatorConfig(in_channels=3, ndf=16, n_layers=3)
    D = PatchDiscriminator(cfg, nnx.Rngs(0))
    _, d_state = nnx.split(D)
    expr = str(tmp_path)
    save_networks({"D": d_state}, "twin", expr)

    twin = TorchPatchD(cfg).eval()
    _import_into_torch(twin, f"{expr}/twin_net_D.pth")

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    ours = np.asarray(D(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_foreign_torch_checkpoint_import(tmp_path):
    """The OTHER direction of the shim (VERDICT r3 missing #1): a
    NATIVE torch state_dict — torch key names (`convs.0.weight`) and
    NCHW conv kernel layout, exactly what a reference-era checkpoint
    file looks like — imports into our model through load_networks'
    torch_key_map + torch_conv_layout, with output parity against the
    torch module that wrote it."""
    from viai_tpu.io.checkpoint import load_networks, torch_conv_layout

    cfg = DiscriminatorConfig(in_channels=3, ndf=16, n_layers=3)
    twin = TorchPatchD(cfg).eval()
    # Perturb away from default init so parity is non-trivial.
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    expr = str(tmp_path)
    torch.save(twin.state_dict(), f"{expr}/foreign_net_D.pth")

    def key_map(ours: str) -> str:
        return (ours.replace(".kernel", ".weight")
                    .replace(".scale", ".weight"))

    D = PatchDiscriminator(cfg, nnx.Rngs(0))
    d_def, d_state = nnx.split(D)
    loaded = load_networks({"D": d_state}, "foreign", expr,
                           torch_key_map=key_map,
                           torch_value_map=torch_conv_layout)
    D = nnx.merge(d_def, loaded["D"])

    x = np.random.default_rng(7).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    ours = np.asarray(D(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_flat_key_names_are_stable():
    """The .pth key schema is part of the public checkpoint contract."""
    cfg = DiscriminatorConfig(in_channels=3, ndf=8, n_layers=2)
    D = PatchDiscriminator(cfg, nnx.Rngs(0))
    _, d_state = nnx.split(D)
    keys = set(flatten_state(d_state))
    assert "convs.0.kernel" in keys
    assert "head.bias" in keys
    assert any(k.startswith("norms.1.") for k in keys)


# ---------------------------------------------------------------------------
# Full generator twin (upsample="resize" mode — exactly expressible in
# torch; deconv mode differs only in the upsample op).
# ---------------------------------------------------------------------------

from viai_tpu.nn import GeneratorConfig, UNetGenerator  # noqa: E402


class TorchUNetTwin(torch.nn.Module):
    def __init__(self, cfg: GeneratorConfig):
        super().__init__()
        assert cfg.upsample == "resize"
        self.cfg = cfg
        chans = [cfg.in_channels] + [m * cfg.ngf for m in cfg.mults]
        self.downs = torch.nn.ModuleList()
        self.dnorms = torch.nn.ModuleList()
        for i, s in enumerate(cfg.strides):
            self.downs.append(torch.nn.Conv2d(chans[i], chans[i + 1], 4, s))
            self.dnorms.append(
                torch.nn.Identity() if i == 0
                else torch.nn.GroupNorm(chans[i + 1], chans[i + 1], eps=1e-6)
            )
        self.ups = torch.nn.ModuleList()
        self.unorms = torch.nn.ModuleList()
        self.up_strides = []
        up_in = chans[-1]
        for i, s in reversed(list(enumerate(cfg.strides))):
            cout = chans[i] if i > 0 else cfg.ngf
            self.ups.append(torch.nn.Conv2d(up_in, cout, 3, 1, padding=1))
            self.unorms.append(torch.nn.GroupNorm(cout, cout, eps=1e-6))
            self.up_strides.append(s)
            up_in = cout + chans[i] if i > 0 else cout
        self.head = torch.nn.Conv2d(
            cfg.ngf + cfg.in_channels, cfg.out_channels, 3, 1, padding=1
        )

    def forward(self, x):  # NCHW
        h = x
        skips = []
        for conv, norm, s in zip(self.downs, self.dnorms,
                                 self.cfg.strides):
            skips.append(h)
            h = F.leaky_relu(norm(conv(_flax_same_pad_s(h, 4, s))), 0.2)
        for i, (conv, norm, s) in enumerate(
            zip(self.ups, self.unorms, self.up_strides)
        ):
            h = F.interpolate(h, scale_factor=s, mode="nearest")
            h = F.relu(norm(conv(h)))
            h = torch.cat([h, skips[len(self.ups) - 1 - i]], dim=1)
        return torch.tanh(self.head(h))


def _flax_same_pad_s(x, k, strides):
    """flax SAME padding for possibly-asymmetric strides (NCHW)."""
    pads = []
    for dim, s in zip((2, 3), strides):
        size = x.shape[dim]
        pad = max((-size) % s + k - s, 0) if size % s == 0 else max(
            k - size % s, 0)
        pads.append((pad // 2, pad - pad // 2))
    (t, b), (l, r) = pads
    return F.pad(x, (l, r, t, b))


def test_generator_matches_torch_twin(tmp_path):
    cfg = GeneratorConfig(
        ngf=8, strides=((2, 2), (2, 2), (2, 1)), mults=(1, 2, 4),
        upsample="resize",
    )
    G = UNetGenerator(cfg, nnx.Rngs(0))
    _, g_state = nnx.split(G)
    save_networks({"G": g_state}, "twin", str(tmp_path))

    twin = TorchUNetTwin(cfg).eval()
    sd = torch.load(f"{tmp_path}/twin_net_G.pth", weights_only=True)
    new_sd = {}
    for i in range(len(cfg.strides)):
        new_sd[f"downs.{i}.weight"] = sd[f"downs.{i}.conv.kernel"].permute(
            3, 2, 0, 1).contiguous()
        new_sd[f"downs.{i}.bias"] = sd[f"downs.{i}.conv.bias"]
        if i > 0:
            new_sd[f"dnorms.{i}.weight"] = sd[f"downs.{i}.norm.scale"]
            new_sd[f"dnorms.{i}.bias"] = sd[f"downs.{i}.norm.bias"]
        new_sd[f"ups.{i}.weight"] = sd[f"ups.{i}.conv.kernel"].permute(
            3, 2, 0, 1).contiguous()
        new_sd[f"ups.{i}.bias"] = sd[f"ups.{i}.conv.bias"]
        new_sd[f"unorms.{i}.weight"] = sd[f"ups.{i}.norm.scale"]
        new_sd[f"unorms.{i}.bias"] = sd[f"ups.{i}.norm.bias"]
    new_sd["head.weight"] = sd["head.kernel"].permute(3, 2, 0, 1).contiguous()
    new_sd["head.bias"] = sd["head.bias"]
    twin.load_state_dict(new_sd)

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 2)).astype(
        np.float32)
    ours = np.asarray(G(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Video feature net twin (Conv3d + GroupNorm + temporal resize + linear).
# ---------------------------------------------------------------------------

from viai_tpu.nn import VideoFeatureNet, VideoNetConfig  # noqa: E402


def _flax_same_pad_3d(x, k, strides):
    """flax SAME padding for NCDHW torch tensors, per (t, h, w) stride."""
    pads = []
    for dim, s in zip((2, 3, 4), strides):
        size = x.shape[dim]
        pad = max((-size) % s + k - s, 0) if size % s == 0 else max(
            k - size % s, 0)
        pads.append((pad // 2, pad - pad // 2))
    (t0, t1), (h0, h1), (w0, w1) = pads
    return F.pad(x, (w0, w1, h0, h1, t0, t1))


class TorchVideoTwin(torch.nn.Module):
    def __init__(self, cfg: VideoNetConfig):
        super().__init__()
        self.cfg = cfg
        chans = [cfg.in_channels] + [m * cfg.base for m in cfg.mults]
        self.convs = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        for i in range(len(cfg.strides)):
            self.convs.append(
                torch.nn.Conv3d(chans[i], chans[i + 1], 3, cfg.strides[i])
            )
            self.norms.append(torch.nn.GroupNorm(
                min(8, chans[i + 1]), chans[i + 1], eps=1e-6))
        self.proj = torch.nn.Linear(chans[-1], cfg.out_features)

    def forward(self, x):  # NCDHW
        h = x
        for conv, norm, s in zip(self.convs, self.norms, self.cfg.strides):
            h = F.relu(norm(conv(_flax_same_pad_3d(h, 3, s))))
        h = h.mean(dim=(3, 4))                       # (B, C, T)
        h = F.interpolate(h, size=self.cfg.out_time, mode="linear",
                          align_corners=False)
        return self.proj(h.permute(0, 2, 1))          # (B, T, C)


def test_video_net_matches_torch_twin(tmp_path):
    cfg = VideoNetConfig(
        base=4, mults=(1, 2), strides=((1, 2, 2), (2, 2, 2)),
        out_features=16, out_time=8,
    )
    V = VideoFeatureNet(cfg, nnx.Rngs(0))
    _, v_state = nnx.split(V)
    save_networks({"V": v_state}, "twin", str(tmp_path))
    sd = torch.load(f"{tmp_path}/twin_net_V.pth", weights_only=True)

    twin = TorchVideoTwin(cfg).eval()
    new_sd = {}
    for i in range(len(cfg.strides)):
        new_sd[f"convs.{i}.weight"] = sd[f"convs.{i}.kernel"].permute(
            4, 3, 0, 1, 2).contiguous()
        new_sd[f"convs.{i}.bias"] = sd[f"convs.{i}.bias"]
        new_sd[f"norms.{i}.weight"] = sd[f"norms.{i}.scale"]
        new_sd[f"norms.{i}.bias"] = sd[f"norms.{i}.bias"]
    new_sd["proj.weight"] = sd["proj.kernel"].T.contiguous()
    new_sd["proj.bias"] = sd["proj.bias"]
    twin.load_state_dict(new_sd)

    x = np.random.default_rng(2).standard_normal(
        (2, 8, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(V(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    theirs = theirs.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_torch_conv_layout_transpose_guard_and_module_map():
    """ADVICE r4 #2: torch ConvTransposeNd stores (cin, cout, k...) —
    the OPPOSITE channel order of ConvNd — so the generic key-based
    shim must refuse kernels that name a transposed conv (the plain
    transpose would silently swap channel axes whenever cin == cout),
    and the module-aware torch_conv_layout_for must apply the correct
    per-layer transpose by walking the live nnx graph."""
    from flax import nnx

    from viai_tpu.io.checkpoint import (torch_conv_layout,
                                        torch_conv_layout_for)

    # Guard: a key that unambiguously names a transposed conv raises.
    a_t = np.arange(3 * 4 * 5 * 5, dtype=np.float32).reshape(3, 4, 5, 5)
    with np.testing.assert_raises(ValueError):
        torch_conv_layout("ups.0.deconv.kernel", a_t)

    class M(nnx.Module):
        def __init__(self, rngs):
            self.c = nnx.Conv(3, 4, (5, 5), rngs=rngs)
            self.t = nnx.ConvTranspose(3, 4, (5, 5), rngs=rngs)

    vm = torch_conv_layout_for(M(nnx.Rngs(0)))
    # torch ConvTranspose2d (cin=3, cout=4, kh, kw) → flax
    # (kh, kw, cin=3, cout=4): transpose (2, 3, 0, 1).
    got_t = vm("t.kernel", a_t)
    assert got_t.shape == (5, 5, 3, 4)
    np.testing.assert_array_equal(got_t,
                                  np.transpose(a_t, (2, 3, 0, 1)))
    # torch Conv2d (cout=4, cin=3, kh, kw) → flax (kh, kw, cin, cout):
    # the plain-conv transpose (2, 3, 1, 0), untouched by the map.
    a_c = np.arange(4 * 3 * 5 * 5, dtype=np.float32).reshape(4, 3, 5, 5)
    got_c = vm("c.kernel", a_c)
    assert got_c.shape == (5, 5, 3, 4)
    np.testing.assert_array_equal(got_c,
                                  np.transpose(a_c, (2, 3, 1, 0)))
    # Non-kernel leaves pass through both maps.
    b = np.arange(4, dtype=np.float32)
    np.testing.assert_array_equal(vm("c.bias", b), b)
