"""Checkpointing — reference naming/format contract + orbax resume.

Reference capability (SURVEY.md §3.4, §5.4): per-net state dicts saved
as `{checkpoints_dir}/{name}/{epoch}_net_{netname}.pth` with a `latest`
alias, loaded by test.py and --continue_train. [B:5] requires mirroring
the checkpoint format.

Two tiers here:
  * `save_networks`/`load_networks` — per-net files in the reference's
    exact naming scheme, written as REAL torch .pth state dicts
    (torch CPU is in the image), so a torch user can open our
    checkpoints and we can import reference-era .pth weights through
    a key-map shim (`torch_key_map`).
  * `save_train_state`/`load_train_state` — full training state
    (G/D/V params + both Adam states + step) through orbax for
    --continue_train resume, which the .pth tier cannot carry.
"""

from __future__ import annotations

import os
import re
import typing as tp

import jax
import numpy as np
from flax import nnx


# ---------------------------------------------------------------------------
# nnx.State <-> flat numpy dict
# ---------------------------------------------------------------------------

def _key_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))
        parts.append(str(name))
    # nnx wraps every Param leaf in a trailing `.value`; drop it so the
    # public .pth key schema reads like a torch state dict.
    if parts and parts[-1] == "value":
        parts.pop()
    return ".".join(parts)


def flatten_state(state) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    return {_key_str(path): np.asarray(leaf) for path, leaf in flat}


def unflatten_into(state, flat: dict[str, np.ndarray]):
    """Rebuild a pytree shaped like `state` from a flat dict (strict)."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    leaves = []
    for path, leaf in paths:
        k = _key_str(path)
        if k not in flat:
            raise KeyError(f"checkpoint missing parameter {k!r}")
        v = np.asarray(flat[k])
        if v.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {k!r}: ckpt {v.shape} vs model "
                f"{np.shape(leaf)}"
            )
        leaves.append(v.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Reference-format per-net .pth tier
# ---------------------------------------------------------------------------

def _net_path(expr_dir: str, which_epoch, net_name: str) -> str:
    return os.path.join(expr_dir, f"{which_epoch}_net_{net_name}.pth")


def save_networks(
    nets: dict[str, tp.Any], which_epoch, expr_dir: str,
    also_latest: bool = True,
):
    """nets: {'G': g_state, 'D': d_state, ...} → `{epoch}_net_{n}.pth`.

    Files are genuine torch.save state dicts (str → torch.Tensor).
    """
    import torch

    os.makedirs(expr_dir, exist_ok=True)
    for name, state in nets.items():
        flat = flatten_state(state)
        # np.array(copy=True) also guarantees WRITEABLE (jax buffers
        # export read-only; ascontiguousarray would pass them through
        # and trip torch's non-writable-tensor warning).
        sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in flat.items()}
        torch.save(sd, _net_path(expr_dir, which_epoch, name))
        if also_latest and str(which_epoch) != "latest":
            torch.save(sd, _net_path(expr_dir, "latest", name))


def torch_conv_layout(our_key: str, arr: np.ndarray) -> np.ndarray:
    """Layout shim for importing NATIVE torch conv weights.

    torch stores Conv2d kernels as (cout, cin, kh, kw) and Conv3d as
    (cout, cin, kd, kh, kw); flax wants (kh, kw, cin, cout) /
    (kd, kh, kw, cin, cout). Biases/norm vectors pass through. Applied
    only to `.kernel` leaves so rank-4/5 non-conv tensors are safe.

    ConvTranspose caveat (ADVICE r4 #2): torch ConvTransposeNd stores
    (cin, cout, k...) — the OPPOSITE channel order of ConvNd — so the
    plain transpose below would silently swap in/out channels whenever
    cin == cout (shape-compatible, numerically wrong). This generic
    shim therefore rejects keys that unambiguously name a transposed
    conv; for nets that contain nnx.ConvTranspose layers at plain-conv
    key paths (deconv-mode generators/refiners: `ups.N.conv.kernel`),
    build the value map from the LIVE module with
    `torch_conv_layout_for(module)` instead — it knows each kernel's
    true layer type.
    """
    if our_key.endswith(".kernel") or our_key.endswith("kernel"):
        if arr.ndim in (4, 5):
            low = our_key.lower()
            if any(s in low for s in
                   ("convtranspose", "conv_transpose", "deconv")):
                raise ValueError(
                    f"torch_conv_layout: {our_key!r} names a "
                    "ConvTranspose kernel; torch stores those as "
                    "(cin, cout, k...) — the generic (cout, cin) "
                    "transpose would silently swap channel axes. Use "
                    "torch_conv_layout_for(module) instead."
                )
        if arr.ndim == 4:
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 5:
            return np.transpose(arr, (2, 3, 4, 1, 0))
    return arr


def torch_conv_layout_for(module) -> tp.Callable[[str, np.ndarray],
                                                 np.ndarray]:
    """Module-aware torch layout shim (ADVICE r4 #2).

    Walks the live nnx module tree, records the state paths of every
    nnx.ConvTranspose kernel, and returns a value map that applies the
    ConvTranspose layout — torch (cin, cout, kh, kw) → flax
    (kh, kw, cin, cout), i.e. transpose (2, 3, 0, 1) — to exactly those
    kernels and the plain Conv layout to everything else. Key paths
    alone cannot distinguish the two (resize-mode generators keep plain
    convs at the same `ups.N.conv` paths deconv mode puts transposed
    convs at), so the distinction must come from the module.
    """
    from flax import nnx

    tkeys = set()
    for path, mod in nnx.iter_graph(module):
        if isinstance(mod, nnx.ConvTranspose):
            tkeys.add(".".join(str(p) for p in path) + ".kernel")

    def value_map(our_key: str, arr: np.ndarray) -> np.ndarray:
        if our_key in tkeys:
            if arr.ndim == 4:
                return np.transpose(arr, (2, 3, 0, 1))
            if arr.ndim == 5:
                return np.transpose(arr, (2, 3, 4, 0, 1))
            return arr
        return torch_conv_layout(our_key, arr)

    return value_map


def load_networks(
    nets: dict[str, tp.Any], which_epoch, expr_dir: str,
    torch_key_map: tp.Callable[[str], str] | None = None,
    torch_value_map: tp.Callable[[str, np.ndarray], np.ndarray]
    | None = None,
) -> dict[str, tp.Any]:
    """Restore each net's state from `{epoch}_net_{name}.pth`.

    `torch_key_map` maps OUR key names to the names inside the .pth and
    `torch_value_map(our_key, array)` converts each tensor's LAYOUT
    (e.g. `torch_conv_layout` for native torch NCHW conv kernels) — the
    import shim for reference-era torch checkpoints (SURVEY.md §5.4
    "torch-state-dict import/export shim"). With neither, the file must
    already use our flat key schema and flax layouts (our own exports).
    """
    import torch

    out = {}
    for name, state in nets.items():
        path = _net_path(expr_dir, which_epoch, name)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        flat = {}
        for k, v in sd.items():
            flat[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        if torch_key_map is not None:
            ours = flatten_state(state)
            flat = {k: flat[torch_key_map(k)] for k in ours}
        if torch_value_map is not None:
            flat = {k: torch_value_map(k, v) for k, v in flat.items()}
        out[name] = unflatten_into(state, flat)
    return out


def available_epochs(expr_dir: str, net_name: str = "G") -> list[str]:
    """List saved epoch tags for a net (sorted, 'latest' last)."""
    if not os.path.isdir(expr_dir):
        return []
    pat = re.compile(rf"^(.+)_net_{re.escape(net_name)}\.pth$")
    tags = [m.group(1) for f in os.listdir(expr_dir) if (m := pat.match(f))]
    nums = sorted((t for t in tags if t.isdigit()), key=int)
    return nums + [t for t in tags if not t.isdigit()]


# ---------------------------------------------------------------------------
# Full train-state tier (orbax)
# ---------------------------------------------------------------------------

def _state_dir(expr_dir: str, which_epoch) -> str:
    return os.path.abspath(os.path.join(expr_dir, f"{which_epoch}_state"))


def save_train_state(state, which_epoch, expr_dir: str):
    import orbax.checkpoint as ocp

    os.makedirs(expr_dir, exist_ok=True)
    path = _state_dir(expr_dir, which_epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(template_state, which_epoch, expr_dir: str):
    """Restore the full state pytree; `template_state` gives the tree
    structure/shapes (build it exactly as at init)."""
    import orbax.checkpoint as ocp

    path = _state_dir(expr_dir, which_epoch)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            template_state,
        )
        return ckptr.restore(path, abstract)
