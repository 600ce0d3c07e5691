"""PyTorch HRNet checkpoint -> flax param/batch_stats remapper.

The reference loads ImageNet/COCO-pretrained HRNet checkpoints with a
``X -> hrnet.X`` key remap (``Alignment_V15.py:216-240``). Here we go one step
further: official ``pose_hrnet_w48`` state_dicts (torch naming: ``conv1``,
``bn1``, ``layer1.N.*``, ``transitionT.I.*``, ``stageS.M.branches.B.J.*``,
``stageS.M.fuse_layers.I.J.*``, ``final_layer``) are converted into the flax
tree used by :class:`fami_pose_tpu.models.hrnet.HRNet`, including layout
transposes (conv OIHW -> HWIO, linear OI -> IO) and the params/batch_stats
split. Works from a raw ``{name: np.ndarray}`` dict so torch is only an
optional dependency (``load_torch_state_dict``).
"""

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth`` checkpoint into {name: ndarray} (strips ``module.`` /
    unwraps ``state_dict`` like ``checkpoints.py:74-78`` in the reference)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[7:]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def _torch_hrnet_key_to_flax(key: str):
    """Map one torch HRNet param name to (collection, flax_path) or None.

    collection is "params" or "batch_stats".
    """
    parts = key.split(".")

    def bn_leaf(leaf):
        if leaf == "weight":
            return "params", "scale"
        if leaf == "bias":
            return "params", "bias"
        if leaf == "running_mean":
            return "batch_stats", "mean"
        if leaf == "running_var":
            return "batch_stats", "var"
        return None  # num_batches_tracked

    # stem
    m = re.fullmatch(r"conv([12])\.weight", key)
    if m:
        return "params", (f"stem_conv{m.group(1)}", "kernel")
    m = re.fullmatch(r"bn([12])\.(\w+)", key)
    if m:
        r = bn_leaf(m.group(2))
        if r is None:
            return None
        return r[0], (f"stem_norm{m.group(1)}", "bn", r[1])

    # layer1 bottlenecks
    m = re.fullmatch(r"layer1\.(\d+)\.conv(\d)\.weight", key)
    if m:
        return "params", (f"layer1_block{m.group(1)}", f"conv{m.group(2)}", "kernel")
    m = re.fullmatch(r"layer1\.(\d+)\.bn(\d)\.(\w+)", key)
    if m:
        r = bn_leaf(m.group(3))
        if r is None:
            return None
        return r[0], (f"layer1_block{m.group(1)}", f"norm{m.group(2)}", "bn", r[1])
    m = re.fullmatch(r"layer1\.(\d+)\.downsample\.0\.weight", key)
    if m:
        return "params", (f"layer1_block{m.group(1)}", "downsample", "conv", "kernel")
    m = re.fullmatch(r"layer1\.(\d+)\.downsample\.1\.(\w+)", key)
    if m:
        r = bn_leaf(m.group(2))
        if r is None:
            return None
        return r[0], (f"layer1_block{m.group(1)}", "downsample", "norm", "bn", r[1])

    # transitions: existing-branch adapt = Sequential(conv, bn, relu);
    # new-branch = Sequential(Sequential(conv, bn, relu), ...)
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)\.(\w+)", key)
    if m:
        t, i, slot, leaf = m.groups()
        if leaf == "weight" and slot == "0":
            return "params", (f"transition{t}", f"adapt{i}", "kernel")
        if slot == "1":
            r = bn_leaf(leaf)
            if r is None:
                return None
            return r[0], (f"transition{t}", f"adapt{i}_norm", "bn", r[1])
        return None
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)\.(\d)\.(\w+)", key)
    if m:
        t, i, k, slot, leaf = m.groups()
        if slot == "0" and leaf == "weight":
            return "params", (f"transition{t}", f"new{i}_{k}", "kernel")
        if slot == "1":
            r = bn_leaf(leaf)
            if r is None:
                return None
            return r[0], (f"transition{t}", f"new{i}_{k}_norm", "bn", r[1])
        return None

    # stage branches
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.conv(\d)\.weight", key
    )
    if m:
        s, mod, b, j, n = m.groups()
        return "params", (
            f"stage{s}_module{mod}", f"branch{b}", f"block{j}", f"conv{n}", "kernel",
        )
    m = re.fullmatch(r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.bn(\d)\.(\w+)", key)
    if m:
        s, mod, b, j, n, leaf = m.groups()
        r = bn_leaf(leaf)
        if r is None:
            return None
        return r[0], (
            f"stage{s}_module{mod}", f"branch{b}", f"block{j}", f"norm{n}", "bn", r[1],
        )
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.(\d)\.(\w+)", key
    )
    if m:
        s, mod, b, j, slot, leaf = m.groups()
        base = (f"stage{s}_module{mod}", f"branch{b}", f"block{j}", "downsample")
        if slot == "0" and leaf == "weight":
            return "params", base + ("conv", "kernel")
        if slot == "1":
            r = bn_leaf(leaf)
            if r is None:
                return None
            return r[0], base + ("norm", "bn", r[1])
        return None

    # fuse layers. j > i: Sequential(conv, bn, upsample); j < i: Sequential of
    # Sequential(conv, bn[, relu]).
    m = re.fullmatch(r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d)\.(\w+)", key)
    if m:
        s, mod, i, j, slot, leaf = m.groups()
        base = (f"stage{s}_module{mod}", f"fuse{i}_{j}")
        if slot == "0" and leaf == "weight":
            return "params", base + ("conv", "kernel")
        if slot == "1":
            r = bn_leaf(leaf)
            if r is None:
                return None
            return r[0], base + ("norm", "bn", r[1])
        return None
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(\d)\.(\w+)", key
    )
    if m:
        s, mod, i, j, k, slot, leaf = m.groups()
        base = (f"stage{s}_module{mod}", f"fuse{i}_{j}")
        if slot == "0" and leaf == "weight":
            return "params", base + (f"conv{k}", "kernel")
        if slot == "1":
            r = bn_leaf(leaf)
            if r is None:
                return None
            return r[0], base + (f"norm{k}", "bn", r[1])
        return None

    # final layer
    if key == "final_layer.weight":
        return "params", ("final_layer", "final_conv", "kernel")
    if key == "final_layer.bias":
        return "params", ("final_layer", "final_conv", "bias")

    return None


def remap_hrnet_state_dict(
    sd: Dict[str, np.ndarray], prefix: Tuple[str, ...] = ()
) -> Tuple[dict, dict, list]:
    """Convert a torch HRNet state_dict into (params, batch_stats, unmapped).

    ``prefix`` nests the result under a sub-path (e.g. ``("hrnet",)`` when the
    backbone lives inside the FAMIPose model, mirroring the reference's
    ``hrnet.`` prefixing at ``Alignment_V15.py:234-238``).
    """
    params: dict = {}
    batch_stats: dict = {}
    unmapped = []
    for key, value in sd.items():
        # accept either bare HRNet names or the reference's "hrnet."-prefixed
        k = key[6:] if key.startswith("hrnet.") else key
        mapped = _torch_hrnet_key_to_flax(k)
        if mapped is None:
            if not k.endswith("num_batches_tracked"):
                unmapped.append(key)
            continue
        coll, path = mapped
        if path[-1] == "kernel":
            value = _conv_w(value)
        tree = params if coll == "params" else batch_stats
        _set(tree, prefix + path, np.asarray(value))
    return params, batch_stats, unmapped


def merge_into_variables(variables: dict, params: dict, batch_stats: dict) -> dict:
    """Overlay remapped values onto freshly-initialized flax variables,
    checking shapes. Returns a new variables dict."""
    import jax

    def overlay(dst: dict, src: dict, path=()):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"remap produced unknown path {path + (k,)}")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, path + (k,))
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path + (k,)}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                out[k] = v.astype(dst[k].dtype) if hasattr(v, "astype") else v
        return out

    new = dict(variables)
    if params:
        new["params"] = overlay(variables["params"], params)
    if batch_stats:
        new["batch_stats"] = overlay(variables.get("batch_stats", {}), batch_stats)
    return jax.tree.map(lambda x: x, new)
