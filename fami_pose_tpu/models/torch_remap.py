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


def remap_hrnet_backbone_for_fami(sd: Dict[str, np.ndarray]):
    """Backbone-only torch HRNet state dict -> FAMIPose variable paths.

    Same as ``remap_hrnet_state_dict(prefix=("hrnet",))`` EXCEPT that the
    shared heatmap head lives at the TOP-level ``final_layer`` scope in the
    FAMIPose tree (flax creates it there because the MI estimators call
    ``hrnet.final_layer`` from the parent scope) — a plain prefixed remap
    would target the nonexistent ``hrnet/final_layer`` path. This is the
    loader for real ``pose_hrnet_w48.pth`` pretrained checkpoints
    (``MODEL.PRETRAINED``; reference semantics ``Alignment_V15.py:216-240``).
    """
    params, batch_stats, unmapped = remap_hrnet_state_dict(
        sd, prefix=("hrnet",)
    )
    fl = params.get("hrnet", {}).pop("final_layer", None)
    if fl is not None:
        params["final_layer"] = fl
    return params, batch_stats, unmapped


def _block_rest_to_flax(rest: Tuple[str, ...]):
    """Map a reference BasicBlock param suffix (``conv1.weight``,
    ``bn2.running_var``, ``downsample.0.weight`` ...) to the flax path."""
    def bn_leaf(leaf):
        return {
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }.get(leaf)

    if rest[0] in ("conv1", "conv2") and rest[1] == "weight":
        return "params", (rest[0], "kernel")
    if rest[0] in ("bn1", "bn2"):
        r = bn_leaf(rest[1])
        if r is None:
            return None
        return r[0], (f"norm{rest[0][-1]}", "bn", r[1])
    if rest[0] == "downsample" and rest[1] == "0" and rest[2] == "weight":
        return "params", ("downsample", "conv", "kernel")
    if rest[0] == "downsample" and rest[1] == "1":
        r = bn_leaf(rest[2])
        if r is None:
            return None
        return r[0], ("downsample", "norm", "bn", r[1])
    return None


def remap_fami_pose_state_dict(sd: Dict[str, np.ndarray]):
    """Convert a full reference ``Alignment_V15`` state_dict to the flax
    :class:`fami_pose_tpu.models.fami_pose.FAMIPose` tree.

    Covers the backbone (via :func:`remap_hrnet_state_dict` under the
    ``hrnet`` prefix, matching ``Alignment_V15.py:216-240`` load semantics)
    plus the alignment head: global-offset tower (reference
    ``feat_global_offset_layers`` Sequential, ``Alignment_V15.py:61-72``),
    the three ChainOfBasicBlocks aggregators, the per-stage DCN offset/mask
    convs and DeformConv2d weights, and ``agg_final_layer``. Linear weights
    transpose OI -> IO; ``fc1`` additionally permutes its input from torch's
    flattened (C, H, W) order to flax's (H, W, C).

    Returns (params, batch_stats, unmapped_keys).
    """
    chains = {
        "combined_feat_layers": ("combined_feat_layers",),
        "sup_agg_block": ("sup_agg_block",),
        "init_feature_agg_block": ("init_feature_agg_block",),
    }
    params: dict = {}
    batch_stats: dict = {}
    unmapped = []

    hrnet_sd = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] == "hrnet":
            if parts[1] == "final_layer":
                # shared head: flax scopes hrnet.final_layer at the TOP level
                # (a compact_name_scope method also invoked by the parent for
                # the per-sup aux heatmaps / MI estimators)
                _set(
                    params,
                    ("final_layer", "final_conv",
                     "kernel" if parts[2] == "weight" else "bias"),
                    _conv_w(np.asarray(value))
                    if parts[2] == "weight" else np.asarray(value),
                )
                continue
            hrnet_sd[key[len("hrnet."):]] = value
            continue

        mapped = None
        if parts[0] in chains and parts[1] == "layers":
            rest = _block_rest_to_flax(tuple(parts[3:]))
            if rest is not None:
                mapped = rest[0], (parts[0], f"block{parts[2]}") + rest[1]
        elif parts[0] == "feat_global_offset_layers":
            slot = int(parts[1])
            if slot == 0 and parts[2] == "layers":
                rest = _block_rest_to_flax(tuple(parts[4:]))
                if rest is not None:
                    mapped = rest[0], (
                        "global_offset", "chain", f"block{parts[3]}",
                    ) + rest[1]
            elif 1 <= slot <= 5:
                leafmod, leaf = parts[2], parts[3]
                down = f"down{slot - 1}"
                if leafmod == "conv":
                    mapped = "params", (
                        "global_offset", down, "conv",
                        "kernel" if leaf == "weight" else "bias",
                    )
                elif leafmod == "bn":
                    r = {
                        "weight": ("params", "scale"),
                        "bias": ("params", "bias"),
                        "running_mean": ("batch_stats", "mean"),
                        "running_var": ("batch_stats", "var"),
                    }.get(leaf)
                    if r is not None:
                        mapped = r[0], ("global_offset", down, "norm", "bn", r[1])
            elif slot in (7, 8, 9):
                fc = f"fc{slot - 6}"
                if parts[2] == "weight":
                    w = np.asarray(value)
                    if slot == 7:
                        # torch flattens NCHW (C=16, 3, 3); flax flattens NHWC
                        c = 16
                        hw = w.shape[1] // c
                        side = int(round(hw ** 0.5))
                        w = (
                            w.reshape(w.shape[0], c, side, side)
                            .transpose(0, 2, 3, 1)
                            .reshape(w.shape[0], -1)
                        )
                    _set(params, ("global_offset", fc, "kernel"), w.T)
                    continue
                if parts[2] == "bias":
                    mapped = "params", ("global_offset", fc, "bias")
        elif parts[0].startswith(("dcn_offset_", "dcn_mask_")):
            if parts[1] == "conv":
                mapped = "params", (
                    parts[0], "conv",
                    "kernel" if parts[2] == "weight" else "bias",
                )
        elif parts[0].startswith("dcn_"):
            if parts[1] == "weight":
                mapped = "params", (parts[0], "kernel")
            elif parts[1] == "bias":
                mapped = "params", (parts[0], "bias")
        elif parts[0] == "agg_final_layer":
            mapped = "params", (
                "agg_final_layer",
                "kernel" if parts[1] == "weight" else "bias",
            )

        if mapped is None:
            unmapped.append(key)
            continue
        coll, path = mapped
        value = np.asarray(value)
        if path[-1] == "kernel" and value.ndim == 4:
            value = _conv_w(value)
        _set(params if coll == "params" else batch_stats, path, value)

    hp, hb, hu = remap_hrnet_state_dict(hrnet_sd, prefix=("hrnet",))
    params.update(hp)
    batch_stats.update(hb)
    unmapped += [f"hrnet.{k}" for k in hu]
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
