#!/usr/bin/env python
"""Convert a PyTorch HRNet checkpoint into a framework variables file.

Parity tool for the reference's ``tools/convert_model.py`` + the
``X -> hrnet.X`` remap loader (``Alignment_V15.py:216-240``).

    python tools/convert_model.py --torch pose_hrnet_w48.pth \
        --out hrnet_w48_variables.ckpt [--nested-under-hrnet]
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", required=True, help="input .pth state_dict")
    p.add_argument("--out", required=True, help="output variables file")
    p.add_argument(
        "--nested-under-hrnet", action="store_true",
        help="place params under the 'hrnet' scope (FAMIPose layout)",
    )
    args = p.parse_args()

    from flax import serialization

    from fami_pose_tpu.models.torch_remap import (
        load_torch_state_dict,
        remap_hrnet_state_dict,
    )

    sd = load_torch_state_dict(args.torch)
    prefix = ("hrnet",) if args.nested_under_hrnet else ()
    params, batch_stats, unmapped = remap_hrnet_state_dict(sd, prefix=prefix)
    n_mapped = len(jax_tree_leaves(params)) + len(jax_tree_leaves(batch_stats))
    print(f"mapped {n_mapped} arrays; {len(unmapped)} unmapped torch keys")
    if unmapped:
        for k in unmapped[:10]:
            print("  unmapped:", k)

    payload = {
        "begin_epoch": np.int64(-1),
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
        "step": np.asarray(0, np.int32),
    }
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(payload))
    print(f"wrote {args.out}")


def jax_tree_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
