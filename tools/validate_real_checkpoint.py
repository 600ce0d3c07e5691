"""Turn-key real-weight mAP validation (VERDICT r2 Missing #2).

One command: given a real reference checkpoint (a full ``Alignment_V15``
``epoch_*_state.pth`` or a backbone-only ``pose_hrnet_w48.pth``) plus a
dataset config, this

  1. loads + remaps the torch state dict into framework variables
     (``models/torch_remap.py`` — the ``X -> hrnet.X`` semantics of
     ``Alignment_V15.py:216-240`` / ``evaluator.py:80-95``),
  2. runs the Evaluator in EXACT mode (``TPU.DCN_MAX_OFFSET 0`` — unbounded
     torchvision-faithful gather path; override with ``--dcn-bound`` to
     validate the windowed fast path on the same weights),
  3. writes annolists and scores with the poseval AP protocol,
  4. prints the per-joint AP table, and the delta against
     ``--reference-scores`` (a JSON {joint: AP} from the reference run)
     when provided.

Zero-egress note: this environment has no PoseTrack data or released
checkpoints, so this tool is exercised in CI via the synthetic-fixture test
(tests/test_validate_real_checkpoint.py); on a machine with the real assets
it is the one command the mAP-parity claim needs:

    python tools/validate_real_checkpoint.py \
        --checkpoint epoch_20_state.pth --cfg configs/posetrack17/... \
        --val [--reference-scores ref_ap.json]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import numpy as np


def load_and_remap(path, model, example):
    """Torch .pth -> framework variables for FAMIPose (full or backbone)."""
    from fami_pose_tpu.models.torch_remap import (
        load_torch_state_dict,
        merge_into_variables,
        remap_fami_pose_state_dict,
        remap_hrnet_backbone_for_fami,
    )

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example, train=False)
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)

    sd = load_torch_state_dict(path)
    is_full = any(k.startswith(("hrnet.", "module.hrnet.")) for k in sd)
    if is_full:
        params, stats, unmapped = remap_fami_pose_state_dict(sd)
    else:
        params, stats, unmapped = remap_hrnet_backbone_for_fami(sd)
    variables = merge_into_variables(
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {})},
        params, stats,
    )
    return variables, ("full" if is_full else "backbone"), unmapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help=".pth state dict")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--test", action="store_true", help="TEST phase (default VAL)")
    p.add_argument("--dcn-bound", type=int, default=0,
                   help="DCN window; 0 = exact unbounded gather (default)")
    p.add_argument("--reference-scores", default=None,
                   help="JSON {joint: AP} from the reference run to diff")
    p.add_argument("--root-dir", default=".")
    args = p.parse_args()

    from fami_pose_tpu.config import get_cfg
    from fami_pose_tpu.engine.evaluator import Evaluator
    from fami_pose_tpu.utils.registry import TEST_PHASE, VAL_PHASE

    class A:
        cfg = args.cfg
        opts = None
        root_dir = args.root_dir

    cfg = get_cfg(A())
    cfg.defrost()
    cfg.TPU.DCN_MAX_OFFSET = int(args.dcn_bound)
    phase = TEST_PHASE if args.test else VAL_PHASE

    ev = Evaluator(cfg, phase=phase)
    variables, kind, unmapped = load_and_remap(
        args.checkpoint, ev.model, ev._example
    )
    print(f"loaded {kind} checkpoint {args.checkpoint} "
          f"({len(unmapped)} unmapped torch keys)")
    if unmapped:
        for k in list(unmapped)[:10]:
            print(f"  unmapped: {k}")

    results = ev.eval_checkpoint(variables)
    name_value, mean = results["final"]
    print("\nper-joint AP (final heatmaps):")
    for k, v in name_value.items():
        print(f"  {k:10s} {v:6.2f}")

    if args.reference_scores:
        ref = json.load(open(args.reference_scores))
        print("\ndelta vs reference:")
        worst = 0.0
        for k, v in name_value.items():
            if k in ref:
                d = v - float(ref[k])
                worst = max(worst, abs(d))
                print(f"  {k:10s} {d:+6.3f}")
        print(f"worst |delta| = {worst:.3f} "
              f"({'within' if worst <= 0.1 else 'OUTSIDE'} the 0.1 target)")


if __name__ == "__main__":
    main()
