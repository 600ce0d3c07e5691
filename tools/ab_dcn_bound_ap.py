"""Full-pipeline windowed-vs-exact DCN A/B through poseval AP (VERDICT r2 #4).

``tools/ablate_dcn_bound.py`` quantifies the bounded-offset clamp at the *op*
level. This tool closes the loop end-to-end: the SAME model variables are run
through the real Evaluator (decode + annolist writing + poseval AP) on the
synthetic PoseTrack fixture, once with the exact unbounded gather path
(``TPU.DCN_MAX_OFFSET: 0``, torchvision-faithful — reference semantics
``Alignment_V15.py:83-101``) and once per bounded window (2/4/6); the
per-joint AP deltas are the end-to-end bound the mAP-parity claim needs.

It also captures the model's ACTUAL offset-conv output distribution on the
fixture (via flax capture_intermediates), replacing the synthetic draws the
op-level ablation used.

Run (CPU, tiny topology):   python tools/ab_dcn_bound_ap.py
Run (TPU, flagship W48):    python tools/ab_dcn_bound_ap.py --w48
Results recorded in docs/DCN_OFFSET_BOUND.md.
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--w48", action="store_true",
                   help="flagship W48 widths (needs a TPU; default: tiny)")
    p.add_argument("--bounds", type=int, nargs="+", default=[2, 4, 6])
    p.add_argument("--videos", type=int, default=2)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--seed", type=int, default=19970808)
    p.add_argument("--ckpt", default=None,
                   help="TRAINED checkpoint (tools/sustained_train_w48.py "
                        "output); switches to that run's exact fixture "
                        "(seed 3, joint markers) so the offset distribution "
                        "and AP deltas reflect trained weights (VERDICT r3 "
                        "#1b). Implies --w48.")
    p.add_argument("--motion", default=None, choices=[None, "drift", "articulated"],
                   help="--ckpt fixture motion model; must match the "
                        "checkpoint's (tools/sustained_train_w48.py flag)")
    p.add_argument("--occlude", type=float, default=0.0,
                   help="--ckpt fixture marker-occlusion rate; must match "
                        "the checkpoint's")
    p.add_argument("--skip-ap", action="store_true",
                   help="skip the per-bound poseval AP evals and report only "
                        "the decoded-px drift sweep (fast; forwards only)")
    args = p.parse_args()
    if args.ckpt:
        args.w48 = True

    from fixtures import make_cfg, make_posetrack_fixture
    from test_end_to_end import _write_gt_annolists

    from fami_pose_tpu.engine.evaluator import Evaluator
    from fami_pose_tpu.models.hrnet import TINY_EXTRA, W48_EXTRA

    root = tempfile.mkdtemp(prefix="ab_dcn_")
    if args.ckpt:
        # bitwise-identical fixture to the sustained-training run
        _, img_dir = make_posetrack_fixture(
            root, n_videos=2, n_frames=5, people_per_frame=2, seed=3,
            draw_joints=True, motion=args.motion, occlude=args.occlude,
        )
    else:
        _, img_dir = make_posetrack_fixture(
            root, n_videos=args.videos, n_frames=args.frames,
            people_per_frame=2, seed=args.seed % (2 ** 31),
        )
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = W48_EXTRA if args.w48 else TINY_EXTRA
    if args.ckpt:
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if not args.w48:
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.DCN_OFFSET_GROUPS = 4
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.VAL.BATCH_SIZE_PER_GPU = 4
    cfg.VAL.USE_GT_BBOX = True
    cfg.VAL.POST_PROCESS = True
    cfg.OUTPUT_DIR = osp.join(root, "out")
    cfg.VAL.ANNOT_DIR = _write_gt_annolists(root, img_dir, cfg)

    # one shared set of variables across every bound (params are
    # layout-independent of the DCN path by construction)
    variables = None
    results = {}
    offset_stats = None
    drift = {}  # d -> (heatmap mean|delta|, px drift p50/p95/max vs exact)
    probe_batch = None
    exact_hm = exact_px = None
    for d in [0] + list(args.bounds):
        c = cfg.clone()
        c.TPU.DCN_MAX_OFFSET = d
        ev = Evaluator(c)
        if variables is None:
            if args.ckpt:
                variables = ev.load_variables(args.ckpt)
                print(f"loaded trained variables from {args.ckpt}")
            else:
                variables = jax.jit(
                    lambda: ev.model.init(
                        jax.random.PRNGKey(0), *ev._example, train=False
                    )
                )()
                variables = jax.device_get(variables)

            # actual offset-conv outputs on EVERY fixture batch
            offs = []

            def collect(node, path=""):
                if isinstance(node, dict):
                    for k, v in node.items():
                        collect(v, path + "/" + str(k))
                elif isinstance(node, (tuple, list)):
                    for v in node:
                        collect(v, path)
                elif "dcn_offset" in path:
                    offs.append(np.asarray(node, np.float32).ravel())

            for raw in ev.loader:
                kf, sup = ev._prepare(raw)
                _, inter = ev.model.apply(
                    variables, kf, sup, train=False,
                    capture_intermediates=lambda mdl, name: bool(
                        mdl.name and "dcn_offset" in mdl.name
                    ),
                )
                collect(inter["intermediates"])
            allo = np.abs(np.concatenate(offs)) if offs else np.zeros(1)
            offset_stats = {
                "p50": np.percentile(allo, 50),
                "p95": np.percentile(allo, 95),
                "p99": np.percentile(allo, 99),
                "max": allo.max(),
                "frac>|2|": (allo > 2).mean(),
                "frac>|4|": (allo > 4).mean(),
                "frac>|6|": (allo > 6).mean(),
            }
            # ALL eval batches, not just the first: the px-drift probe must
            # cover every keyframe the AP eval scores, or a flipped joint
            # can sit outside the probed subset
            probe_batch = [
                (k, s, np.asarray(r["center"]), np.asarray(r["scale"]))
                for r in ev.loader
                for k, s in [ev._prepare(r)]
            ]
            # print immediately: a crash in a later eval must not lose the
            # trained-offset distribution (the round-3 A/B died this way)
            print("== model offset-conv |offset| distribution "
                  "(all eval batches) ==", flush=True)
            print(" ".join(f"{k}={v:.3f}" for k, v in offset_stats.items()),
                  flush=True)

        # continuous drift vs the exact path over ALL eval batches: the
        # saturated fixture AP (100.0 across the board on overfit weights)
        # cannot discriminate small windows, px drift can
        from fami_pose_tpu.ops.heatmap import dark_get_final_preds

        fwd = jax.jit(lambda v, a, b: ev.model.apply(v, a, b, train=False))
        hm_parts, px_parts = [], []
        for kf_p, sup_p, ctr_p, scl_p in probe_batch:
            hm_b, _ = fwd(variables, kf_p, sup_p)
            hm_b = np.asarray(hm_b, np.float32)
            px_b, _ = dark_get_final_preds(
                jnp.transpose(jnp.asarray(hm_b), (0, 3, 1, 2)), ctr_p, scl_p
            )
            hm_parts.append(hm_b)
            px_parts.append(np.asarray(px_b))
        hm_d = np.concatenate(hm_parts)
        px_d = np.concatenate(px_parts)
        if d == 0:
            exact_hm, exact_px = hm_d, px_d
        dd = np.linalg.norm(px_d - exact_px, axis=-1).ravel()
        drift[d] = {
            "hm_mean_abs_delta": float(np.abs(hm_d - exact_hm).mean()),
            "hm_rel": float(
                np.abs(hm_d - exact_hm).mean()
                / max(np.abs(exact_hm).mean(), 1e-12)
            ),
            "px_p50": float(np.percentile(dd, 50)),
            "px_p95": float(np.percentile(dd, 95)),
            "px_max": float(dd.max()),
        }
        print(f"d_max={d} drift vs exact: " + " ".join(
            f"{k}={v:.4g}" for k, v in drift[d].items()), flush=True)

        if not args.skip_ap:
            res = ev.eval_checkpoint(dict(variables))
            results[d] = res["final"][0]  # per-joint AP OrderedDict
            print(f"d_max={d}: " + ", ".join(
                f"{k}={v:.2f}" for k, v in results[d].items()))

    print("\n== model offset-conv |offset| distribution (all eval batches) ==")
    print(" ".join(f"{k}={v:.3f}" for k, v in offset_stats.items()))

    if not args.skip_ap:
        print("\n== per-joint AP delta vs exact (d_max=0 unbounded "
              "gather) ==")
        joints = list(results[0].keys())
        header = "bound  " + " ".join(f"{j:>9s}" for j in joints)
        print(header)
        for d in args.bounds:
            deltas = [results[d][j] - results[0][j] for j in joints]
            print(f"d={d:<4d} " + " ".join(f"{x:9.3f}" for x in deltas))

    print("\n== continuous drift vs exact (all eval batches; decoded px "
          "in original image coords) ==")
    print("bound  hm_mean|d|   hm_rel   px_p50   px_p95   px_max")
    for d in [0] + list(args.bounds):
        r = drift[d]
        print(f"d={d:<4d} {r['hm_mean_abs_delta']:11.2e} {r['hm_rel']:8.2e}"
              f" {r['px_p50']:8.4f} {r['px_p95']:8.4f} {r['px_max']:8.4f}")


if __name__ == "__main__":
    main()
