"""CLI: convert PoseTrack17 annolist JSONs <-> PoseTrack18 COCO-style JSONs.

Equivalent of the vendored poseval converter CLI
(``/root/reference/.../poseval/py/convert.py:538-583``), argparse instead of
click, no zip staging (point it at a directory or a single file).

Usage:
  python tools/convert_poseval.py IN_PATH [--out_fp converted]
"""

import argparse
import logging
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("in_fp", help="input .json file or directory of them")
    p.add_argument(
        "--out_fp", default="converted",
        help="output directory (created if missing); one file per video",
    )
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from fami_pose_tpu.evaluation.convert import convert_dir

    written = convert_dir(args.in_fp, args.out_fp)
    print(f"wrote {len(written)} file(s) -> {args.out_fp}")


if __name__ == "__main__":
    main()
