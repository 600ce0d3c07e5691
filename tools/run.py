#!/usr/bin/env python
"""CLI entry point (reference ``tools/run.py:25-43``).

    python tools/run.py --cfg configs/posetrack17.yaml --train --val
"""

import logging
import os.path as osp
import random
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from fami_pose_tpu.utils.platform import apply_jax_platforms_env  # noqa: E402

apply_jax_platforms_env()

from fami_pose_tpu.config import get_cfg, update_config  # noqa: E402
from fami_pose_tpu.engine.argument_parser import default_parse_args  # noqa: E402
from fami_pose_tpu.engine.runner import Runner  # noqa: E402
import fami_pose_tpu.models  # noqa: E402,F401  (model registration)
import fami_pose_tpu.data.posetrack  # noqa: E402,F401  (dataset registration)
import fami_pose_tpu.data.jhmdb  # noqa: E402,F401


def setup(args):
    return get_cfg(args)  # defaults + YAML + CLI opts + path absolutization


def set_random_seed(seed: int):
    # fixed seed at entry, like the reference (tools/run.py:31-34; seed
    # 19970808); JAX PRNG keys are derived from cfg.SEED inside the engine
    random.seed(seed)
    np.random.seed(seed)


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    args = default_parse_args()
    cfg = setup(args)
    set_random_seed(int(cfg.SEED))
    runner = Runner(cfg, args)
    runner.launch(train=args.train, val=args.val, test=args.test)


if __name__ == "__main__":
    main()
