"""Runner: experiment identity + phase dispatch.

Mirrors ``engine/defaults/runner.py:20-66``: the output directory is derived
from config content (``OUTPUT_DIR/EXPERIMENT_NAME/<dataset-tag>/<model-
hyperparam-string>``), checkpoint/log/result subdirs are created, and the
requested phases (train -> val -> test) run in order. The CUDA_VISIBLE_DEVICES
plumbing has no TPU analog and is dropped.
"""

import logging
import os
import os.path as osp

from fami_pose_tpu.models import get_model_hyperparameter
from fami_pose_tpu.utils.registry import TEST_PHASE, VAL_PHASE


def dataset_tag(cfg) -> str:
    name = cfg.DATASET.NAME or "dataset"
    if name == "PoseTrack":
        name += "18" if cfg.DATASET.IS_POSETRACK18 else "17"
    return name


class Runner:
    def __init__(self, cfg, args=None):
        self.cfg = cfg
        self.args = args
        self.logger = logging.getLogger(__name__)
        self.setup_cfg()

    def setup_cfg(self):
        cfg = self.cfg
        hyper = ""
        try:
            hyper = get_model_hyperparameter(cfg)
        except KeyError:
            pass
        root = cfg.OUTPUT_DIR or "./output"
        exp = cfg.EXPERIMENT_NAME or cfg.MODEL.NAME
        out = osp.join(root, exp, dataset_tag(cfg))
        if hyper:
            out = osp.join(out, hyper)
        cfg.OUTPUT_DIR = out
        self.dirs = {
            "checkpoints": osp.join(out, "checkpoints"),
            "log": osp.join(out, "log"),
            "results": osp.join(out, "results"),
        }
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)

    def _phase_log_file(self, phase: str):
        """Per-phase timestamped log file (reference ``engine/defaults/
        base.py:18-59``)."""
        import time as _time

        path = osp.join(
            self.dirs["log"], f"{phase}-{_time.strftime('%Y%m%d_%H%M%S')}.log"
        )
        handler = logging.FileHandler(path)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        )
        root = logging.getLogger()
        root.addHandler(handler)
        return handler

    def launch(self, train=False, val=False, test=False):
        results = {}
        if train:
            from fami_pose_tpu.engine.trainer import Trainer

            h = self._phase_log_file("train")
            try:
                trainer = Trainer(self.cfg, output_dirs=self.dirs)
                results["train"] = trainer.train()
            finally:
                logging.getLogger().removeHandler(h)
        if val:
            from fami_pose_tpu.engine.evaluator import Evaluator

            from_id = int(getattr(self.args, "val_from_checkpoint", -1) or -1)
            h = self._phase_log_file("validate")
            try:
                evaluator = Evaluator(
                    self.cfg, VAL_PHASE, output_dirs=self.dirs,
                    from_checkpoint_id=from_id,
                )
                results["val"] = evaluator.eval()
            finally:
                logging.getLogger().removeHandler(h)
        if test:
            from fami_pose_tpu.engine.evaluator import Evaluator

            h = self._phase_log_file("test")
            try:
                evaluator = Evaluator(
                    self.cfg, TEST_PHASE, output_dirs=self.dirs
                )
                results["test"] = evaluator.eval()
            finally:
                logging.getLogger().removeHandler(h)
        return results
