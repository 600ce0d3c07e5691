"""Trainer: the epoch-loop orchestrator.

TPU re-design of ``engine/defaults/trainer.py:25-108``: builds dataset +
loader + model + optimizer + (sharded, jitted) train step, auto-resumes from
the latest checkpoint, runs epochs with on-device metrics fetched only at
PRINT_FREQ, steps the (per-step, schedule-based) LR, and saves per-epoch
checkpoints. DataParallel is replaced by the mesh: batches are sharded on
the ``data`` axis, gradients are reduced by XLA collectives inside the step.
"""

import logging
import os.path as osp
import time
from typing import Optional

import jax
import jax.numpy as jnp

import fami_pose_tpu.data  # noqa: F401  (dataset registration)
from fami_pose_tpu.data.loader import build_train_loader, prepare_train_batch
from fami_pose_tpu.engine import checkpoints
from fami_pose_tpu.engine.metrics_writer import MetricWriter
from fami_pose_tpu.engine.train_state import create_train_state
from fami_pose_tpu.losses import fami_total_loss  # noqa: F401  (re-export)
from fami_pose_tpu.models import build_model
from fami_pose_tpu.models.fami_pose import init_weights_reference
from fami_pose_tpu.optim import build_optimizer
from fami_pose_tpu.parallel.mesh import build_mesh, shard_batch
from fami_pose_tpu.utils.meters import AverageMeter
from fami_pose_tpu.utils.registry import DATASET_REGISTRY, TRAIN_PHASE


class Trainer:
    def __init__(self, cfg, output_dirs: Optional[dict] = None, dataset=None):
        self.cfg = cfg
        self.logger = logging.getLogger(__name__)
        dirs = output_dirs or {}
        self.checkpoints_dir = dirs.get(
            "checkpoints", osp.join(cfg.OUTPUT_DIR or ".", "checkpoints")
        )
        self.log_dir = dirs.get("log", osp.join(cfg.OUTPUT_DIR or ".", "log"))
        self.writer = MetricWriter(self.log_dir)

        # data
        if dataset is None:
            ds_cls = DATASET_REGISTRY.get(cfg.DATASET.NAME)
            dataset = ds_cls(cfg, TRAIN_PHASE)
        self.dataset = dataset

        # mesh + model + optimizer
        self.mesh = build_mesh(mesh_shape=list(cfg.TPU.MESH_SHAPE))
        n_data = int(self.mesh.shape["data"])
        self.loader = build_train_loader(cfg, dataset, num_devices=n_data)
        self.steps_per_epoch = max(1, len(self.loader))
        self.model = build_model(cfg, TRAIN_PHASE)
        self.tx = build_optimizer(cfg, steps_per_epoch=self.steps_per_epoch)

        h, w = int(cfg.MODEL.IMAGE_SIZE[1]), int(cfg.MODEL.IMAGE_SIZE[0])
        n_sup = 2 * (int(cfg.DISTANCE) - 1)
        example = (
            jnp.zeros((1, h, w, 3), jnp.float32),
            jnp.zeros((1, h, w, 3 * n_sup), jnp.float32),
        )
        with self.mesh:
            self.state = create_train_state(
                self.model, self.tx, jax.random.PRNGKey(int(cfg.SEED)), example
            )
        if bool(cfg.MODEL.INIT_WEIGHTS):
            self.state = self.state.replace(
                params=init_weights_reference(
                    self.state.params, jax.random.PRNGKey(int(cfg.SEED) + 1)
                )
            )
        if cfg.MODEL.PRETRAINED and osp.isfile(cfg.MODEL.PRETRAINED):
            self._load_pretrained(cfg.MODEL.PRETRAINED)

        self.begin_epoch = int(cfg.TRAIN.BEGIN_EPOCH)
        self.end_epoch = int(cfg.TRAIN.END_EPOCH)
        if bool(cfg.TRAIN.AUTO_RESUME):
            latest = checkpoints.get_latest_checkpoint(self.checkpoints_dir)
            if latest:
                self.state, self.begin_epoch = checkpoints.resume(
                    latest, self.state
                )
                self.logger.info(
                    f"resumed from {latest} at epoch {self.begin_epoch}"
                )

        from fami_pose_tpu.engine.core_functions import build_core_function

        self.core_function = build_core_function(cfg)
        self.train_step = self.core_function.build_train_step(
            self.model, mesh=self.mesh
        )
        self.global_step = int(self.state.step)

    def _load_pretrained(self, path):
        """PyTorch HRNet checkpoint -> backbone params (remap + overlay)."""
        from fami_pose_tpu.models.torch_remap import (
            load_torch_state_dict,
            merge_into_variables,
            remap_hrnet_backbone_for_fami,
        )

        sd = load_torch_state_dict(path)
        params, stats, unmapped = remap_hrnet_backbone_for_fami(sd)
        variables = merge_into_variables(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            params, stats,
        )
        self.state = self.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        self.logger.info(
            f"loaded pretrained backbone from {path} "
            f"({len(unmapped)} unmapped keys)"
        )

    @staticmethod
    def _tables(meters) -> str:
        """Loss + accuracy tables at PRINT_FREQ (reference
        ``alignment_mi_function_term6_1.py:184-207`` surface)."""
        loss_keys = [k for k in meters if k.startswith("loss")]
        acc_keys = [k for k in meters if k.startswith("acc")]

        def row(keys):
            return [f"{meters[k].val:.5f} ({meters[k].avg:.5f})" for k in keys]

        try:
            from tabulate import tabulate

            out = "=> Loss Table:\n" + tabulate(
                [row(loss_keys)], headers=loss_keys, tablefmt="pipe"
            )
            out += "\n=> Acc Table:\n" + tabulate(
                [row(acc_keys)], headers=acc_keys, tablefmt="pipe"
            )
            return out
        except ImportError:
            return " ".join(
                f"{k}={meters[k].val:.5f}" for k in loss_keys + acc_keys
            )

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        meters = {}
        batch_time = AverageMeter()
        data_time = AverageMeter()
        sigma = int(cfg.MODEL.SIGMA)
        image_size = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
        heatmap_size = tuple(int(v) for v in cfg.MODEL.HEATMAP_SIZE)

        end = time.time()
        from fami_pose_tpu.utils.profiling import trace

        profile_dir = str(getattr(cfg.TPU, "PROFILE_DIR", "") or "")
        profile_steps = int(getattr(cfg.TPU, "PROFILE_STEPS", 0) or 0)
        profiler = trace(profile_dir) if (profile_dir and epoch == 0) else None
        if profiler is not None:
            profiler.__enter__()
        with self.mesh:
            for it, raw in enumerate(self.loader):
                if profiler is not None and it == profile_steps:
                    profiler.__exit__(None, None, None)
                    profiler = None
                data_time.update(time.time() - end)
                if "crop_center" in raw:  # TPU.DEVICE_CROP: raw windows
                    from fami_pose_tpu.data.loader import (
                        prepare_train_batch_device_crop,
                    )

                    batch = prepare_train_batch_device_crop(
                        raw["kf"], raw["sup"], raw["crop_center"],
                        raw["scale"], raw["rotation"], raw["joints"],
                        raw["joints_vis"], sigma=sigma,
                        image_size=image_size, heatmap_size=heatmap_size,
                    )
                else:
                    batch = prepare_train_batch(
                        raw["kf"], raw["sup"], raw["joints"], raw["joints_vis"],
                        sigma=sigma, image_size=image_size,
                        heatmap_size=heatmap_size,
                    )
                batch = shard_batch(batch, self.mesh)
                self.state, metrics = self.train_step(self.state, batch)
                self.global_step += 1
                batch_time.update(time.time() - end)
                end = time.time()

                if it % int(cfg.PRINT_FREQ) == 0:
                    fetched = {k: float(v) for k, v in metrics.items()}
                    for k, v in fetched.items():
                        meters.setdefault(k, AverageMeter()).update(v)
                        self.writer.add_scalar(
                            f"train_{k}", v, self.global_step
                        )
                    samples = raw["kf"].shape[0] / max(batch_time.val, 1e-9)
                    msg = (
                        f"Epoch [{epoch}][{it}/{self.steps_per_epoch}] "
                        f"time {batch_time.val:.3f}s data {data_time.val:.3f}s "
                        f"speed {samples:.1f} samples/s"
                    )
                    msg += "\n" + self._tables(meters)
                    self.logger.info(msg)
        if profiler is not None:
            profiler.__exit__(None, None, None)
        return meters

    def train(self):
        save_every = max(1, int(self.cfg.TRAIN.SAVE_MODEL_PER_EPOCH))
        async_save = bool(getattr(self.cfg.TPU, "ASYNC_CHECKPOINT", False))
        for epoch in range(self.begin_epoch, self.end_epoch):
            meters = self.train_epoch(epoch)
            if meters.get("acc"):
                self.writer.add_scalar("train_acc_avg", meters["acc"].avg, epoch)
            if (epoch % save_every == 0) or epoch == self.end_epoch - 1:
                path = checkpoints.save_checkpoint(
                    self.checkpoints_dir, epoch, self.state,
                    async_save=async_save,
                )
                self.logger.info(f"saved checkpoint {path}")
        checkpoints.wait_for_pending_saves()
        self.writer.flush()
        return self.state
