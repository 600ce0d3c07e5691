"""Core-function registry: named train/eval step builders.

The reference dispatches its training/eval loops through
``CORE_FUNCTION_REGISTRY`` keyed on ``cfg.CORE_FUNCTION``
(``engine/core/base.py:64-67`` -> ``AlignmentMIFunction_Term6_V1``). Here a
core function is a thin factory bundling the jitted step builders plus the
loss configuration; Trainer/Evaluator consume it, so alternative training
recipes (different losses/metrics) plug in by registration.
"""

from fami_pose_tpu.engine.steps import make_eval_step, make_train_step
from fami_pose_tpu.utils.registry import CORE_FUNCTION_REGISTRY


class BaseCoreFunction:
    def __init__(self, cfg, **kwargs):
        self.cfg = cfg

    def build_train_step(self, model, mesh=None):
        raise NotImplementedError

    def build_eval_step(self, model, mesh=None, flip_pairs=None,
                        flip_test: bool = False):
        raise NotImplementedError


@CORE_FUNCTION_REGISTRY.register(name="AlignmentMIFunction_Term6_V1")
@CORE_FUNCTION_REGISTRY.register(name="FAMIPoseFunction")
class AlignmentMIFunction(BaseCoreFunction):
    """Heatmap MSE + per-sup MSE + 6-term MI training; flip-test eval."""

    def build_train_step(self, model, mesh=None):
        return make_train_step(
            model,
            mesh=mesh,
            mse_weight=float(self.cfg.LOSS.HEATMAP_MSE.WEIGHT),
            mi_alpha=float(getattr(self.cfg.LOSS, "MI_ALPHA", 0.5)),
            mi_beta=float(getattr(self.cfg.LOSS, "MI_BETA", 0.1)),
            donate=bool(self.cfg.TPU.DONATE_TRAIN_STATE),
            bf16_grads=bool(getattr(self.cfg.TPU, "BF16_GRADS", True)),
        )

    def build_eval_step(self, model, mesh=None, flip_pairs=None,
                        flip_test: bool = False):
        return make_eval_step(
            model, mesh=mesh, flip_test=flip_test, flip_pairs=flip_pairs
        )


def build_core_function(cfg, **kwargs):
    name = cfg.CORE_FUNCTION or "FAMIPoseFunction"
    if name not in CORE_FUNCTION_REGISTRY:
        raise KeyError(
            f"Unknown core function {name!r}; available: "
            f"{sorted(CORE_FUNCTION_REGISTRY.keys())}"
        )
    return CORE_FUNCTION_REGISTRY.get(name)(cfg, **kwargs)
