"""Model builder: registry dispatch on ``cfg.MODEL.NAME``.

Mirrors the reference's ``build_model`` / ``get_model_hyperparameter``
(``posetimation/zoo/build.py:12-88``) minus the CUDA phase plumbing: models
here are pure flax modules, so "train/eval mode" is a call-time ``train``
flag, not module state.
"""

from fami_pose_tpu.utils.registry import MODEL_REGISTRY


def build_model(cfg, phase: str = "train", **kwargs):
    """Instantiate the registered model class for ``cfg.MODEL.NAME``.

    Returns the (stateless) module; parameter init is the caller's job via
    ``module.init`` (see ``engine/trainer.py``).
    """
    name = cfg.MODEL.NAME
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY.keys())}"
        )
    cls = MODEL_REGISTRY.get(name)
    return cls.from_config(cfg, phase=phase, **kwargs)


def get_model_hyperparameter(cfg) -> str:
    """Experiment-identity string used in the output dir layout
    (``posetimation/zoo/build.py:77-88`` -> ``get_model_hyper_parameters``)."""
    cls = MODEL_REGISTRY.get(cfg.MODEL.NAME)
    if hasattr(cls, "get_model_hyper_parameters"):
        return cls.get_model_hyper_parameters(cfg)
    return ""
