"""Optimizer + LR schedule builders on optax.

Mirrors the reference's ``build_optimizer`` / ``build_lr_scheduler``
(``posetimation/optimizer/optimizer.py:16-76``, ``scheduler.py:14-35``):
Adam (default) or SGD, MultiStepLR (epoch milestones ``TRAIN.LR_STEP``,
factor ``TRAIN.LR_FACTOR``), and the optional second parameter group
(``TRAIN.LR_SECOND_GROUP`` name-prefix match with its own LR) — expressed as
one ``optax.multi_transform`` instead of the reference's list-of-optimizers.

The schedule is *per-epoch* like torch's MultiStepLR; ``steps_per_epoch``
converts it to a per-step schedule so everything stays inside one jitted
update.
"""

from typing import Optional

import optax


def build_lr_schedule(cfg, steps_per_epoch: int = 1, base_lr: Optional[float] = None):
    """MultiStepLR: lr * factor^(#milestones passed)."""
    lr = float(base_lr if base_lr is not None else cfg.TRAIN.LR)
    factor = float(cfg.TRAIN.LR_FACTOR)
    milestones = [int(m) * steps_per_epoch for m in cfg.TRAIN.LR_STEP]
    boundaries = {m: factor for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def _base_tx(cfg, schedule):
    name = str(cfg.TRAIN.OPTIMIZER).lower()
    if name == "adam":
        return optax.adam(schedule)
    if name == "sgd":
        return optax.sgd(
            schedule,
            momentum=float(cfg.TRAIN.MOMENTUM),
            nesterov=bool(cfg.TRAIN.NESTEROV),
        )
    raise KeyError(f"Unknown optimizer {cfg.TRAIN.OPTIMIZER!r}")


def build_optimizer(cfg, steps_per_epoch: int = 1):
    """Returns an optax GradientTransformation for the whole param tree."""
    schedule = build_lr_schedule(cfg, steps_per_epoch)
    second = [g for g in cfg.TRAIN.LR_SECOND_GROUP if g]

    if not second:
        tx = _base_tx(cfg, schedule)
    else:
        second_schedule = build_lr_schedule(
            cfg, steps_per_epoch, base_lr=float(cfg.TRAIN.LR_SECOND_GROUP_VALUE)
        )

        def label_fn(params):
            import jax

            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            treedef = jax.tree_util.tree_structure(params)
            labels = []
            for path, _ in flat:
                top = getattr(path[0], "key", str(path[0]))
                labels.append(
                    "second" if any(top.startswith(p) for p in second) else "main"
                )
            return jax.tree_util.tree_unflatten(treedef, labels)

        tx = optax.multi_transform(
            {"main": _base_tx(cfg, schedule), "second": _base_tx(cfg, second_schedule)},
            label_fn,
        )
    return tx
