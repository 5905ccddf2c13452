"""Optimizer assembly: AdamW with backbone LR group, frozen-param masking,
global-norm clipping, and the reference's epoch-based LR schedule.

Mirrors `/root/reference/runs/_helper.py:69-107` + the freeze policy of
paper.py:102-109: stem+layer1 of the backbone never train; layer2-4 train at
`lr_backbone`; everything else at `lr`. Frozen-BN statistics live outside
"params" entirely (the "frozen" collection) and never reach the optimizer.

Epoch-dependent learning rates are injected via `optax.inject_hyperparams` so
the trainer can set them per epoch (the LambdaLR idiom) without recompiling
the jitted step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import optax


def get_lr_func(epochs: int) -> Callable[[int], float]:
    """10% linear warmup, x0.5 at 60%, x0.1 at 90% (_helper.py:69-81).
    Takes the 0-based epoch index (the LambdaLR convention)."""
    warmup = int(0.1 * epochs)
    drop_1 = int(0.6 * epochs)
    drop_2 = int(0.9 * epochs)

    def f(e: int) -> float:
        if e < warmup:
            return (e + 1) / (1 + warmup)
        if e <= drop_1:
            return 1.0
        if e <= drop_2:
            return 0.5
        return 0.1

    return f


def param_labels(params: Any, freeze_stem: bool = True) -> Any:
    """Label each param main / backbone / frozen.

    torch equivalents (paper.py:102-109, _helper.py:84-107): backbone body
    params not in layer2/3/4 are frozen; any param under "backbone" (body or
    input_proj) uses the backbone LR group; the rest is main.

    freeze_stem=False trains stem+layer1 too — required when training from
    scratch (the reference's freeze assumes pretrained weights; freezing a
    RANDOM stem cripples the feature extractor).
    """

    def label(path, leaf) -> str:
        p = jax.tree_util.keystr(path)
        if "backbone" in p:
            if (
                freeze_stem
                and "body" in p
                and not any(f"layer{i}" in p for i in (2, 3, 4))
            ):
                return "frozen"
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def _zero_frozen(labels: Any) -> optax.GradientTransformation:
    """Zero frozen-label grads BEFORE clipping so they neither train nor
    inflate the global norm (torch: requires_grad=False => grad is None)."""

    def update(updates, state, params=None):
        del params
        zeroed = jax.tree.map(
            lambda g, l: g * 0.0 if l == "frozen" else g, updates, labels
        )
        return zeroed, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def build_optimizer(
    params: Any,
    lr: float,
    lr_backbone: float,
    weight_decay: float = 1e-4,
    max_norm: float = 0.1,
    freeze_stem: bool = True,
) -> Tuple[optax.GradientTransformation, Any]:
    """Returns (tx, initial opt_state). Set per-epoch LRs on the opt_state with
    `set_learning_rates` before each epoch."""
    labels = param_labels(params, freeze_stem=freeze_stem)

    @functools.partial(optax.inject_hyperparams, static_args=())
    def make(lr_main: float, lr_bb: float):
        def adamw(rate):
            return optax.adamw(
                rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
            )

        parts = [_zero_frozen(labels)]
        if max_norm and max_norm > 0:
            parts.append(optax.clip_by_global_norm(max_norm))
        parts.append(
            optax.multi_transform(
                {
                    "main": adamw(lr_main),
                    "backbone": adamw(lr_bb),
                    "frozen": optax.set_to_zero(),
                },
                labels,
            )
        )
        return optax.chain(*parts)

    tx = make(lr_main=lr, lr_bb=lr_backbone)
    return tx, tx.init(params)


def set_learning_rates(opt_state, lr_main: float, lr_backbone: float):
    """Update the injected hyperparams in place (returns new opt_state)."""
    hp = dict(opt_state.hyperparams)
    hp["lr_main"] = jax.numpy.asarray(lr_main, dtype=jax.numpy.float32)
    hp["lr_bb"] = jax.numpy.asarray(lr_backbone, dtype=jax.numpy.float32)
    return opt_state._replace(hyperparams=hp)
