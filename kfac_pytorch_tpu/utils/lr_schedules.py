"""Learning-rate schedules matching the reference harness.

Parity: /root/reference/examples/utils.py:54-80 (linear-warmup + multistep
decay, and polynomial decay) and the per-epoch semantics of the reference
train scripts (epoch-granular schedule applied via LambdaLR).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep(
    base_lr: float,
    warmup_epochs: int,
    decay_epochs: Sequence[float],
    alpha: float = 0.1,
    steps_per_epoch: int = 1,
    workers: int = 1,
):
    """Linear warmup from 1x single-worker lr up to workers x base_lr, then
    x alpha at each decay epoch — exact parity with the reference
    create_lr_schedule (examples/utils.py:54-66, applied epoch-granularly via
    LambdaLR to an optimizer lr of base_lr*workers): during warmup
    lr = base_lr * (1 + epoch*(workers-1)/warmup_epochs); with workers == 1
    there is no warmup ramp, matching the reference."""
    decay = sorted(decay_epochs)

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        warm = (1.0 / workers) * (
            epoch * (workers - 1) / max(warmup_epochs, 1e-8) + 1.0
        )
        decayed = jnp.asarray(1.0)
        for e in decay:
            decayed = decayed * jnp.where(epoch >= e, alpha, 1.0)
        factor = jnp.where(epoch < warmup_epochs, warm, decayed)
        return base_lr * workers * factor

    return schedule


def polynomial(
    base_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    power: float = 2.0,
    steps_per_epoch: int = 1,
):
    """Polynomial decay after linear warmup (reference
    create_polynomial_lr_schedule, examples/utils.py:68-80)."""

    def schedule(step):
        epoch = step / steps_per_epoch
        warm = jnp.minimum(1.0, (epoch + 1.0) / max(warmup_epochs, 1e-8))
        frac = jnp.clip(
            (epoch - warmup_epochs) / max(total_epochs - warmup_epochs, 1e-8),
            0.0,
            1.0,
        )
        return base_lr * warm * (1.0 - frac) ** power

    return schedule


def inverse_sqrt(d_model: int, warmup_steps: int, factor: float = 1.0):
    """Transformer inverse-sqrt schedule (reference
    examples/transformer/Optim.py:40-63)."""

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype")
                        else jnp.asarray(step, jnp.float32), 1.0)
        return factor * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5
        )

    return schedule


def sgd_optimizer(
    lr_schedule, momentum: float = 0.9, weight_decay: float = 5e-4
) -> optax.GradientTransformation:
    """SGD with torch semantics: wd added to grad, then momentum, then lr
    (the reference wraps torch.optim.SGD, pytorch_cifar10_resnet.py:226-230).
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_schedule),
    )
