"""Optimizer + LR-schedule factories as optax transforms.

Behavioral contracts:
  * ``get_optimizer`` (reference ``utils/__init__.py:10-30``): sgd / adam
    (eps=1e-8) / radam / ranger over the concatenated coarse+fine params.
    Torch-style weight decay (L2 added to the gradient *before* the moment
    updates) is reproduced with ``optax.add_decayed_weights`` at the head of
    the chain.
  * ``ranger`` = RAdam + Lookahead(k=6, alpha=0.5)
    (reference ``utils/optimizers.py:266``) — implemented as a gradient
    transformation that carries the slow weights in its own state, so the
    train-state pytree stays a plain (params, opt_state) pair.
  * ``make_lr_schedule`` (reference ``utils/__init__.py:32-49`` +
    ``utils/warmup_scheduler.py``): epoch-granular steplr (MultiStepLR) /
    cosine / poly, optionally wrapped in GradualWarmupScheduler semantics
    (linear epoch-wise ramp to ``lr*multiplier``, then the base schedule on
    ``epoch - warmup_epochs``... reference delegates with shifted epoch).
    Schedules here are functions of the *global step*; pass
    ``steps_per_epoch`` to recover the reference's epoch granularity.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------
# LR schedules (epoch-granular, driven by global step)
# --------------------------------------------------------------------------
def make_lr_schedule(
    lr: float,
    lr_scheduler: str,
    steps_per_epoch: int,
    num_epochs: int,
    decay_step: Sequence[int] = (20,),
    decay_gamma: float = 0.1,
    poly_exp: float = 0.9,
    warmup_multiplier: float = 1.0,
    warmup_epochs: int = 0,
    optimizer: str = "adam",
) -> optax.Schedule:
    eps = 1e-8
    milestones = jnp.asarray(sorted(decay_step), dtype=jnp.float32)

    def base(epoch, peak_lr):
        if lr_scheduler == "steplr":
            n = jnp.sum(epoch >= milestones)
            return peak_lr * decay_gamma**n
        if lr_scheduler == "cosine":
            # torch CosineAnnealingLR(eta_min=1e-8) closed form
            return eps + (peak_lr - eps) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * epoch / num_epochs)
            )
        if lr_scheduler == "poly":
            return peak_lr * (1.0 - epoch / num_epochs) ** poly_exp
        raise ValueError(f"scheduler {lr_scheduler!r} not recognized!")

    use_warmup = warmup_epochs > 0 and optimizer not in ("radam", "ranger")

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        if not use_warmup:
            return base(epoch, lr)
        # GradualWarmupScheduler: ramp base_lr -> base_lr*multiplier over
        # warmup_epochs (utils/warmup_scheduler.py:24-33).  The reference
        # wrapper's `finished` transition epoch still returns
        # base_lr*multiplier and only starts stepping the after-scheduler the
        # following epoch (warmup_scheduler.py:25-30,50-56), so the scaled
        # base schedule lags the warmup end by ONE epoch — verified
        # epoch-by-epoch against the reference in
        # tests/test_reference_parity.py::test_lr_schedule_matches_reference.
        warm = lr * ((warmup_multiplier - 1.0) * epoch / warmup_epochs + 1.0)
        after = base(epoch - warmup_epochs - 1.0, warmup_multiplier * lr)
        return jnp.where(epoch <= warmup_epochs, warm, after)

    return schedule


# --------------------------------------------------------------------------
# Lookahead (slow weights carried in the transform state)
# --------------------------------------------------------------------------
class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jnp.ndarray


def lookahead(
    inner: optax.GradientTransformation, k: int = 6, alpha: float = 0.5
) -> optax.GradientTransformation:
    """Every ``k`` steps pull the fast weights toward the slow copy:
    ``slow += alpha * (fast - slow); fast = slow``
    (reference ``utils/optimizers.py:266-404`` Ranger's lookahead)."""

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.copy, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None):
        updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = count % k == 0
        fast = optax.apply_updates(params, updates)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
            state.slow,
            fast,
        )
        # when syncing, the effective update moves params to new_slow
        updates = jax.tree_util.tree_map(
            lambda u, f, ns, p: jnp.where(sync, ns - p, u),
            updates,
            fast,
            new_slow,
            params,
        )
        return updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------
# Optimizer factory
# --------------------------------------------------------------------------
def get_optimizer(
    optimizer: str,
    schedule: optax.Schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """``grad_clip > 0`` prepends global-norm clipping — the analog of
    Lightning's ``Trainer(gradient_clip_val=...)`` the reference leaves at
    0.  shadow_method_2's min-max normalization is reference-documented as
    NaN-prone (``efficient_shadow_mapping.py:110-112`` "Leads to nans");
    the likely mechanism is a near-zero ``wl`` in the projective divide
    (grad ~ 1/wl^2) blowing up one step.  Clipping bounds any such step
    without changing the healthy-step trajectory (measured: the exact
    submit_sm2 recipe NaN'd at epoch 126/200 unclipped — results.md)."""
    eps = 1e-8
    # coupled (torch-L2, grad += wd*p BEFORE the moments) only for sgd/adam
    # — the reference's RAdam/Ranger/AdamW all apply DECOUPLED decay after
    # the rectified step, scaled by lr (utils/optimizers.py:84-91,387-388)
    wd = (
        [optax.add_decayed_weights(weight_decay)] if weight_decay > 0 else []
    )
    if optimizer == "sgd":
        core = [optax.trace(decay=momentum)] if momentum > 0 else []
    elif optimizer == "adam":
        core = [optax.scale_by_adam(eps=eps)]
    elif optimizer in ("radam", "adamw", "ranger"):
        if optimizer == "adamw":
            core = [optax.scale_by_adam(eps=eps)]
        else:
            # reference Ranger uses betas=(0.95, 0.999)
            # (utils/optimizers.py:268); plain RAdam keeps torch defaults
            b1 = 0.95 if optimizer == "ranger" else 0.9
            core = [optax.scale_by_radam(b1=b1, eps=eps)]
        if weight_decay > 0:
            wd = []
            core.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"optimizer {optimizer!r} not recognized!")

    chain = optax.chain(*wd, *core, optax.scale_by_learning_rate(schedule))
    if optimizer == "ranger":
        chain = lookahead(chain, k=6, alpha=0.5)
    if grad_clip > 0:
        # STATELESS wrapper, not a chain slot: clip_by_global_norm in the
        # chain would add an (empty) entry to the opt_state tuple, making
        # checkpoints saved with and without --grad_clip structurally
        # incompatible — and the flag's primary use is RESUMING a NaN'd
        # run with clipping on.  Scaling grads before the chain keeps the
        # state pytree identical either way (torch semantics: scale by
        # min(1, clip/norm), exactly Lightning's gradient_clip_val).
        inner = chain

        def update(grads, state, params=None):
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gn, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            return inner.update(grads, state, params)

        chain = optax.GradientTransformation(inner.init, update)
    return chain
