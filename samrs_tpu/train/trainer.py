"""GSPMD trainer core: train state, sharded train/eval steps.

Behavioral reference: the DDP training loop of ED/main_pretrain.py:567-625
(summed per-dataset CE ignore-255, grad clip, per-iteration schedule) and the
distributed validation :463-556 (confusion-histogram all-reduce).

TPU-native design: ONE jitted step over a `data`-sharded batch; XLA inserts
the gradient all-reduce (the DDP ring) and computes BatchNorm statistics over
the global batch (SyncBN).  Metric reduction happens inside jit on sharded
arrays — no explicit collectives in user code.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from samrs_tpu.core.metrics import intersection_and_union


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats or {},
            opt_state=tx.init(params),
        )


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = 255
) -> jnp.ndarray:
    """Mean CE over non-ignored pixels (3x CrossEntropyLoss(ignore_index=255),
    ED/main_pretrain.py:315-317)."""
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def make_pretrain_step(model, tx) -> Callable:
    """Multi-dataset step: batches is a tuple of (x, y) (one per head)."""

    # donate the input state: params + two AdamW moments are the largest
    # buffers in a training step; without donation a second full copy is
    # live across the update (the 1024^2 Mask2Former step OOMs on it)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batches, dropout_rng):
        def loss_fn(params):
            # a None batch skips that head this step (alternating-head
            # schedules at high resolution)
            xs = [None if b is None else b[0] for b in batches]
            variables = {"params": params, "batch_stats": state.batch_stats}
            rng = jax.random.fold_in(dropout_rng, state.step)
            outs, updated = model.apply(
                variables, xs, True, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
            losses = [
                cross_entropy_ignore(o, b[1]) for o, b in zip(outs, batches) if o is not None
            ]
            return sum(losses), (updated.get("batch_stats", {}), losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        metrics = {"loss": loss, **{f"loss_{i}": l for i, l in enumerate(losses)}}
        return new_state, metrics

    return train_step


def make_pretrain_step_mask2former(
    model, tx, num_classes: Sequence[int], num_points: Optional[int] = None
) -> Callable:
    """E2E variant: per-dataset Mask2Former dict losses summed over layers
    (E2E/main_pretrain.py:608-640).  num_points enables mmdet's point-sampled
    mask losses (12544 in the reference) for high-resolution tiles."""
    from samrs_tpu.seg.decoders.mask2former import mask2former_loss

    # donate the input state: params + two AdamW moments are the largest
    # buffers in a training step; without donation a second full copy is
    # live across the update (the 1024^2 Mask2Former step OOMs on it)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batches, dropout_rng):
        def loss_fn(params):
            # a None batch skips that head this step (alternating-head
            # schedules at high resolution)
            xs = [None if b is None else b[0] for b in batches]
            variables = {"params": params, "batch_stats": state.batch_stats}
            rng = jax.random.fold_in(dropout_rng, state.step)
            outs, updated = model.apply(
                variables, xs, True, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
            losses = []
            for i, (o, b, nc) in enumerate(zip(outs, batches, num_classes)):
                if o is None:
                    continue
                d = mask2former_loss(
                    o, b[1], nc, num_points=num_points,
                    rng=jax.random.fold_in(rng, 1000 + i) if num_points else None,
                )
                losses.append(d["loss_cls"] + d["loss_mask"] + d["loss_dice"])
            return sum(losses), (updated.get("batch_stats", {}), losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        metrics = {"loss": loss, **{f"loss_{i}": l for i, l in enumerate(losses)}}
        return new_state, metrics

    return train_step


def make_finetune_step(model, tx) -> Callable:
    # donate the input state: params + two AdamW moments are the largest
    # buffers in a training step; without donation a second full copy is
    # live across the update (the 1024^2 Mask2Former step OOMs on it)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y, dropout_rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            rng = jax.random.fold_in(dropout_rng, state.step)
            out, updated = model.apply(
                variables, x, True, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
            return cross_entropy_ignore(out, y), updated.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt,
            ),
            {"loss": loss},
        )

    return train_step


def make_eval_step(model, num_classes: int, head_idx: Optional[int] = None) -> Callable:
    """Returns per-batch (intersection, target, union) histograms, computed on
    device (intersectionAndUnionGPU equivalent, ED/utils.py:37-53)."""

    @jax.jit
    def eval_step(params, batch_stats, x, y):
        variables = {"params": params, "batch_stats": batch_stats}
        if head_idx is None:
            logits = model.apply(variables, x, False)
        else:
            logits = model.apply(variables, x, head_idx, False, method=type(model).forward_one)
        pred = jnp.argmax(logits, axis=-1)
        return intersection_and_union(pred, y, num_classes)

    return eval_step
