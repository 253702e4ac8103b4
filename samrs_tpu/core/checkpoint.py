"""Checkpoint save/restore (Orbax).

Behavioral reference: the reference saves driver-level dicts {epoch, iteration,
state_dict, optimizer, scheduler, loss_pretrain} as best+last plus encoder-only
copies for transfer (ED/main_pretrain.py:643-652,681-687); load side is the
mmcv-style `load_checkpoint` with prefix handling (ED/mmcv_custom/checkpoint.py).

Here the logical tree is {step, params, batch_stats, opt_state, meta}; the
encoder-only copy is the `params['encoder']` subtree saved standalone.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    """Atomic msgpack save of a pytree (flax serialization)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict converts tuples/namedtuples (e.g. optax states) to dicts
    data = serialization.msgpack_serialize(serialization.to_state_dict(_to_host(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a pytree; with `target`, shapes/structure are validated."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    tree = serialization.msgpack_restore(data)
    if target is not None:
        tree = serialization.from_state_dict(target, tree)
    return tree


def save_train_state(
    ckpt_dir: str,
    state,
    tag: str = "last",
    meta: Optional[Dict[str, Any]] = None,
    encoder_key: str = "encoder",
) -> None:
    """Save full state + encoder-only copy (main_pretrain.py:643-652,681-687)."""
    tree = {
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "meta": meta or {},
    }
    save_checkpoint(os.path.join(ckpt_dir, f"{tag}.msgpack"), tree)
    if encoder_key in state.params:
        save_checkpoint(
            os.path.join(ckpt_dir, f"{tag}_encoder.msgpack"),
            {"params": {encoder_key: state.params[encoder_key]}},
        )


def load_train_state(ckpt_dir: str, state, tag: str = "last"):
    """Restore into an existing TrainState (resume: --ft True --resume,
    ED/main_pretrain.py:413-440)."""
    tree = load_checkpoint(os.path.join(ckpt_dir, f"{tag}.msgpack"))
    from flax import serialization

    return state.replace(
        step=jax.numpy.asarray(tree["step"]),
        params=serialization.from_state_dict(state.params, tree["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats, tree["batch_stats"]),
        opt_state=serialization.from_state_dict(state.opt_state, tree["opt_state"]),
    ), dict(tree.get("meta", {}))
