"""Semantic-map painting from per-instance masks.

Reference semantics (GD/main_sam_hbox_semantic.py:162-199): gray map and color
map start at 255 (ignore/white); instances are painted IN ORDER, later
instances overwriting earlier ones on overlap.

"Last instance wins" == "max instance index wins", so the device version
reduces a chunk of masks to a running max-index map (one vectorized reduce,
no sequential dependency), then gathers labels/palette — O(N*H*W) elementwise
on the VPU instead of the reference's N host-side scatter passes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.data.mapping import PALETTE


def paint_semantic(
    masks: np.ndarray, labels: np.ndarray, hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Host reference: (N, H, W) bool + (N,) labels -> (gray uint8, color uint8)."""
    h, w = hw
    gray = np.full((h, w), 255, np.uint8)
    for m, lbl in zip(masks, labels):
        gray[m.astype(bool)] = lbl
    color = PALETTE[gray]
    return gray, color


@jax.jit
def _update_cover(
    cover: jnp.ndarray, masks: jnp.ndarray, base_idx: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Fold a chunk of masks into the running last-covering-index map.

    cover: (H, W) int32, -1 where unpainted; masks: (C, H, W) bool;
    base_idx: global index of masks[0]; entries >= valid are padding and ignored.
    """
    c = masks.shape[0]
    idx = base_idx + jnp.arange(c, dtype=jnp.int32)
    live = masks & (jnp.arange(c) < valid)[:, None, None]
    chunk_best = jnp.max(jnp.where(live, idx[:, None, None], jnp.int32(-1)), axis=0)
    return jnp.maximum(cover, chunk_best)


def paint_semantic_device(
    mask_chunks, labels: np.ndarray, hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Device painting over a stream of mask chunks.

    mask_chunks: iterable of (base_idx, (C, H, W) bool jnp arrays) in instance
    order.  Returns (gray, color) uint8 host arrays.
    """
    h, w = hw
    cover = jnp.full((h, w), -1, jnp.int32)
    for base_idx, chunk in mask_chunks:
        cover = _update_cover(cover, chunk, jnp.int32(base_idx), jnp.int32(chunk.shape[0]))
    cover_h = np.asarray(cover)
    gray = np.full((h, w), 255, np.uint8)
    covered = cover_h >= 0
    gray[covered] = labels[cover_h[covered]].astype(np.uint8)
    color = PALETTE[gray]
    return gray, color
