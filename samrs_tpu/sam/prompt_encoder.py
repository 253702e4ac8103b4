"""SAM prompt encoder.

Behavioral reference: GD/segment_anything/modeling/prompt_encoder.py
  * random-Fourier positional encoding (2x128 Gaussian matrix, :176-219)
  * points: +0.5 pixel-center shift, pad with not-a-point when no box (:73-91)
  * boxes: 2 corner embeddings (:93-100)
  * masks: 3-conv downscaler to embed_dim (:50-59,102-105); no_mask_embed otherwise
  * get_dense_pe(): 64x64 grid PE (:62-71)

TPU-first notes: everything is batched, fixed-shape, and jittable.  Prompts are
padded to bucket sizes by the caller; padded entries carry label -1 ("not a
point"), exactly the reference's padding value, so padding is numerically
equivalent to the reference's variable-length path.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.nn.layers import LayerNorm2d

Dtype = Any


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (prompt_encoder.py:176-219)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    def setup(self) -> None:
        # The reference stores this as a fixed (non-trainable) buffer drawn as
        # scale * randn(2, num_pos_feats).  Kept as a param so checkpoint
        # porting overwrites it; it receives no gradient in practice because
        # the SAM generation path never trains.
        self.positional_encoding_gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(self.scale),
            (2, self.num_pos_feats),
        )

    def _pe_encoding(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords in [0,1] -> (..., 2*num_pos_feats)."""
        coords = 2.0 * coords - 1.0
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2.0 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]) -> jnp.ndarray:
        """Dense PE grid, returns (H, W, C) [NHWC vs reference's CHW]."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2) xy order
        return self._pe_encoding(grid)

    def forward_with_coords(
        self, coords: jnp.ndarray, image_size: Tuple[int, int]
    ) -> jnp.ndarray:
        """Normalize pixel xy coords by image size then encode (:207-214)."""
        c = coords / jnp.array([image_size[1], image_size[0]], dtype=jnp.float32)
        return self._pe_encoding(c.astype(jnp.float32))


class PromptEncoder(nn.Module):
    """Encodes point/box/mask prompts into sparse + dense embeddings.

    Fixed shapes: points (B, N, 2) with labels (B, N) in {-1, 0, 1, 2, 3};
    labels 2/3 are box corners (top-left / bottom-right), matching the
    reference's corner-embedding assignment (:93-100).  Output sparse
    embeddings are (B, N, embed_dim); dense (B, H, W, embed_dim).
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self) -> None:
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 4 point embeddings: neg point, pos point, box tl corner, box br corner
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0), (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        ch = self.mask_in_chans
        self.mask_conv1 = nn.Conv(ch // 4, (2, 2), strides=(2, 2), name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = nn.Conv(ch, (2, 2), strides=(2, 2), name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_conv3")
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )

    def get_dense_pe(self) -> jnp.ndarray:
        """(H, W, embed_dim) positional grid for the image embedding (:62-71)."""
        return self.pe_layer(self.image_embedding_size)

    def _embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        pts = points + 0.5  # pixel-center shift (:79)
        pe = self.pe_layer.forward_with_coords(pts, self.input_image_size)
        lab = labels[..., None]
        # label -1: zero out the PE entirely and use not_a_point_embed (:84-87)
        out = jnp.where(lab == -1, self.not_a_point_embed, pe)
        out = jnp.where(lab == 0, pe + self.point_embeddings[0], out)
        out = jnp.where(lab == 1, pe + self.point_embeddings[1], out)
        out = jnp.where(lab == 2, pe + self.point_embeddings[2], out)
        out = jnp.where(lab == 3, pe + self.point_embeddings[3], out)
        return out

    def _embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4*H, 4*W, 1) low-res masks -> (B, H, W, embed_dim) (:102-105)."""
        x = self.mask_conv1(masks)
        x = self.mask_ln1(x)
        x = nn.gelu(x, approximate=False)
        x = self.mask_conv2(x)
        x = self.mask_ln2(x)
        x = nn.gelu(x, approximate=False)
        return self.mask_conv3(x)

    def __call__(
        self,
        points: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
        batch: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, C), dense (B, H, W, C)).

        Boxes are passed as two points with labels (2, 3) — the caller
        (predictor) does the corner expansion, keeping this fully static-shaped.
        """
        if points is not None:
            assert labels is not None
            sparse = self._embed_points(points, labels)
            bs = points.shape[0]
        else:
            bs = batch
            sparse = jnp.zeros((bs, 0, self.embed_dim), jnp.float32)
        h, w = self.image_embedding_size
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, self.embed_dim),
                (bs, h, w, self.embed_dim),
            )
        return sparse, dense
