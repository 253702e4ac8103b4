"""Segmentation model frameworks.

Behavioral reference: ED/models.py
  * SemsegPretrnFramework (:52-318): shared encoder+decoder, THREE
    dataset-specific heads (SOTA 18 / SIOR 20 / FAST 37 classes); forward runs
    encoder+decoder once per active dataset batch.
  * SemsegFinetuneFramework (:319-530): one head.

Heads follow the reference: unet-style decoders get a 3x3 conv head
(models.py:14-21), upernet gets dropout(0.1) + 1x1 conv (models.py:184-197).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.seg.registry import get_backbone, get_decoder

Dtype = Any


class SegHead(nn.Module):
    num_classes: int
    kernel: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        p = self.kernel // 2
        return nn.Conv(
            self.num_classes, (self.kernel, self.kernel), padding=((p, p), (p, p)),
            dtype=jnp.float32, name="conv",
        )(x.astype(jnp.float32))


class MultiHeadSegModel(nn.Module):
    """Shared encoder+decoder with N classification heads (pretrain: N=3)."""

    backbone: str = "vit_b_rvsa"
    decoder: str = "upernet"
    num_classes: Tuple[int, ...] = (18, 20, 37)  # SOTA / SIOR / FAST
    image_size: int = 224
    dtype: Dtype = jnp.float32
    # rematerialize encoder activations in the backward pass (the reference's
    # torch.utils.checkpoint option, vit_win_rvsa_v3_wsz7.py:799-800) — trades
    # ~30% step time for fitting large per-chip batches
    remat: bool = False

    def setup(self) -> None:
        # PER-BLOCK remat (use_checkpoint): backward recomputes one block at a
        # time, so peak memory is one block's internals + boundaries.  A
        # whole-encoder nn.remat wrap saves almost nothing: the recomputed
        # forward re-materializes every block's activations before the
        # backward consumes them in reverse (measured: rvsa@512 B=8
        # 16.02G -> 16.01G).  Probe by constructing with use_checkpoint=True
        # (flax modules are dataclasses — an unsupported field raises
        # TypeError) so new ViT-family backbones get it without editing an
        # allowlist; others fall back to the coarse wrap with a warning.
        self._block_remat = False
        if self.remat:
            try:
                self.encoder = get_backbone(
                    self.backbone, image_size=self.image_size,
                    dtype=self.dtype, use_checkpoint=True,
                )
                self._block_remat = True
            except TypeError:
                import logging

                logging.getLogger(__name__).warning(
                    "backbone %r has no use_checkpoint field; remat=True falls "
                    "back to a whole-encoder remat wrap (measured to save "
                    "almost no memory — prefer a smaller batch)", self.backbone,
                )
        if not self._block_remat:
            self.encoder = get_backbone(self.backbone, image_size=self.image_size,
                                        dtype=self.dtype)
        self.seg_decoder = get_decoder(
            self.decoder, self.encoder.out_channels, dtype=self.dtype
        )
        head_kernel = 3 if self.decoder in ("unet", "unetpp") else 1
        head_dropout = 0.0 if self.decoder in ("unet", "unetpp") else 0.1
        self.heads = [
            SegHead(nc, kernel=head_kernel, dropout=head_dropout, name=f"head_{i}")
            for i, nc in enumerate(self.num_classes)
        ]

    def forward_one(self, x: jnp.ndarray, head_idx: int, train: bool = False) -> jnp.ndarray:
        if self.remat and not self._block_remat:
            # coarse fallback for backbones without use_checkpoint support
            feats = nn.remat(
                lambda enc, xx: enc(xx, train=train), prevent_cse=False
            )(self.encoder, x)
        else:
            feats = self.encoder(x, train=train)
        d = self.seg_decoder(feats, train=train)
        return self.heads[head_idx](d, train=train)

    def __call__(
        self, xs: Sequence[Optional[jnp.ndarray]], train: bool = False
    ) -> List[Optional[jnp.ndarray]]:
        """xs: one batch per dataset (None to skip); returns per-dataset logits."""
        return [
            None if x is None else self.forward_one(x, i, train) for i, x in enumerate(xs)
        ]

    def features(self, x: jnp.ndarray, train: bool = False):
        return self.encoder(x, train=train)


class MultiHeadMask2FormerModel(nn.Module):
    """E2E variant: shared encoder + decoupled Mask2Former decoder with
    per-dataset classification heads (E2E/models.py:219-276).

    __call__ returns per-dataset lists of (cls_logits, mask_logits) per
    decoder layer, consumed by mask2former_loss / mask2former_predict."""

    backbone: str = "vit_b_rvsa"
    num_classes: Tuple[int, ...] = (18, 20, 37)
    image_size: int = 224
    num_queries: int = 100
    num_decoder_layers: int = 9
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        from samrs_tpu.seg.decoders.mask2former import Mask2FormerDecoder, Mask2FormerHead

        self.encoder = get_backbone(self.backbone, image_size=self.image_size, dtype=self.dtype)
        self.seg_decoder = Mask2FormerDecoder(
            in_channels=tuple(self.encoder.out_channels[1:]),
            num_queries=self.num_queries,
            num_decoder_layers=self.num_decoder_layers,
            dtype=self.dtype,
        )
        self.heads = [
            Mask2FormerHead(nc, name=f"head_{i}") for i, nc in enumerate(self.num_classes)
        ]

    def forward_one(self, x: jnp.ndarray, head_idx: int, train: bool = False):
        feats = self.encoder(x, train=train)
        outs = self.seg_decoder(feats, train=train)
        return self.heads[head_idx](outs)

    def __call__(self, xs: Sequence[Optional[jnp.ndarray]], train: bool = False):
        return [
            None if x is None else self.forward_one(x, i, train) for i, x in enumerate(xs)
        ]


class SegModel(nn.Module):
    """Single-head model (finetune/test; ED/models.py:319-530)."""

    backbone: str = "vit_b_rvsa"
    decoder: str = "upernet"
    num_classes: int = 6
    image_size: int = 512
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = get_backbone(self.backbone, image_size=self.image_size, dtype=self.dtype)
        self.seg_decoder = get_decoder(
            self.decoder, self.encoder.out_channels, dtype=self.dtype
        )
        head_kernel = 3 if self.decoder in ("unet", "unetpp") else 1
        head_dropout = 0.0 if self.decoder in ("unet", "unetpp") else 0.1
        self.head = SegHead(self.num_classes, kernel=head_kernel, dropout=head_dropout)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encoder(x, train=train)
        d = self.seg_decoder(feats, train=train)
        return self.head(d, train=train)
