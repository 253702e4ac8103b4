"""SamPredictor: the primary user-facing inference API.

Behavioral reference: GD/segment_anything/predictor.py
  * set_image: longest-side resize -> preprocess -> encoder once, cached (:34-90)
  * predict: numpy prompt transform -> device decode (:92-166)
  * predict_torch equivalent: `predict_batched` (fixed-shape, jitted) (:168-245)
  * get_image_embedding (:247)

TPU-first design:
  * every device function is jitted once per (bucket, multimask) shape key;
    prompt counts are padded up to the next bucket so arbitrary per-image box
    counts (1..2k in DOTA) never trigger recompiles;
  * box prompts are decoded as one batched call over all boxes (the reference
    loops batches of 20 through the decoder);
  * mask upscaling to original resolution runs on device in the same jit as
    thresholding, returning packed bool masks.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.sam.sam import Sam, postprocess_masks, preprocess
from samrs_tpu.sam.transforms import ResizeLongestSide

DEFAULT_BUCKETS = (1, 4, 16, 64, 256, 1024, 4096)


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)  # np.packbits order


def packbits2d(m: jnp.ndarray) -> jnp.ndarray:
    """(..., W) bool -> (..., ceil(W/8)) uint8, np.packbits bit order.

    Device-side mask compression: binary masks leave the device 8x smaller
    (a (64, 1024, 1024) mask chunk is 8.4 MB packed instead of 67 MB — the
    D2H transfer dominates the generation drivers on tunneled transports and
    still costs PCIe time on local hardware)."""
    W = m.shape[-1]
    pad = (-W) % 8
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    mu = m.reshape(*m.shape[:-1], (W + pad) // 8, 8).astype(jnp.int32)
    return jnp.sum(mu * jnp.asarray(_BIT_WEIGHTS), axis=-1).astype(jnp.uint8)


def unpackbits2d(packed: np.ndarray, width: int) -> np.ndarray:
    """Host inverse of packbits2d: (..., ceil(W/8)) uint8 -> (..., W) bool."""
    out = np.unpackbits(np.asarray(packed, np.uint8), axis=-1)
    return out[..., :width].astype(bool)


class SamPredictor:
    def __init__(
        self,
        model: Sam,
        variables: Any,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        decode_chunk: int = 256,
    ):
        self._jit_cache: Dict[Any, Any] = {}
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.buckets = buckets
        self.decode_chunk = decode_chunk
        self.transform = ResizeLongestSide(self.cfg.image_size)
        self.reset_image()

        cfg = self.cfg

        @jax.jit
        def _encode(variables, x):
            x = preprocess(x, cfg.pixel_mean, cfg.pixel_std, cfg.image_size)
            return model.apply(variables, x, method=Sam.encode_image)

        @functools.partial(jax.jit, static_argnames=("multimask_output",))
        def _decode(variables, features, points, labels, mask_inputs, multimask_output):
            n = points.shape[0]
            chunk = self.decode_chunk
            if mask_inputs is not None or n <= chunk or n % chunk != 0:
                return model.apply(
                    variables,
                    features,
                    points,
                    labels,
                    mask_inputs,
                    multimask_output,
                    method=Sam.predict,
                )
            # Large prompt buckets: the two-way transformer broadcasts the full
            # (64,64,256) image embedding per prompt, so a 4096-box decode would
            # materialize ~17 GB of fp32 image-side activations.  lax.map over
            # fixed-size chunks bounds live memory at `chunk` prompts while the
            # per-box cost stays flat (measured: see bench.py --buckets).
            def one(args):
                p, l = args
                return model.apply(
                    variables, features, p, l, None, multimask_output,
                    method=Sam.predict,
                )

            pts = points.reshape(n // chunk, chunk, *points.shape[1:])
            labs = labels.reshape(n // chunk, chunk, *labels.shape[1:])
            low, iou = jax.lax.map(one, (pts, labs))
            return (
                low.reshape(n, *low.shape[2:]),
                iou.reshape(n, *iou.shape[2:]),
            )

        @functools.partial(
            jax.jit, static_argnames=("input_size", "original_size", "binarize")
        )
        def _postprocess(masks, input_size, original_size, binarize):
            out = postprocess_masks(masks, input_size, original_size, cfg.image_size)
            if binarize:
                out = out > cfg.mask_threshold
            return out

        @functools.partial(
            jax.jit, static_argnames=("input_size", "original_size", "offset")
        )
        def _amg_chunk(variables, features, points, labels, input_size,
                       original_size, offset):
            """Device-side AMG chunk post: decode + upscale + stability sums +
            boxes + THRESHOLDED BIT-PACKED masks.  The first AMG design
            fetched the (nb, 3, H, W) fp32 logit masks to the host
            (~800 MB/batch at 1024² — 13 GB/image through the device
            transport); here only O(nb) scalars leave the device eagerly and
            survivors' masks are fetched bit-packed (amg_take_packed).
            Returns (stats (nb, nm, 7) fp32 = [iou, hi, lo, x0, y0, x1, y1],
            packed (nb, nm, H, ceil(W/8)) uint8); hi/lo/box values are exact
            in fp32 (pixel counts < 2^24).

            On TPU the whole post runs as ONE fused Pallas kernel
            (kernels/amg_post.py): the XLA composition materializes the
            (nb*nm, H, W) fp32 logit masks in HBM and re-reads them for
            every stat (~4 GB of traffic per 64-prompt chunk at 1024² —
            the measured 125 s/img AMG was HBM-bound here)."""
            low_res, iou = _decode(variables, features, points, labels, None,
                                   True)
            if jax.default_backend() == "tpu":
                from samrs_tpu.kernels.amg_post import amg_postprocess

                nb, nm, g, _ = low_res.shape
                hi, lo, boxes, packed = amg_postprocess(
                    low_res.reshape(nb * nm, g, g), input_size, original_size,
                    cfg.image_size, cfg.mask_threshold, offset,
                )
                stats = jnp.concatenate(
                    [iou.reshape(nb * nm, 1), hi[:, None], lo[:, None],
                     boxes.astype(jnp.float32)], axis=-1,
                ).reshape(nb, nm, 7)
                Ho, Wp = packed.shape[-2:]
                return stats, packed.astype(jnp.uint8).reshape(nb, nm, Ho, Wp)
            masks = _postprocess(low_res, input_size, original_size, False)
            mt = cfg.mask_threshold
            hi = jnp.sum(masks > (mt + offset), axis=(-1, -2), dtype=jnp.int32)
            lo = jnp.sum(masks > (mt - offset), axis=(-1, -2), dtype=jnp.int32)
            mb = masks > mt
            ys = jnp.any(mb, axis=-1)
            xs = jnp.any(mb, axis=-2)
            H, W = ys.shape[-1], xs.shape[-1]
            top = jnp.argmax(ys, -1)
            bot = H - 1 - jnp.argmax(ys[..., ::-1], -1)
            left = jnp.argmax(xs, -1)
            right = W - 1 - jnp.argmax(xs[..., ::-1], -1)
            # inclusive xyxy (batched_mask_to_box convention); zeros if empty
            boxes = jnp.stack([left, top, right, bot], -1).astype(jnp.int32)
            boxes = jnp.where(jnp.any(ys, -1)[..., None], boxes, 0)
            stats = jnp.concatenate(
                [
                    iou[..., None],
                    hi[..., None].astype(jnp.float32),
                    lo[..., None].astype(jnp.float32),
                    boxes.astype(jnp.float32),
                ],
                axis=-1,
            )
            return stats, packbits2d(mb)

        self._encode = _encode
        self._decode = _decode
        self._postprocess = _postprocess
        self._amg_chunk = _amg_chunk

    # ------------------------------------------------------------------ image

    def reset_image(self) -> None:
        self.is_image_set = False
        self.features: Optional[jnp.ndarray] = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    def encode_images(self, images: Sequence[np.ndarray]):
        """Batched encoder pass: list of HWC uint8 images (any sizes) -> list
        of (features, original_size, input_size) for `set_image_features`.

        One jit call encodes the whole batch (B=4 lifts v5e MXU utilization
        ~18% over per-image encodes); the reference encodes 1 image per call.
        """
        cfg = self.cfg
        metas = []
        padded = np.zeros((len(images), cfg.image_size, cfg.image_size, 3), np.float32)
        for i, image in enumerate(images):
            resized = self.transform.apply_image(image)
            padded[i, : resized.shape[0], : resized.shape[1]] = resized
            metas.append((image.shape[:2], resized.shape[:2]))
        # valid sizes are TRACED arguments, so mixed-size fleets compile ONE
        # encoder variant per batch count (not one per size combination)
        key = ("enc_batch", len(images))
        fn = self._jit_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(variables, x, hw):
                x = (x - jnp.asarray(cfg.pixel_mean)) / jnp.asarray(cfg.pixel_std)
                row = jnp.arange(cfg.image_size)
                masks = (row[None, :, None] < hw[:, 0, None, None]) & (
                    row[None, None, :] < hw[:, 1, None, None]
                )
                x = x * masks[..., None]
                return self.model.apply(variables, x, method=Sam.encode_image)

            self._jit_cache[key] = fn
        hw = jnp.asarray([m[1] for m in metas], jnp.int32)
        feats = fn(self.variables, jnp.asarray(padded), hw)
        return [
            (feats[i : i + 1], metas[i][0], metas[i][1]) for i in range(len(images))
        ]

    def set_image_features(self, features, original_size, input_size) -> None:
        """Install precomputed encoder features (from `encode_images`)."""
        self.features = features
        self.original_size = tuple(original_size)
        self.input_size = tuple(input_size)
        self.is_image_set = True

    def set_image(self, image: np.ndarray, image_format: str = "RGB") -> None:
        """HWC uint8 image -> cached encoder features (predictor.py:34-90)."""
        assert image_format in ("RGB", "BGR")
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        # pad host-side to the full square so the encoder jit sees one shape
        pad_h = self.cfg.image_size - resized.shape[0]
        pad_w = self.cfg.image_size - resized.shape[1]
        padded = np.zeros((self.cfg.image_size, self.cfg.image_size, 3), dtype=resized.dtype)
        padded[: resized.shape[0], : resized.shape[1]] = resized
        # NOTE: preprocess normalizes then pads with zeros in the reference;
        # padding raw pixels with zeros then normalizing shifts the pad value,
        # so mask the normalized pad region back to zero on device.
        x = jnp.asarray(padded[None]).astype(jnp.float32)
        feats = self._encode_padded(self.variables, x, self.input_size)
        self.features = feats
        self.is_image_set = True

    def _encode_padded(self, variables, x, input_size):
        cfg = self.cfg
        key = "enc"  # input_size is traced, so one compile covers every size
        fn = self._jit_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(variables, x, hw):
                x = (x - jnp.asarray(cfg.pixel_mean)) / jnp.asarray(cfg.pixel_std)
                row = jnp.arange(cfg.image_size)
                valid = (row[:, None] < hw[0]) & (row[None, :] < hw[1])
                x = x * valid[None, :, :, None]
                return self.model.apply(variables, x, method=Sam.encode_image)

            self._jit_cache[key] = fn
        return fn(variables, x, jnp.asarray(input_size, jnp.int32))

    # ---------------------------------------------------------------- predict

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Single prompt set -> (masks (M,H,W), iou (M,), low_res (M,256,256)).

        Numpy-in/numpy-out, matching predictor.py:92-166.
        """
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        if point_coords is None and box is None:
            if mask_input is None:
                raise ValueError("at least one of point_coords/box/mask_input required")
            # mask-only prompt: the reference passes EMPTY sparse embeddings
            # (prompt_encoder.py:155-160 makes a (B, 0, C) tensor), so zero
            # point tokens — NOT a not-a-point pad — is the parity-exact shape.
            # NB: bucket=0 is its own jit shape key -> one extra cold compile
            # the first time a mask-only prompt runs on the TPU remote-compile
            # service (warm it with a dummy call if that matters).
            pts = np.zeros((0, 2), np.float32)
            labs = np.zeros((0,), np.int32)
        else:
            pts, labs = self._prompts_to_points(point_coords, point_labels, box)
        masks, iou, low_res = self._predict_padded(
            pts[None], labs[None], mask_input, multimask_output, return_logits
        )
        return masks[0], iou[0], low_res[0]

    def predict_boxes(
        self,
        boxes: np.ndarray,
        multimask_output: bool = False,
        return_logits: bool = False,
        return_lowres_only: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched box decode: (N, 4) xyxy -> (masks, iou, low_res).

        One jit call decodes every box (bucket-padded), replacing the
        reference's Python loop over batches of 20 (main_sam_hbox_semantic.py:167).
        """
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        n = boxes.shape[0]
        nb = _bucket(n, self.buckets)
        tb = self.transform.apply_boxes(boxes, self.original_size).reshape(-1, 2, 2)
        pts = np.zeros((nb, 2, 2), np.float32)
        labs = np.full((nb, 2), -1, np.int32)
        pts[:n] = tb
        labs[:n, 0] = 2  # top-left corner embedding
        labs[:n, 1] = 3  # bottom-right corner embedding
        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(pts), jnp.asarray(labs), None,
            multimask_output,
        )
        if return_lowres_only:
            return np.asarray(low_res[:n]), np.asarray(iou[:n]), np.asarray(low_res[:n])
        out = self._postprocess(
            low_res, tuple(self.input_size), tuple(self.original_size), not return_logits
        )
        return np.asarray(out[:n]), np.asarray(iou[:n]), np.asarray(low_res[:n])

    def predict_points(
        self,
        point_coords: np.ndarray,
        multimask_output: bool = False,
        return_logits: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched single-point decode: (N, 2) foreground points, one prompt
        per point, in ONE bucket-padded jit call (the point twin of
        `predict_boxes`; each row is [point(label 1), not-a-point pad],
        exactly the reference's single-point prompt shape
        prompt_encoder.py:81-87)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        n = point_coords.shape[0]
        nb = _bucket(n, self.buckets)
        tc = self.transform.apply_coords(
            point_coords.astype(np.float32), self.original_size
        )
        pts = np.zeros((nb, 2, 2), np.float32)
        labs = np.full((nb, 2), -1, np.int32)
        pts[:n, 0] = tc
        labs[:n, 0] = 1
        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(pts), jnp.asarray(labs), None,
            multimask_output,
        )
        out = self._postprocess(
            low_res, tuple(self.input_size), tuple(self.original_size), not return_logits
        )
        return np.asarray(out[:n]), np.asarray(iou[:n]), np.asarray(low_res[:n])

    def predict_mask_prompts(
        self,
        mask_inputs: np.ndarray,
        multimask_output: bool = False,
        return_logits: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched mask-only decode: (N, 4g, 4g) low-res logit canvases with
        ZERO sparse tokens per prompt (the reference's empty sparse-embedding
        path, prompt_encoder.py:155-160), in ONE bucket-padded jit call."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        n = mask_inputs.shape[0]
        nb = _bucket(n, self.buckets)
        mi = np.zeros((nb, *mask_inputs.shape[-2:], 1), np.float32)
        mi[:n] = np.asarray(mask_inputs, np.float32)[..., None]
        pts = np.zeros((nb, 0, 2), np.float32)
        labs = np.zeros((nb, 0), np.int32)
        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(pts), jnp.asarray(labs),
            jnp.asarray(mi), multimask_output,
        )
        out = self._postprocess(
            low_res, tuple(self.input_size), tuple(self.original_size), not return_logits
        )
        return np.asarray(out[:n]), np.asarray(iou[:n]), np.asarray(low_res[:n])

    def predict_boxes_lowres(self, boxes: np.ndarray, multimask_output: bool = False):
        """Device-resident batched decode: (N,4) xyxy -> (low_res (Nb,M,g4,g4),
        iou (Nb,M)) jax arrays, Nb = bucket-padded N.  The generation pipeline
        keeps these on device and post-processes in fixed-size chunks."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        n = boxes.shape[0]
        nb = _bucket(n, self.buckets)
        tb = self.transform.apply_boxes(boxes, self.original_size).reshape(-1, 2, 2)
        pts = np.zeros((nb, 2, 2), np.float32)
        labs = np.full((nb, 2), -1, np.int32)
        pts[:n] = tb
        labs[:n, 0] = 2
        labs[:n, 1] = 3
        return self._decode(
            self.variables, self.features, jnp.asarray(pts), jnp.asarray(labs), None,
            multimask_output,
        )

    def upscale_chunk(self, low_res_chunk, binarize: bool = True):
        """(C, M, g4, g4) low-res logits -> (C, M, *original_size) on device."""
        return self._postprocess(
            low_res_chunk, tuple(self.input_size), tuple(self.original_size), binarize
        )

    def fetch_masks_packed(self, masks) -> np.ndarray:
        """Fetch device binary masks (..., H, W) to the host via bit-packing
        (8x less D2H traffic); returns a host bool array of the same shape."""
        key = ("packbits", masks.shape, str(masks.dtype))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(packbits2d)
            self._jit_cache[key] = fn
        return unpackbits2d(np.asarray(fn(masks)), masks.shape[-1])

    def amg_sweep(self, pts: np.ndarray, labs: np.ndarray, offset: float):
        """AMG grid sweep: dispatch every `points_per_batch` chunk of the
        crop's point grid asynchronously, stack the per-chunk results on
        DEVICE, and return (stats (G*nb, nm, 7) device fp32, packed
        (G*nb*nm, H, ceil(W/8)) device uint8) for exactly one stats fetch +
        one survivors gather per crop.

        The chunk executable is a single fixed-shape jit (compiles once per
        crop size, like the decode buckets); a whole-grid ``lax.map`` variant
        measured >30 min in the remote-compile service vs ~2 min for the
        chunk program, so the loop stays on the host — dispatch is async, so
        device work still pipelines back-to-back.  pts: (G, nb, 2, 2) fp32;
        labs: (G, nb, 2) int32."""
        G = pts.shape[0]
        # ONE host->device upload for the whole grid, then device-side
        # slices per chunk: per-chunk jnp.asarray(pts[g]) paid a blocking
        # transport round trip per chunk through the tunneled runtime
        # (2G uploads -> 2), while a device-array index is an async
        # dispatch; the chunk executable sees identical shapes either way.
        pts_d = jnp.asarray(pts)
        labs_d = jnp.asarray(labs)
        chunks = [
            self._amg_chunk(
                self.variables, self.features, pts_d[g], labs_d[g],
                tuple(self.input_size), tuple(self.original_size), offset,
            )
            for g in range(G)
        ]
        stats = jnp.concatenate([c[0] for c in chunks])          # (G*nb, nm, 7)
        packed = jnp.concatenate([c[1] for c in chunks])         # (G*nb, nm, H, Wp)
        return stats, packed.reshape(-1, *packed.shape[-2:])

    def amg_take_packed(self, packed, idx: np.ndarray) -> np.ndarray:
        """Gather survivor rows of a device (N, H, Wp) packed-mask array by
        host indices and fetch ONLY those (bucket-padded so the gather jit
        compiles once per bucket); returns (len(idx), H, Wp) uint8 on host."""
        n = len(idx)
        if n == 0:
            return np.zeros((0, *packed.shape[-2:]), np.uint8)
        nb = _bucket(n, self.buckets)
        pad_idx = np.zeros(nb, np.int32)
        pad_idx[:n] = idx
        key = ("amg_take", packed.shape, nb)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
            self._jit_cache[key] = fn
        return np.asarray(fn(packed, jnp.asarray(pad_idx)))[:n]

    # ------------------------------------------------------------- internals

    def _prompts_to_points(
        self,
        point_coords: Optional[np.ndarray],
        point_labels: Optional[np.ndarray],
        box: Optional[np.ndarray],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Merge point/box prompts into one (N,2)/(N,) array pair.

        Follows predictor.py / prompt_encoder.py semantics: box becomes two
        corner points with labels 2/3; when points are given without a box,
        a single not-a-point pad entry is appended (prompt_encoder.py:81-87).
        """
        parts_p, parts_l = [], []
        if point_coords is not None:
            assert point_labels is not None
            tc = self.transform.apply_coords(point_coords, self.original_size)
            parts_p.append(tc.astype(np.float32))
            parts_l.append(point_labels.astype(np.int32))
            if box is None:
                parts_p.append(np.zeros((1, 2), np.float32))
                parts_l.append(np.full((1,), -1, np.int32))
        if box is not None:
            tb = self.transform.apply_boxes(box.reshape(1, 4), self.original_size)
            parts_p.append(tb.reshape(2, 2).astype(np.float32))
            parts_l.append(np.array([2, 3], np.int32))
        if not parts_p:
            raise ValueError("at least one of point_coords/box must be provided")
        return np.concatenate(parts_p, 0), np.concatenate(parts_l, 0)

    def _predict_padded(self, pts, labs, mask_input, multimask_output, return_logits):
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input.reshape(1, *mask_input.shape[-2:], 1), jnp.float32)
        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(pts), jnp.asarray(labs), mi,
            multimask_output,
        )
        masks = self._postprocess(
            low_res, tuple(self.input_size), tuple(self.original_size), not return_logits
        )
        return np.asarray(masks), np.asarray(iou), np.asarray(low_res)

    def get_image_embedding(self) -> jnp.ndarray:
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        return self.features
