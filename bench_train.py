"""Training-side benchmark: SEP pretrain step throughput on one TPU chip.

Measures the reference's training hot loop (SURVEY.md §3.3 / config #5):
MultiHeadSegModel forward over 3 dataset heads + summed CE(255) + grads +
layer-decay AdamW update, at 224 px and the reference's global batch 96
(ED/Readme.md:60-68), all on one chip.

Usage: python bench_train.py [backbone] [decoder] [batch]
Prints ONE JSON line per run: {"metric", "value", "unit", "note"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(backbone: str = "vit_b_rvsa", decoder: str = "upernet",
         batch: int = 96, iters: int = 6, image_size: int = 224,
         remat: bool = False) -> None:
    from samrs_tpu.seg.frameworks import MultiHeadSegModel
    from samrs_tpu.train.optim import build_optimizer, warmup_cosine_schedule
    from samrs_tpu.train.trainer import TrainState, make_pretrain_step

    on_tpu = jax.default_backend() == "tpu"
    num_classes = (18, 20, 37)  # SOTA / SIOR / FAST
    model = MultiHeadSegModel(
        backbone=backbone, decoder=decoder, num_classes=num_classes,
        image_size=image_size,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        remat=remat,
    )
    # proportional split of the global batch (ED/main_pretrain.py:233-269)
    sizes = np.array([17480, 11725, 64147], np.float64)
    per = np.maximum(1, np.round(batch * sizes / sizes.sum()).astype(int))

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    xs0 = [jnp.zeros((1, image_size, image_size, 3), jnp.float32)] * 3
    variables = model.init(rngs, xs0, True)
    sched = warmup_cosine_schedule(6e-5, 80000, warmup_steps=1500)
    tx = build_optimizer(variables["params"], sched, layer_decay=0.9, num_layers=12)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
    train_step = make_pretrain_step(model, tx)

    rng = np.random.default_rng(0)
    batches = tuple(
        (
            jnp.asarray(rng.random((int(b), image_size, image_size, 3)), jnp.float32),
            jnp.asarray(rng.integers(0, nc, (int(b), image_size, image_size)), jnp.int32),
        )
        for b, nc in zip(per, num_classes)
    )

    # warmup/compile; host fetch is the only reliable sync through the
    # remote-compile transport
    state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        # state threads through, so iterations chain without host syncs
        state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    img_per_s = int(per.sum()) / dt

    print(
        json.dumps(
            {
                "metric": f"SEP pretrain {backbone}+{decoder} images/sec/chip "
                          f"(B={int(per.sum())} @ {image_size}px, fwd+bwd+optim"
                          + (", remat)" if remat else ")"),
                "value": round(img_per_s, 2),
                "unit": "img/s",
                "note": f"step {dt * 1000:.1f} ms; reference budget 80k iters "
                        "at global batch 96 on 8 GPUs (ED/Readme.md:60-68)",
            }
        )
    )


if __name__ == "__main__":
    # bench_train.py [backbone] [decoder] [batch] [image_size] [flags...]
    # flags: remat, fused_mlp (set_default_mlp_impl("fused") for backbones
    # that default to the XLA MLP at small maps), flash_attn (Pallas flash
    # forward + XLA backward in the seg backbones' full-attention blocks)
    a = sys.argv[1:]
    flags = set(a[4:])
    if "fused_mlp" in flags:
        from samrs_tpu.nn import layers

        layers.set_default_mlp_impl("fused")
    if "flash_attn" in flags:
        from samrs_tpu.nn import layers

        layers.set_default_attn_impl("flash")
    main(
        backbone=a[0] if len(a) > 0 else "vit_b_rvsa",
        decoder=a[1] if len(a) > 1 else "upernet",
        batch=int(a[2]) if len(a) > 2 else 96,
        image_size=int(a[3]) if len(a) > 3 else 224,
        remat="remat" in flags,
    )
