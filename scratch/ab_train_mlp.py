"""A/B: MLP_IMPL_DEFAULT 'xla' vs 'fused' in the SEP pretrain step
(vit_b+upernet, B=12 @224, fwd+bwd+optim) on TPU.  The fused kernel's bwd
remats through the XLA composition, so the training win is fwd-only minus
one recomputed lin1 matmul — measure, don't assume."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.nn import layers


def run(impl: str, backbone: str = "vit_b", decoder: str = "upernet",
        batch: int = 12, iters: int = 6, image_size: int = 224):
    layers.set_default_mlp_impl(impl)
    from samrs_tpu.seg.frameworks import MultiHeadSegModel
    from samrs_tpu.train.optim import build_optimizer, warmup_cosine_schedule
    from samrs_tpu.train.trainer import TrainState, make_pretrain_step

    num_classes = (18, 20, 37)
    model = MultiHeadSegModel(
        backbone=backbone, decoder=decoder, num_classes=num_classes,
        image_size=image_size, dtype=jnp.bfloat16,
    )
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
        (jnp.asarray(rng.random((int(b), image_size, image_size, 3)), jnp.float32),
         jnp.asarray(rng.integers(0, nc, (int(b), image_size, image_size)), jnp.int32))
        for b, nc in zip(per, num_classes)
    )
    state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
    loss0 = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"mlp={impl}: {int(per.sum())/dt:6.1f} img/s  step {dt*1000:6.1f} ms"
          f"  (loss0 {loss0:.4f})", flush=True)


if __name__ == "__main__":
    run("xla")
    run("fused")
