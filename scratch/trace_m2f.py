"""Profile the Mask2Former E2E pretrain step at 1024^2 (VERDICT r3 item 8).

Runs one-chip fwd+bwd+optim steps of MultiHeadMask2FormerModel
(swin_t backbone + 6-MSDA-layer pixel decoder + 9-layer masked-attention
decoder, points-mode losses, on-device Hungarian) and captures a profiler
trace.  Parse with scratch/parse_trace.py /tmp/m2f_trace <iters>.

Usage: python scratch/trace_m2f.py [batch] [image_size] [iters]
"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np

from samrs_tpu.seg.frameworks import MultiHeadMask2FormerModel
from samrs_tpu.train.optim import build_optimizer, warmup_cosine_schedule
from samrs_tpu.train.trainer import TrainState, make_pretrain_step_mask2former

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

num_classes = (18, 20, 37)
model = MultiHeadMask2FormerModel(
    backbone="swin_t", num_classes=num_classes, image_size=S,
    dtype=jnp.bfloat16,
)
rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
xs0 = [jnp.zeros((1, S, S, 3), jnp.float32)] * 3
variables = model.init(rngs, xs0, True)
sched = warmup_cosine_schedule(1e-4, 80000, warmup_steps=1500)
tx = build_optimizer(variables["params"], sched, layer_decay=0.9, num_layers=12)
state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
train_step = make_pretrain_step_mask2former(model, tx, num_classes,
                                            num_points=12544)

rng = np.random.default_rng(0)
batches = tuple(
    (
        jnp.asarray(rng.random((B, S, S, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, nc, (B, S, S)), jnp.int32),
    )
    for nc in num_classes
)

t0 = time.perf_counter()
state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
print(f"compile+1st: {time.perf_counter()-t0:.1f}s loss={float(metrics['loss']):.3f}",
      flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
_ = float(metrics["loss"])
dt = (time.perf_counter() - t0) / iters
print(f"m2f B={B}x3heads @{S}: {dt*1000:.1f} ms/step "
      f"({3*B/dt:.2f} img/s)", flush=True)

jax.profiler.start_trace("/tmp/m2f_trace")
for _ in range(2):
    state, metrics = train_step(state, batches, jax.random.PRNGKey(2))
_ = float(metrics["loss"])
jax.profiler.stop_trace()
print("trace done", flush=True)
