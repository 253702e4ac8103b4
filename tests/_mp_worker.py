"""Worker process for the two-process data-parallel integration test.

Spawned by tests/test_multiprocess.py with --nproc 2 (and once with
--nproc 1 as the single-process reference).  Each process owns
``--ndev`` virtual CPU devices; with --nproc 2 x --ndev 4 the global mesh
matches the reference single-process 8-device run, so losses/metrics/params
must agree across the two configurations (the GSPMD analogue of the
reference's multi-process DDP, ED/main_pretrain.py:111-148).

Writes a JSON result file plus (optionally) an .npz of the final params.
MUST be started directly (not under tests/conftest.py) so the env vars are
set before jax initializes.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--port", type=int, default=29417)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--fleet-img-dir", default="")
    ap.add_argument("--fleet-ann-dir", default="")
    ap.add_argument("--fleet-out-dir", default="")
    a = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={a.ndev}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{a.port}",
            num_processes=a.nproc,
            process_id=a.pid,
        )
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == a.ndev

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    import numpy as np

    from samrs_tpu.core.config import DataConfig, OptimConfig, PretrainConfig
    from samrs_tpu.core.mesh import MeshSpec, data_sharding, make_mesh
    from samrs_tpu.data.datasets import SegmentationDataset
    from samrs_tpu.data.transforms import EvalAugment
    from samrs_tpu.seg.frameworks import MultiHeadSegModel, SegHead
    from samrs_tpu.seg.backbones.swin import Swin
    from samrs_tpu.seg.decoders.unet import UnetDecoder
    from samrs_tpu.train.pretrain import evaluate, run_pretrain
    from samrs_tpu.train.trainer import make_eval_step

    SIZE = 32
    N_CLASSES = 5

    class TinyModel(MultiHeadSegModel):
        # drop_path_rate=0: sample-order-dependent randomness would break the
        # 1-proc vs 2-proc comparison (global batches contain the same
        # samples in a different order)
        def setup(self):
            self.encoder = Swin(
                embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                window_size=4, drop_path_rate=0.0,
            )
            self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
            self.heads = [
                SegHead(nc, name=f"head_{i}")
                for i, nc in enumerate((N_CLASSES, N_CLASSES))
            ]

    cfg = PretrainConfig(
        backbone="swin_t",
        decoder="unet",
        total_iters=a.iters,
        eval_interval=a.iters,
        seed=0,
        data=DataConfig(
            root=a.data_root, datasets=("sota", "sior"), image_size=SIZE,
            batch_size=16, num_workers=1, val_images=8,
        ),
        optim=OptimConfig(lr=1e-3, warmup_iters=1, layer_decay=0.9),
        ckpt_dir=os.path.join(a.data_root, f"ckpt_p{a.pid}of{a.nproc}"),
        mesh_shape=(-1,),
    )

    def make_ds(name, split):
        root = os.path.join(a.data_root, name)
        return SegmentationDataset(
            root, os.path.join(root, "images"), os.path.join(root, "labels"),
            split=split, transform=EvalAugment(SIZE),
            val_images=8,
        )

    trn = {n: make_ds(n, "trn") for n in ("sota", "sior")}
    val = {n: make_ds(n, "val") for n in ("sota", "sior")}

    model = TinyModel(num_classes=(N_CLASSES, N_CLASSES), image_size=SIZE)

    # --- part A: eval-only on the INITIAL params (exact integer histograms;
    # catches wrong global-batch assembly independent of training noise)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    import jax.numpy as jnp

    xs0 = [jnp.zeros((1, SIZE, SIZE, 3), jnp.float32) for _ in range(2)]
    variables = model.init(rngs, xs0, True)

    from samrs_tpu.train.trainer import TrainState
    import optax

    mesh = make_mesh(MeshSpec((-1,), ("data",)))
    dsh = data_sharding(mesh)
    state0 = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        optax.sgd(0.0),
    )
    eval_steps = [
        make_eval_step(model, N_CLASSES, head_idx=i) for i in range(2)
    ]
    miou_init = evaluate(cfg, model, state0, val, eval_steps,
                         (N_CLASSES, N_CLASSES), dsh)

    # --- part B: short training run (same global data set; batch order
    # differs between 1p and 2p, so parent compares with fp tolerance)
    state = run_pretrain(cfg, model=model, datasets_trn=trn, datasets_val=val)
    miou_final = evaluate(cfg, model, state, val, eval_steps,
                          (N_CLASSES, N_CLASSES), dsh)

    import flax

    flat = flax.traverse_util.flatten_dict(
        jax.device_get(jax.tree_util.tree_map(np.asarray, state.params))
    )
    params_npz = {"/".join(k): np.asarray(v, np.float64) for k, v in flat.items()}

    # --- part C (optional): fleet generation with shard_index=process_index
    fleet_files = None
    if a.fleet_img_dir:
        from samrs_tpu.core.config import GenerateConfig, sam_config
        from samrs_tpu.generate.fleet import run_fleet
        from samrs_tpu.sam.build import init_sam_variables
        from samrs_tpu.sam.sam import Sam

        scfg = sam_config(
            "vit_b", image_size=64, encoder_embed_dim=32, encoder_depth=2,
            encoder_num_heads=2, encoder_global_attn_indexes=(1,),
            compute_dtype="float32", use_flash_attention=False,
        )
        sam = Sam(scfg)
        sam_vars = init_sam_variables(sam, seed=0)
        gcfg = GenerateConfig(
            dataset="dior", image_dir=a.fleet_img_dir, ann_dir=a.fleet_ann_dir,
            save_dir=a.fleet_out_dir,
            shard_index=(jax.process_index() if a.nproc > 1 else 0),
            shard_count=a.nproc,
        )
        run_fleet(gcfg, model_and_variables=(sam, sam_vars))
        if a.nproc > 1:
            # both shards must finish writing before process 0 lists the dir
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("fleet_done")
        fleet_files = sorted(
            os.listdir(os.path.join(a.fleet_out_dir, "gray"))
        )

    if a.nproc == 1 or jax.process_index() == 0:
        np.savez(a.out + ".params.npz", **params_npz)
        with open(a.out, "w") as f:
            json.dump(
                {
                    "miou_init": miou_init,
                    "miou_final": miou_final,
                    "step": int(state.step),
                    "fleet_files": fleet_files,
                    "process_count": jax.process_count(),
                },
                f,
            )
    print(f"[worker {a.pid}/{a.nproc}] done: init {miou_init:.6f} "
          f"final {miou_final:.6f}", flush=True)


if __name__ == "__main__":
    main()
