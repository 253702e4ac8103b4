"""Two-process data-parallel integration test (VERDICT r3 item 4).

The reference's only real parallelism is multi-process DDP with rendezvous
(ED/main_pretrain.py:111-148) and distributed metric reduction (:486).  Our
GSPMD equivalent is exercised here with REAL multiple processes:
2 x `jax.distributed.initialize` CPU processes with 4 virtual devices each
(global mesh of 8) against a single-process 8-device reference run.

Asserts:
  * eval-only mIoU on identical initial params is EXACTLY equal (integer
    histograms — catches wrong global-batch assembly, e.g. the device_put
    local-shard bug put_global fixes);
  * final params after 2 training iters agree to fp tolerance (batch order
    inside the global batch differs between the two configurations);
  * a shard_count=2 fleet generation produces exactly the single-shard
    output file set.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e; excluded from the default fast gate
from PIL import Image

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(TESTS_DIR, "_mp_worker.py")
SIZE = 32


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_seg_dataset(root, name, n_train=12, n_val=8, n_classes=5):
    r = os.path.join(root, name)
    os.makedirs(os.path.join(r, "images"))
    os.makedirs(os.path.join(r, "labels"))
    rng = np.random.default_rng(hash(name) % 2**31)
    names = [f"{name}_{i}" for i in range(n_train + n_val)]
    for nm in names:
        img = (rng.random((SIZE, SIZE, 3)) * 255).astype(np.uint8)
        lbl = rng.integers(0, n_classes, (SIZE, SIZE)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(r, "images", f"{nm}.png"))
        Image.fromarray(lbl).save(os.path.join(r, "labels", f"{nm}.png"))
    with open(os.path.join(r, "train.txt"), "w") as f:
        f.write("\n".join(names[:n_train]))
    with open(os.path.join(r, "valid.txt"), "w") as f:
        f.write("\n".join(names[n_train:]))


def _make_fleet_data(root, n_images=6):
    img_dir = os.path.join(root, "fleet_img")
    ann_dir = os.path.join(root, "fleet_ann")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        arr = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"im{i:02d}.png"))
        objs = []
        for _ in range(3):
            x0 = int(rng.integers(0, 60)); y0 = int(rng.integers(0, 60))
            objs.append(
                f"<object><name>ship</name><bndbox><xmin>{x0}</xmin>"
                f"<ymin>{y0}</ymin><xmax>{x0+20}</xmax><ymax>{y0+20}</ymax>"
                f"</bndbox></object>"
            )
        with open(os.path.join(ann_dir, f"im{i:02d}.xml"), "w") as f:
            f.write("<annotation>" + "".join(objs) + "</annotation>")
    return img_dir, ann_dir


def _clean_env():
    env = dict(os.environ)
    # the worker sets its own XLA_FLAGS/JAX_PLATFORMS before importing jax
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_NUM_CPU_DEVICES"] = ""  # defensive: no stray overrides
    env.pop("JAX_NUM_CPU_DEVICES")
    return env


def _run_workers(data_root, out_prefix, nproc, ndev, fleet=None, timeout=900):
    port = _free_port()
    procs = []
    outs = []
    for pid in range(nproc):
        out = f"{out_prefix}_p{pid}.json"
        outs.append(out)
        cmd = [
            sys.executable, WORKER, "--out", out, "--data-root", data_root,
            "--pid", str(pid), "--nproc", str(nproc), "--port", str(port),
            "--ndev", str(ndev),
        ]
        if fleet is not None:
            img_dir, ann_dir, out_dir = fleet
            cmd += ["--fleet-img-dir", img_dir, "--fleet-ann-dir", ann_dir,
                    "--fleet-out-dir", out_dir]
        procs.append(
            subprocess.Popen(cmd, env=_clean_env(), cwd=os.path.dirname(TESTS_DIR),
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True)
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    with open(outs[0]) as f:
        result = json.load(f)
    params = dict(np.load(outs[0] + ".params.npz"))
    return result, params


def test_two_process_dp_matches_single_process(tmp_path):
    data_root = str(tmp_path / "data")
    os.makedirs(data_root)
    _make_seg_dataset(data_root, "sota")
    _make_seg_dataset(data_root, "sior")
    img_dir, ann_dir = _make_fleet_data(data_root)

    ref, ref_params = _run_workers(
        data_root, str(tmp_path / "ref"), nproc=1, ndev=8,
        fleet=(img_dir, ann_dir, str(tmp_path / "fleet_1p")),
    )
    two, two_params = _run_workers(
        data_root, str(tmp_path / "two"), nproc=2, ndev=4,
        fleet=(img_dir, ann_dir, str(tmp_path / "fleet_2p")),
    )

    assert two["process_count"] == 2
    assert two["step"] == ref["step"] == 2

    # eval on identical initial params: integer histograms, exact equality
    assert two["miou_init"] == pytest.approx(ref["miou_init"], abs=1e-12), (
        "2-process eval over the assembled global batch must reproduce the "
        "single-process histogram exactly"
    )

    # trained params: same global sample set, different in-batch order ->
    # fp-tolerance agreement
    assert set(two_params) == set(ref_params)
    for k in ref_params:
        np.testing.assert_allclose(
            two_params[k], ref_params[k], rtol=2e-3, atol=2e-5,
            err_msg=f"param {k} diverged between 1-proc and 2-proc DP",
        )
    assert two["miou_final"] == pytest.approx(ref["miou_final"], abs=5e-3)

    # fleet: the union of the two shards is exactly the single-shard file set
    assert two["fleet_files"] == ref["fleet_files"]
    assert len(ref["fleet_files"]) == 6
    for f in ref["fleet_files"]:
        a = np.asarray(Image.open(tmp_path / "fleet_1p" / "gray" / f))
        b = np.asarray(Image.open(tmp_path / "fleet_2p" / "gray" / f))
        np.testing.assert_array_equal(a, b, err_msg=f"fleet output {f} differs")
