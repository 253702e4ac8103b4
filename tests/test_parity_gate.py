"""End-to-end exercise of the real-checkpoint parity gate (VERDICT r3 item 5)
on random-init ported weights: the numeric path is identical to running with
official sam_vit_*.pth, only the weight values differ.

Reference load path being gated: GD/segment_anything/build_sam.py:103-106;
north star: BASELINE.json per-mask IoU >= 0.99.
"""

import json
import os

import pytest

torch = pytest.importorskip("torch")

from samrs_tpu.tools.parity_gate import run_gate  # noqa: E402

TINY = dict(
    image_size=256,
    encoder_embed_dim=32,
    encoder_depth=2,
    encoder_num_heads=2,
    encoder_global_attn_indexes=(1,),
    window_size=8,
    compute_dtype="float32",
    use_flash_attention=False,
)


def test_parity_gate_random_init_pass(tmp_path):
    out = str(tmp_path / "PARITY.json")
    result = run_gate(
        weights=None, variant="vit_b", image_dir=None, out_path=out,
        n_tiles=1, boxes_per_tile=3, random_init=True, cfg_overrides=TINY,
    )
    assert os.path.exists(out)
    on_disk = json.load(open(out))
    assert on_disk["verdict"] == result["verdict"]
    # identical ported weights through both frameworks: fp32 CPU must clear
    # the bar the gate exists to check
    assert result["reference_compared"]
    assert result["verdict"] == "PASS", on_disk
    assert result["iou_min"] >= 0.99
    assert len(result["configs"]) == 3
    for entry in result["configs"]:
        assert entry["n_masks"] == 3
        assert entry["pass"], entry


def test_parity_gate_cli_help():
    """The one-command entrypoint parses (python -m samrs_tpu.tools.parity_gate)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "samrs_tpu.tools.parity_gate", "--help"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0
    assert "sam_vit_" in proc.stdout
