"""Export (StableHLO) + profiling/logging utility tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_export_roundtrip(tiny_sam, tmp_path):
    from samrs_tpu.sam.export import SamExportModel, export_decoder, load_exported

    model, variables = tiny_sam
    wrapper = SamExportModel(model, variables)
    inputs = wrapper.example_inputs()
    masks, iou, low_res = wrapper(*inputs)
    S = model.cfg.image_size
    assert masks.shape[-2:] == (S, S)

    data = export_decoder(model, variables, path=str(tmp_path / "decoder.shlo"))
    assert len(data) > 1000
    exp = load_exported(str(tmp_path / "decoder.shlo"))
    m2, i2, l2 = exp.call(variables, *inputs)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(i2), atol=1e-6)


def test_export_mask_input_changes_output(tiny_sam):
    from samrs_tpu.sam.export import SamExportModel

    model, variables = tiny_sam
    wrapper = SamExportModel(model, variables)
    emb, pc, pl, mi, hm = wrapper.example_inputs()
    pc = pc.at[0, 0].set(jnp.asarray([10.0, 10.0]))
    pl = pl.at[0, 0].set(1)
    m0, _, _ = wrapper(emb, pc, pl, mi, jnp.zeros_like(hm))
    m1, _, _ = wrapper(emb, pc, pl, jnp.ones_like(mi) * 5.0, jnp.ones_like(hm))
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_export_no_mask_matches_predict(tiny_sam):
    """has_mask_input=0 must reproduce Sam.predict(mask_inputs=None) exactly —
    the exported decoder blends no_mask_embed, not mask_downscaling(zeros)
    (reference SamOnnxModel._embed_masks, onnx.py:69-74)."""
    from samrs_tpu.sam.export import SamExportModel
    from samrs_tpu.sam.sam import Sam

    model, variables = tiny_sam
    wrapper = SamExportModel(model, variables)
    emb, pc, pl, mi, hm = wrapper.example_inputs()
    pc = pc.at[0, 0].set(jnp.asarray([20.0, 12.0]))
    pl = pl.at[0, 0].set(1)
    pl = pl.at[0, 1].set(-1)
    # garbage in the (unused) mask input must not leak through when has_mask=0
    mi = jnp.ones_like(mi) * 7.0
    _, iou_e, low_e = wrapper(emb, pc, pl, mi, jnp.zeros_like(hm))

    low_p, iou_p = model.apply(
        variables, emb, pc, pl, None, False, method=Sam.predict
    )
    np.testing.assert_allclose(np.asarray(low_e), np.asarray(low_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou_e), np.asarray(iou_p), atol=1e-6)


def test_step_timer():
    from samrs_tpu.core.profiling import StepTimer

    t = StepTimer(window=4)
    t.start()
    for _ in range(5):
        t.tick()
    s = t.stats()
    assert set(s) == {"mean", "p50", "p95"}
    assert len(t.times) == 4


def test_flops_estimate():
    from samrs_tpu.core.profiling import sam_encoder_flops

    f = sam_encoder_flops(1280, 32, 64, 14, 4)  # ViT-H
    assert 1e12 < f < 1e13  # O(TFLOPs) per 1024² image


def test_logger_and_seed(tmp_path):
    from samrs_tpu.core.logging_utils import log_metrics, seed_everything, setup_logger

    logger = setup_logger("t_test", log_dir=str(tmp_path))
    log_metrics(logger, 3, {"loss": 1.25, "lr": 1e-4})
    key = seed_everything(42)
    assert key.shape == (2,)
    assert (tmp_path / "log.txt").exists()
