"""ONNX decoder export: serialization round-trip + numeric parity vs JAX.

The exported graph replicates GD/segment_anything/utils/onnx.py:17-144
(`SamOnnxModel`).  onnxruntime is not in this image, so execution parity is
checked with the in-repo numpy interpreter (samrs_tpu/onnx/interpreter.py)
against the JAX decode path, which is itself torch-parity-tested
(tests/test_torch_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samrs_tpu.core.config import sam_config
from samrs_tpu.onnx import proto
from samrs_tpu.onnx.interpreter import run, run_bytes
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.onnx_export import build_decoder_onnx, export_decoder_onnx
from samrs_tpu.sam.sam import Sam, postprocess_masks


@pytest.fixture(scope="module")
def sam_and_vars():
    cfg = sam_config("vit_b", compute_dtype="float32", use_flash_attention=False)
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=3)
    return model, variables


def _feeds(cfg, B=2, N=3, seed=0, with_mask=1.0):
    rng = np.random.default_rng(seed)
    gs = cfg.grid_size
    emb = rng.standard_normal((1, cfg.prompt_embed_dim, gs, gs)).astype(np.float32)
    coords = rng.uniform(0, cfg.image_size, (B, N, 2)).astype(np.float32)
    labels = np.array([[2, 3, -1], [1, 0, 1]], np.float32)[:B, :N]
    mask = rng.standard_normal((1, 1, 4 * gs, 4 * gs)).astype(np.float32)
    return {
        "image_embeddings": emb,
        "point_coords": coords,
        "point_labels": labels,
        "mask_input": mask,
        "has_mask_input": np.array([with_mask], np.float32),
        "orig_im_size": np.array([683.0, 1024.0], np.float32),
    }


class TestProtoCodec:
    def test_roundtrip(self):
        model = {
            "ir_version": 8,
            "producer_name": "x",
            "graph": {
                "name": "g",
                "node": [{
                    "input": ["a", "b"], "output": ["c"], "op_type": "Add",
                    "name": "n0",
                    "attribute": [
                        {"name": "axis", "i": -1, "type": proto.ATTR_INT},
                        {"name": "perm", "ints": [1, 0], "type": proto.ATTR_INTS},
                        {"name": "mode", "s": b"linear", "type": proto.ATTR_STRING},
                        {"name": "eps", "f": 1e-5, "type": proto.ATTR_FLOAT},
                    ],
                }],
                "initializer": [{
                    "dims": [2, 3], "data_type": proto.FLOAT, "name": "w",
                    "raw_data": np.arange(6, dtype=np.float32).tobytes(),
                }],
                "input": [{
                    "name": "a",
                    "type": {"tensor_type": {"elem_type": 1, "shape": {
                        "dim": [{"dim_param": "B"}, {"dim_value": 3}]}}},
                }],
                "output": [{
                    "name": "c",
                    "type": {"tensor_type": {"elem_type": 1, "shape": {
                        "dim": [{"dim_value": 2}]}}},
                }],
            },
            "opset_import": [{"domain": "", "version": 17}],
        }
        data = proto.encode_model(model)
        back = proto.decode_model(data)
        assert back["ir_version"] == 8
        g = back["graph"]
        assert g["node"][0]["op_type"] == "Add"
        attrs = {a["name"]: a for a in g["node"][0]["attribute"]}
        assert attrs["axis"]["i"] == -1            # negative varint round-trip
        assert attrs["perm"]["ints"] == [1, 0]
        assert attrs["mode"]["s"] == b"linear"
        assert abs(attrs["eps"]["f"] - 1e-5) < 1e-12
        w = g["initializer"][0]
        assert w["dims"] == [2, 3]
        assert np.frombuffer(w["raw_data"], np.float32).tolist() == list(range(6))
        assert g["input"][0]["type"]["tensor_type"]["shape"]["dim"][0]["dim_param"] == "B"


@pytest.mark.slow  # ~56 s decoder export + numpy-eval parity; full suite covers it
class TestDecoderExport:
    def test_parity_vs_jax(self, sam_and_vars):
        """Interpreter output == JAX decode (all 4 tokens, mask prompt on)."""
        model, variables = sam_and_vars
        cfg = model.cfg
        feeds = _feeds(cfg, with_mask=1.0)
        data = export_decoder_onnx(model, variables)
        out = run_bytes(data, feeds)

        # JAX twin: encode prompts, blend dense by has_mask, decode ALL tokens
        emb = jnp.asarray(feeds["image_embeddings"]).transpose(0, 2, 3, 1)
        coords = jnp.asarray(feeds["point_coords"])
        labels = jnp.asarray(feeds["point_labels"]).astype(jnp.int32)
        mask_in = jnp.asarray(feeds["mask_input"]).transpose(0, 2, 3, 1)
        sparse, dense = model.apply(variables, coords, labels, mask_in,
                                    method=Sam.encode_prompts)
        image_pe = model.apply(variables, method=Sam.dense_pe)
        low_res, iou = model.apply(
            variables, emb, image_pe, sparse, dense, None,
            method=lambda m, e, p, s, d, t: m.mask_decoder.predict_masks(
                e, p, s, d, token_idx=t),
        )
        low_res = np.asarray(low_res, np.float32)
        np.testing.assert_allclose(out["iou_predictions"],
                                   np.asarray(iou), rtol=0, atol=2e-4)
        np.testing.assert_allclose(out["low_res_masks"], low_res,
                                   rtol=0, atol=2e-3)
        # full-size masks vs the JAX postprocess (torch-exact bilinear)
        masks_jax = postprocess_masks(
            jnp.asarray(low_res), (683, 1024), (683, 1024), cfg.image_size
        )
        np.testing.assert_allclose(
            out["masks"], np.asarray(masks_jax), rtol=0, atol=5e-3
        )
        assert out["masks"].shape == (2, 4, 683, 1024)

    def test_no_mask_branch(self, sam_and_vars):
        """has_mask_input=0 must reproduce the no_mask_embed dense path."""
        model, variables = sam_and_vars
        cfg = model.cfg
        feeds = _feeds(cfg, with_mask=0.0)
        m = build_decoder_onnx(model, variables)
        out = run(m, feeds)

        emb = jnp.asarray(feeds["image_embeddings"]).transpose(0, 2, 3, 1)
        coords = jnp.asarray(feeds["point_coords"])
        labels = jnp.asarray(feeds["point_labels"]).astype(jnp.int32)
        sparse, dense = model.apply(variables, coords, labels, None,
                                    method=Sam.encode_prompts)
        image_pe = model.apply(variables, method=Sam.dense_pe)
        low_res, iou = model.apply(
            variables, emb, image_pe, sparse, dense, None,
            method=lambda m_, e, p, s, d, t: m_.mask_decoder.predict_masks(
                e, p, s, d, token_idx=t),
        )
        np.testing.assert_allclose(out["low_res_masks"],
                                   np.asarray(low_res), rtol=0, atol=2e-3)

    def test_single_mask_selection(self, sam_and_vars):
        """return_single_mask: argmax-by-reweighted-score (onnx.py:96-110)."""
        model, variables = sam_and_vars
        cfg = model.cfg
        feeds = _feeds(cfg)
        m_all = build_decoder_onnx(model, variables)
        m_one = build_decoder_onnx(model, variables, return_single_mask=True,
                                   num_points_static=feeds["point_coords"].shape[1])
        out_all = run(m_all, feeds)
        out_one = run(m_one, feeds)
        n_pts = feeds["point_coords"].shape[1]
        reweight = np.zeros((1, 4), np.float32)
        reweight[0, 0] = 1000.0
        score = out_all["iou_predictions"] + (n_pts - 2.5) * reweight
        best = score.argmax(1)
        B = score.shape[0]
        np.testing.assert_allclose(
            out_one["low_res_masks"][:, 0],
            out_all["low_res_masks"][np.arange(B), best], atol=1e-6,
        )
        np.testing.assert_allclose(
            out_one["iou_predictions"][:, 0],
            out_all["iou_predictions"][np.arange(B), best], atol=1e-6,
        )
        assert out_one["masks"].shape[1] == 1

    def test_graph_is_wellformed(self, sam_and_vars):
        """Every node input resolves; outputs are uniquely produced (SSA)."""
        model, variables = sam_and_vars
        m = build_decoder_onnx(model, variables)
        g = m["graph"]
        known = {t["name"] for t in g["initializer"]}
        known |= {vi["name"] for vi in g["input"]}
        produced = set()
        for node in g["node"]:
            for i in node["input"]:
                assert i == "" or i in known, f"{node['op_type']} consumes unknown {i}"
            for o in node["output"]:
                assert o not in produced, f"{o} produced twice"
                produced.add(o)
                known.add(o)
        for vi in g["output"]:
            assert vi["name"] in known
        # opset/ir headers for onnxruntime compatibility
        assert m["ir_version"] == 8
        assert m["opset_import"][0]["version"] == 17
