"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths compile + execute without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin at interpreter
# startup (sitecustomize) that overrides JAX_PLATFORMS; force CPU here, before
# any backend is initialized, so tests run on 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_sam():
    """A miniature SAM (image 128, embed 32) for fast CPU tests."""
    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam import Sam
    from samrs_tpu.sam.build import init_sam_variables

    cfg = sam_config(
        "vit_b",
        image_size=64,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
        window_size=2,
        prompt_embed_dim=32,
        mask_in_chans=8,
        decoder_mlp_dim=64,
        decoder_num_heads=2,
        iou_head_hidden_dim=32,
        compute_dtype="float32",
        use_flash_attention=False,
    )
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)
    return model, variables
