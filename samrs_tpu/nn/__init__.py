from samrs_tpu.nn.layers import (  # noqa: F401
    ConvTranspose2x,
    LayerNorm2d,
    MLPBlock,
    MLP,
    DropPath,
    window_partition,
    window_unpartition,
    patchify_conv,
)
