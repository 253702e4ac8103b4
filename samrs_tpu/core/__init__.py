from samrs_tpu.core.config import (  # noqa: F401
    Config,
    SamConfig,
    PretrainConfig,
    FinetuneConfig,
    GenerateConfig,
)
from samrs_tpu.core.mesh import MeshSpec, make_mesh, data_sharding, replicated  # noqa: F401
from samrs_tpu.core.metrics import AverageMeter, intersection_and_union  # noqa: F401
