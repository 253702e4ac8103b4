from samrs_tpu.core.config import (  # noqa: F401
    Config,
    SamConfig,
    PretrainConfig,
    FinetuneConfig,
    GenerateConfig,
)
from samrs_tpu.core.mesh import MeshSpec, make_mesh, data_sharding, replicated  # noqa: F401
from samrs_tpu.core.metrics import AverageMeter, intersection_and_union  # noqa: F401
from samrs_tpu.core.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from samrs_tpu.core.partitioning import shard_params, param_spec  # noqa: F401
from samrs_tpu.core.logging_utils import setup_logger, seed_everything  # noqa: F401
from samrs_tpu.core.profiling import StepTimer, annotate, trace  # noqa: F401
