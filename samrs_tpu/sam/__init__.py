from samrs_tpu.sam.image_encoder import ImageEncoderViT  # noqa: F401
from samrs_tpu.sam.prompt_encoder import PromptEncoder, PositionEmbeddingRandom  # noqa: F401
from samrs_tpu.sam.transformer import TwoWayTransformer  # noqa: F401
from samrs_tpu.sam.mask_decoder import MaskDecoder  # noqa: F401
from samrs_tpu.sam.sam import Sam  # noqa: F401
from samrs_tpu.sam.build import build_sam, sam_model_registry  # noqa: F401
from samrs_tpu.sam.predictor import SamPredictor  # noqa: F401
from samrs_tpu.sam.transforms import ResizeLongestSide  # noqa: F401
from samrs_tpu.sam.automatic_mask_generator import SamAutomaticMaskGenerator  # noqa: F401
from samrs_tpu.sam.export import SamExportModel, export_decoder, load_exported  # noqa: F401
