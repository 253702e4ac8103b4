from samrs_tpu.data.mapping import MAPPING, DOTA2_0, DIOR, FAIR1M, CLASS_SETS  # noqa: F401
from samrs_tpu.data.rle import rle_encode, rle_decode, rle_area, rle_to_bbox  # noqa: F401
from samrs_tpu.data.loaders import load_dior, load_hrsc, load_dota, Annotation  # noqa: F401
