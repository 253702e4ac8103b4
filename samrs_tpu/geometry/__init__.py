from samrs_tpu.geometry.obb import (  # noqa: F401
    obb2poly,
    poly2obb,
    poly_to_hbb,
    norm_angle,
    get_best_begin_point,
)
