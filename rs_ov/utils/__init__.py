from rs_ov.utils.resize import (  # noqa: F401
    resize_bilinear,
    resize_bicubic,
    resize_bicubic_scaled,
    adaptive_avg_pool2d,
    reflect_pad_2d,
)
