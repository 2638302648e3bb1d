from rs_ov.data.converters.core import (  # noqa: F401
    clip_boxes,
    convert_from_color,
    rgb_to_index_matmul,
    tile_image,
)
