from rs_ov.pipeline.segmentor import Segmentor, SegmentorEx  # noqa: F401
from rs_ov.pipeline.tiler import compute_padsize, tile_grid  # noqa: F401
