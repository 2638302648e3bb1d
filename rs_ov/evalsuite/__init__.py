from rs_ov.evalsuite.metrics import IoUMetric  # noqa: F401
from rs_ov.evalsuite.config import load_config  # noqa: F401
