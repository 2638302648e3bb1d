from rs_ov.parallel.mesh import make_mesh  # noqa: F401
from rs_ov.parallel.sharding import clip_param_shardings, shard_params  # noqa: F401
