from rs_ov.decontam.outlier import detect_outliers_by_attention, outlier_suppress  # noqa: F401
from rs_ov.decontam.similarity import compute_similarity_map  # noqa: F401
from rs_ov.decontam.self_attn_enhance import self_attention_enhance  # noqa: F401
from rs_ov.decontam.global_debias import global_debias  # noqa: F401
from rs_ov.decontam.layer_fusion import fuse_attention_ema, layer_fusion_reweight  # noqa: F401
