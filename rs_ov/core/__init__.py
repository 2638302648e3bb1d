from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig, get_model_config  # noqa: F401
