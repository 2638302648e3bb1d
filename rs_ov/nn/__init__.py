from rs_ov.nn.layers import layer_norm, linear, gelu, quick_gelu, mlp  # noqa: F401
from rs_ov.nn.attention import standard_attention, custom_attn, ATTENTION_MODES  # noqa: F401
