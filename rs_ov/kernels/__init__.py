from rs_ov.kernels.adaptive_conv import adaptive_conv_pallas  # noqa: F401
from rs_ov.kernels.selfself_attention import fused_selfself_attention  # noqa: F401
