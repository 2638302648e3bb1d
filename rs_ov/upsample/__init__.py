from rs_ov.upsample.jbu import (  # noqa: F401
    adaptive_conv,
    bilinear_upsample,
    init_jbu_one_params,
    init_jbu_stack_params,
    jbu_one_forward,
    jbu_stack_forward,
    get_upsampler,
)
