from torch_admm_deconv_tpu.kernels.fused_admm import (  # noqa: F401
    fused_elementwise_step,
    fused_step_available,
)
