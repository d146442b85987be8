from torch_admm_deconv_tpu.kernels.fused_admm import (  # noqa: F401
    fused_elementwise_step,
    fused_step_available,
)
from torch_admm_deconv_tpu.kernels.vmem_solver import (  # noqa: F401
    adaptive_vmem_available,
    admm_tv_adaptive_vmem,
    admm_tv_vmem,
    vmem_solve_available,
)
