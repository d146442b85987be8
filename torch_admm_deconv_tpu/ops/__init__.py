from torch_admm_deconv_tpu.ops.prox import (  # noqa: F401
    abs2,
    block_thresh,
    hard_thresh,
    identity,
    pixelnorm,
    soft_thresh,
)
from torch_admm_deconv_tpu.ops.fdops import (  # noqa: F401
    conv_circular,
    dx,
    dx_t,
    dy,
    dy_t,
    freq_denominator,
    grad_otf_abs2,
    htran_operator,
    psf_otf,
)
from torch_admm_deconv_tpu.ops.mxu_fft import (  # noqa: F401
    freq_solve_mxu,
    irfft2_mxu,
    rfft2_mxu,
)
from torch_admm_deconv_tpu.ops.implicit import admm_tv_implicit  # noqa: F401
from torch_admm_deconv_tpu.ops.solver import (  # noqa: F401
    AdaptiveResult,
    ADMMState,
    admm_tv,
    admm_tv_adaptive,
    tv_objective,
)
