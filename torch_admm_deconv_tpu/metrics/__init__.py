from torch_admm_deconv_tpu.metrics import functional  # noqa: F401
from torch_admm_deconv_tpu.metrics.color import rgb_to_grayscale, rgb_to_lab  # noqa: F401
from torch_admm_deconv_tpu.metrics.functional import (  # noqa: F401
    mae,
    mse,
    ms_ssim,
    psnr,
    scc,
    ssim,
    uiq,
)
from torch_admm_deconv_tpu.metrics.losses import (  # noqa: F401
    MAELoss,
    Metric,
    MSE,
    MSSSIMLoss,
    MSSSIMMetric,
    PSNRLoss,
    PSNRMetric,
    SCCMetric,
    SSIMLabColorLoss,
    SSIMLoss,
    SSIMMetric,
    UIQMetric,
)
