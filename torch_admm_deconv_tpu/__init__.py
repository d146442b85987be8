"""TPU-native ADMM deconvolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference ``georgegrosu1/torch-admm-deconv`` (see SURVEY.md): a batched,
FFT-based TV-regularized ADMM deconvolution solver, differentiable unrolled
ADMM layers with learnable PSF/lambda/rho/bias, attention-based restoration
networks (DivergentRestorer, NAFNet baseline), a paired-image data pipeline,
JAX-native metrics (PSNR/SSIM/MS-SSIM/UIQ/SCC, CIELAB color loss) and a
training harness — plus multi-chip scaling the reference never had:
data-parallel batches of independent ADMM instances and spatially tiled
megapixel solves under ``shard_map`` with ICI collectives.

Layout:
  ops/      pure-functional solver core (prox, finite differences, admm_tv)
  kernels/  Pallas TPU kernels for the hot elementwise/frequency paths
  parallel/ mesh setup, data-parallel and spatially-sharded solvers
  models/   Flax modules (ADMMDeconv, attention zoo, restorers, NAFNet)
  data/     paired-image datasets, transforms, synthetic blur builders
  metrics/  image metrics and losses in JAX
  train/    trainer / saver / logger / schedules
  utils/    path and misc helpers
"""

__version__ = "0.1.0"

from torch_admm_deconv_tpu.ops.implicit import admm_tv_implicit  # noqa: F401
from torch_admm_deconv_tpu.ops.solver import (  # noqa: F401
    ADMMState,
    admm_tv,
    admm_tv_adaptive,
    tv_objective,
)
from torch_admm_deconv_tpu.ops.prox import (  # noqa: F401
    block_thresh,
    hard_thresh,
    pixelnorm,
    soft_thresh,
)
