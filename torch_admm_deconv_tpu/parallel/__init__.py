from torch_admm_deconv_tpu.parallel.data_parallel import (  # noqa: F401
    data_parallel_solve,
    make_dp_train_step,
    shard_batch,
)
from torch_admm_deconv_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    spatial_sharding,
)
from torch_admm_deconv_tpu.parallel.spatial import (  # noqa: F401
    irfft2_sharded,
    rfft2_sharded,
    spatial_admm_tv,
    spatial_admm_tv_adaptive,
)
