from torch_admm_deconv_tpu.models.admm_deconv import ADMMDeconv  # noqa: F401
from torch_admm_deconv_tpu.models.attention import (  # noqa: F401
    CBAM,
    AttentionChannelPooling,
    BasicConv,
    ChannelCompression,
    ChannelGate,
    ChannelPool,
    ChannelWiseAttention,
    SpatialGate,
    channel_pool,
    logsumexp_2d,
)
from torch_admm_deconv_tpu.models.autoencoder import (  # noqa: F401
    Autoencoder,
    Decoder,
    Encoder,
)
from torch_admm_deconv_tpu.models.blocks import (  # noqa: F401
    DepthwiseDownBlock,
    DivergentAttention,
    DownBlock,
    MultiADMM,
    MultiScaleConvPool,
    UpBlock,
    UpDownBlock,
    compute_depth_enc_in_out_channels,
    compute_enc_input_channels,
    compute_residual_dec_input_channels,
    conv2d_pooling_output_shape,
)
from torch_admm_deconv_tpu.models.denoiser import (  # noqa: F401
    DECONV1,
    DECONV2,
    DivergentRestorer,
    flagship_divergent_restorer,
)
from torch_admm_deconv_tpu.models.denoiser_v2 import (  # noqa: F401
    RestorerV2,
    RestorerV2Block,
)
from torch_admm_deconv_tpu.models.fusion import ADMMFusion, Deconvs  # noqa: F401
from torch_admm_deconv_tpu.models.learned_prox import (  # noqa: F401
    LearnedProxADMM,
    ProxNet,
)
from torch_admm_deconv_tpu.models.layers_common import (  # noqa: F401
    Conv2d,
    ConvTranspose2d,
    InstanceNorm2d,
    LayerNorm2d,
    Linear,
    default_init_weights,
    same_padding,
)
from torch_admm_deconv_tpu.models.local_patch import (  # noqa: F401
    LocalAttentionPatch,
    PatchProcessor,
)
from torch_admm_deconv_tpu.models.nafnet import (  # noqa: F401
    NAFBlock,
    NAFNet,
    NAFNetLocal,
    local_avg_pool2d,
    simple_gate,
)
from torch_admm_deconv_tpu.models.regularizers import (  # noqa: F401
    admm_clipper,
    admm_weight_clipper,
    clip_grads_by_value,
    train_weight_clipper,
)
from torch_admm_deconv_tpu.models.restorer import Restorer, UpDownScale  # noqa: F401
from torch_admm_deconv_tpu.models.sra import ParallelUpsampleReduce  # noqa: F401
from torch_admm_deconv_tpu.models.varmap import (  # noqa: F401
    ChannelwiseVariance,
    channelwise_variance,
)
