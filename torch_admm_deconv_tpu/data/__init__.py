from torch_admm_deconv_tpu.data.dataset import (  # noqa: F401
    DataLoader,
    ImageDataset,
    read_image_chw,
)
from torch_admm_deconv_tpu.data.transforms import (  # noqa: F401
    AddAWGN,
    CircBlur,
    RandCrop,
    Scale,
    gaussian_psf_np,
)
