from torch_admm_deconv_tpu.data.dataset import (  # noqa: F401
    DataLoader,
    ImageDataset,
    read_image_chw,
)
from torch_admm_deconv_tpu.data.transforms import AddAWGN, RandCrop, Scale  # noqa: F401
