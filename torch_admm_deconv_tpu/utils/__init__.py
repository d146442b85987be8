from torch_admm_deconv_tpu.utils.paths import get_abs_path, get_x_y_paths  # noqa: F401
