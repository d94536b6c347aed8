from .bn_pallas import PallasBatchNorm, batch_norm_train
from .image import device_scale

__all__ = ["PallasBatchNorm", "batch_norm_train", "device_scale"]
