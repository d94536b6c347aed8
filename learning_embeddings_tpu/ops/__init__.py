from .bn_pallas import PallasBatchNorm, batch_norm_train

__all__ = ["PallasBatchNorm", "batch_norm_train"]
