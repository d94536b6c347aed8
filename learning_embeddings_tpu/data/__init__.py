from .records import (
    EncodedDataset,
    encode_records,
    filter_to_labelmap,
    load_ethec_json,
    save_ethec_json,
    stratified_split,
)
from .pipeline import ImagePipeline, augment_eval, augment_train, decode_image
from .sampling import WeightedResampler, shuffled_order

__all__ = [
    "EncodedDataset",
    "encode_records",
    "filter_to_labelmap",
    "load_ethec_json",
    "save_ethec_json",
    "stratified_split",
    "ImagePipeline",
    "augment_eval",
    "augment_train",
    "decode_image",
    "WeightedResampler",
    "shuffled_order",
]
