from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import (
    load_manifest,
    subpart_manifest,
    split_weak,
    split_synthetic,
    Manifest,
)
from dcase2019_task4_tpu.data.sampler import MultiStreamSampler

__all__ = [
    "LabelCodec",
    "Manifest",
    "load_manifest",
    "subpart_manifest",
    "split_weak",
    "split_synthetic",
    "MultiStreamSampler",
]
