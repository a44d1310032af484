from .datasets import (
    ETH3D,
    KITTI,
    Carla,
    ConcatStereoDataset,
    FallingThings,
    Middlebury,
    SceneFlowDatasets,
    SintelStereo,
    StereoDataset,
    TartanAir,
    build_train_dataset,
    build_val_dataset,
)
from .loader import InferenceSampler, PrefetchLoader, ShardedBatchSampler
from .transforms import FlowAugmentor, SparseFlowAugmentor
