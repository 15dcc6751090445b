from convnets_tpu.data.datasets import (  # noqa: F401
    Dataset,
    ArrayDataset,
    ImageFolderDataset,
    synthetic_dataset,
    mnist,
    cifar10,
    CINIC_MEAN,
    CINIC_STD,
)
from convnets_tpu.data.loader import (  # noqa: F401
    DataLoader, DeviceCacheLoader, device_prefetch,
)
from convnets_tpu.data.stream import ShardRotationLoader  # noqa: F401
from convnets_tpu.data.augment import augment_batch, normalize  # noqa: F401
from convnets_tpu.data.manager import DataMngr  # noqa: F401
