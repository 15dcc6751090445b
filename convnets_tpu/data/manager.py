"""DataMngr — the reference's data-manager surface (mngrdata.py:40-215)
mapped onto the TPU pipeline: load_train/load_valid/load_test returning
DataLoaders over an ImageFolder layout (CINIC-10 by default), with
augmentation/normalization applied on device by the training engine
(data_augment/data_norm flags travel with the loader)."""

from __future__ import annotations

import os

import numpy as np

from convnets_tpu.data.datasets import (
    CINIC_MEAN, CINIC_STD, Dataset, ImageFolderDataset,
)
from convnets_tpu.data.loader import DataLoader, DeviceCacheLoader


class DataMngr:
    ROOT_DIR = os.getcwd()
    CINIC_DIR = os.path.join(ROOT_DIR, "data", "CINIC-10")
    # data/cache/<dataset>-<split>.npy persisted decode caches
    CACHE_DIR = os.path.join(ROOT_DIR, "data", "cache")
    # Settings.device_cache=None → auto: splits up to this many decoded
    # bytes live resident in device HBM (CINIC's 276 MB/split qualifies;
    # ImageNet-class data streams through the host DataLoader instead)
    DEVICE_CACHE_AUTO_BYTES = 1 << 30

    # Where the reference keeps the bundled CINIC-10 tree; used as the
    # default data root when the repo-local data/CINIC-10 is absent (the
    # repo does not re-bundle 270k PNGs — reference mngrdata.py:45-50)
    REFERENCE_CINIC_DIR = "/root/reference/data/CINIC-10"

    def __init__(self, setting, root: str | None = None):
        self.setting = setting
        if root is None:
            root = DataMngr.CINIC_DIR
            if not os.path.isdir(root) and os.path.isdir(
                    DataMngr.REFERENCE_CINIC_DIR):
                root = DataMngr.REFERENCE_CINIC_DIR
        self.root = root
        self.batch_size = setting.batch_size
        self.data_augment = setting.data_augment
        self.data_norm = setting.data_norm
        self.mean = CINIC_MEAN
        self.std = CINIC_STD
        self._datasets = {}

    def _dataset(self, split: str) -> ImageFolderDataset:
        if split not in self._datasets:
            name = os.path.basename(os.path.normpath(self.root))
            self._datasets[split] = ImageFolderDataset(
                os.path.join(self.root, split),
                disk_cache=os.path.join(self.CACHE_DIR, f"{name}-{split}.npy"),
            )
        return self._datasets[split]

    def _use_device_cache(self, ds: Dataset) -> bool:
        flag = getattr(self.setting, "device_cache", None)
        if flag is not None:
            return bool(flag)
        return (len(ds) * int(np.prod(ds.image_shape))
                <= self.DEVICE_CACHE_AUTO_BYTES)

    def _make_loader(self, split: str, shuffle: bool, host_id: int,
                     num_hosts: int):
        ds = self._dataset(split)
        if self._use_device_cache(ds):
            return DeviceCacheLoader(
                ds, self.batch_size, shuffle=shuffle, seed=self.setting.seed,
                host_id=host_id, num_hosts=num_hosts,
            )
        if (hasattr(ds, "load_raw")
                and os.environ.get("CONVNETS_TPU_STREAM", "1") == "1"):
            # >HBM-budget split: chunked HBM rotation (data/stream.py) —
            # decode-once disk cache + double-buffered resident shards,
            # instead of per-epoch host decode (which caps this 1-core
            # host at ~35-160 img/s at 256²)
            from convnets_tpu.data.stream import ShardRotationLoader

            return ShardRotationLoader(
                ds, self.batch_size, shuffle=shuffle, seed=self.setting.seed,
                host_id=host_id, num_hosts=num_hosts,
            )
        return DataLoader(
            ds, self.batch_size, shuffle=shuffle, seed=self.setting.seed,
            num_workers=self.setting.num_workers,
            host_id=host_id, num_hosts=num_hosts,
        )

    def load_train(self, host_id: int = 0, num_hosts: int = 1) -> DataLoader:
        loader = self._make_loader("train", True, host_id, num_hosts)
        loader.augment = self.data_augment
        loader.normalize = self.data_norm
        return loader

    def load_valid(self, host_id: int = 0, num_hosts: int = 1) -> DataLoader:
        loader = self._make_loader("valid", False, host_id, num_hosts)
        loader.augment = False
        loader.normalize = self.data_norm
        return loader

    def load_test(self, host_id: int = 0, num_hosts: int = 1) -> DataLoader:
        # the reference shuffles the test loader deliberately for its
        # statistical subsampling protocol (mngrdata.py:211)
        loader = self._make_loader("test", True, host_id, num_hosts)
        loader.augment = False
        loader.normalize = self.data_norm
        return loader

    def info(self, split: str = "train") -> dict:
        return self._dataset(split).info()

    def inv_normalized(self, x: np.ndarray) -> np.ndarray:
        """Undo per-channel normalization (reference mngrdata.py:64-72)."""
        return x * self.std + self.mean
