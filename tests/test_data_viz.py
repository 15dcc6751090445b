"""DataMngr over a real ImageFolder tree + PlotMngr rendering."""

import os

import numpy as np
import pytest

from convnets_tpu.data import DataMngr, ImageFolderDataset
from convnets_tpu.settings import Settings
from convnets_tpu.viz import PlotMngr


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    """Tiny CINIC-style tree: {train,valid,test}/<class>/<n>.png."""
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for split in ("train", "valid", "test"):
        for ci, cname in enumerate(("cat", "dog")):
            d = root / split / cname
            d.mkdir(parents=True)
            for i in range(6):
                arr = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_image_folder_dataset(image_root):
    ds = ImageFolderDataset(os.path.join(image_root, "train"))
    assert len(ds) == 12
    assert ds.class_names == ["cat", "dog"]  # sorted, torchvision convention
    assert ds.image_shape == (8, 8, 3)
    x, y = ds.load(np.array([0, 6]))
    assert x.shape == (2, 8, 8, 3)
    assert x.dtype == np.float32 and 0.0 <= x.min() and x.max() <= 1.0
    np.testing.assert_array_equal(y, [0, 1])
    info = ds.info()
    assert info["class_distribution"] == {"cat": 6, "dog": 6}


def test_data_mngr_loaders(image_root):
    setting = Settings(kind=0, input_size=(3, 8, 8), num_classes=2,
                       batch_size=4, data_augment=True, data_norm=True)
    mngr = DataMngr(setting, root=image_root)
    train = mngr.load_train()
    valid = mngr.load_valid()
    test = mngr.load_test()
    assert train.augment and train.normalize
    assert not valid.augment  # augmentation is train-only (mngrdata.py:167-190)
    assert test.shuffle  # test deliberately shuffled (mngrdata.py:211)
    x, y, w = next(iter(train))
    assert x.shape == (4, 8, 8, 3)
    assert w.sum() == 4

    inv = mngr.inv_normalized((x - mngr.mean) / mngr.std)
    np.testing.assert_allclose(inv, x, atol=1e-5)


def test_plot_mngr_renders(tmp_path):
    plot = PlotMngr(str(tmp_path))
    r = {
        "train_loss": [2.0, 1.5, 1.2], "valid_loss": [2.1, 1.7, 1.4],
        "train_score": [0.3, 0.5, 0.6], "valid_score": [0.28, 0.45, 0.55],
        "learning_rate": [0.01, 0.01, 0.001], "train_epochs": 3,
        "total_epochs": 3, "train_time": 12.0,
    }
    p1 = plot.performance(r)
    cm = np.array([[5, 1], [2, 4]])
    p2 = plot.confusion_matrix(cm, ["cat", "dog"])
    p3 = plot.hyperparameters(
        {"samples": [{"learning_rate": 0.1, "batch_norm": True},
                     {"learning_rate": 0.01, "batch_norm": False}],
         "scores": [0.5, 0.7]},
        ["learning_rate", "batch_norm"],
    )
    p4 = plot.models({"resnet": [0.7, 0.72], "vggnet": [0.68, 0.69]})
    p5 = plot.metrics_analysis({
        "Configurations": ["a", "b", "c"],
        "Complexity": [1e6, 2e6, 3e6],
        "Throughput": [100.0, 80.0, 60.0],
        "Accuracy": [70.0, 72.0, 74.0],
    })
    for p in [p1, p2, p3, p4, *p5]:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_reference_results_analysis(tmp_path):
    from convnets_tpu.viz import PlotMngr, reference_table, merge_measurements

    table = reference_table()
    table = merge_measurements(table, "ResNet-26", {"Throughput": 2500.0})
    table = merge_measurements(table, "ResNet-50-TPU",
                               {"Complexity": 25_557_032, "Throughput": 2553.6,
                                "Speed": 1 / 2553.6, "Training Time": 0.0,
                                "Memory Usage": 0.0, "Accuracy": 0.0})
    assert table["Throughput"][table["Configurations"].index("ResNet-26")] == 2500.0
    plot = PlotMngr(str(tmp_path))
    paths = plot.metrics_analysis(
        {k: [v if v is not None else 0.0 for v in vs] for k, vs in table.items()})
    import os
    assert all(os.path.getsize(p) > 0 for p in paths)


def test_class_distribution_plot(tmp_path, image_root):
    import os
    from convnets_tpu.data import ImageFolderDataset
    from convnets_tpu.viz import PlotMngr

    ds = ImageFolderDataset(os.path.join(image_root, "train"))
    p = PlotMngr(str(tmp_path)).class_distribution(ds.info())
    assert os.path.getsize(p) > 0
