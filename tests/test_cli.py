"""CLI + driver quartet + utils surface tests."""

import os

import numpy as np
import pytest

from convnets_tpu import utils
from convnets_tpu.__main__ import main


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.RandomState(0)
    for split in ("train", "valid", "test"):
        for cname in ("a", "b"):
            d = root / split / cname
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_cli_models_lists_zoo(capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    for arch in ("resnet", "vggnet", "densenet", "shufflenet_v1", "sknet"):
        assert arch in out


def test_cli_fit_sanity_check(data_root, tmp_path):
    rc = main([
        "fit", "--arch", "lenet", "--kind", "0",
        "--input-size", "3,16,16", "--num-classes", "2",
        "--data-root", data_root, "--batch-size", "8", "--epochs", "1",
        "--no-mixed-precision", "--sanity-check",
        "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    # checkpoint written + plots rendered
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt.npz")]
    assert ckpts


def test_cli_load_testing_mode(data_root, tmp_path):
    main([
        "fit", "--arch", "lenet", "--kind", "0",
        "--input-size", "3,16,16", "--num-classes", "2",
        "--data-root", data_root, "--batch-size", "8", "--epochs", "1",
        "--no-mixed-precision", "--sanity-check",
        "--output-dir", str(tmp_path),
    ])
    rc = main([
        "load", "--arch", "lenet", "--kind", "0",
        "--input-size", "3,16,16", "--num-classes", "2",
        "--data-root", data_root, "--batch-size", "8",
        "--no-mixed-precision", "--sanity-check", "--testing",
        "--output-dir", str(tmp_path),
    ])
    assert rc == 0


def test_utils_split():
    parts = utils.split(list(range(10)), 4)
    assert parts == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert utils.split([], 4) == []


def test_utils_reproducible():
    utils.set_reproducible_mode(7)
    a = np.random.rand(3)
    utils.set_reproducible_mode(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
