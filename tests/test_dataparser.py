"""Dataparser + process-data ingestion tests over a real on-disk dataset
layout (transforms.json + images/ + semantics/)."""
import json

import numpy as np
import pytest
from PIL import Image

from fruitnerf_tpu.data.dataparser import DataParserConfig, parse_transforms
from fruitnerf_tpu.data.poses_io import normalize_mask_array


@pytest.fixture()
def toy_dataset(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "semantics").mkdir()
    rng = np.random.RandomState(0)
    frames = []
    n = 6
    for i in range(n):
        name = f"frame_{i:03d}.png"
        Image.fromarray(rng.randint(0, 255, (32, 48, 3), np.uint8)).save(
            tmp_path / "images" / name
        )
        Image.fromarray((rng.rand(32, 48) > 0.7).astype(np.uint8) * 255).save(
            tmp_path / "semantics" / name
        )
        c2w = np.eye(4)
        c2w[:3, 3] = rng.randn(3) * 2
        frames.append(
            {
                "file_path": f"images/{name}",
                "semantic_path": f"semantics/{name}",
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {
        "fl_x": 40.0, "fl_y": 41.0, "cx": 24.0, "cy": 16.0,
        "w": 48, "h": 32, "k1": 0.01, "k2": 0.0,
        "frames": frames,
        "semantics": ["apple", "stuff"],
    }
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(meta, f)
    return tmp_path


def test_parse_transforms_full(toy_dataset):
    parsed = parse_transforms(DataParserConfig(data_dir=toy_dataset))
    assert len(parsed.image_paths) == 6
    np.testing.assert_allclose(parsed.fx, 40.0)
    np.testing.assert_allclose(parsed.fy, 41.0)
    np.testing.assert_allclose(parsed.distortion[:, 0], 0.01)
    # split: ceil(6*0.9)=6 -> degenerate all-train, eval falls back
    assert len(parsed.train_indices) >= 5
    # poses normalized into the unit box
    assert np.abs(parsed.poses[:, :3, 3]).max() <= 1.0 + 1e-5
    assert parsed.dataparser_scale > 0
    assert parsed.dataparser_transform.shape == (3, 4)
    assert parsed.semantics_classes == ("apple", "stuff")
    # images + masks load with correct shapes/ranges
    imgs = parsed.load_images([0, 1])
    masks = parsed.load_masks([0, 1])
    assert imgs.shape == (2, 32, 48, 3) and imgs.max() <= 1.0
    assert masks.shape == (2, 32, 48)
    assert set(np.unique(masks)).issubset({0.0, 1.0})


def test_parse_transforms_split_fraction(toy_dataset):
    parsed = parse_transforms(
        DataParserConfig(data_dir=toy_dataset, train_split_fraction=0.5)
    )
    assert len(parsed.train_indices) == 3
    assert len(parsed.eval_indices) == 3
    assert not set(parsed.train_indices) & set(parsed.eval_indices)


def test_parse_transforms_explicit_split(toy_dataset):
    with open(toy_dataset / "transforms.json") as f:
        meta = json.load(f)
    meta["train_filenames"] = ["frame_000.png", "frame_001.png"]
    meta["val_filenames"] = ["frame_002.png"]
    with open(toy_dataset / "transforms.json", "w") as f:
        json.dump(meta, f)
    parsed = parse_transforms(DataParserConfig(data_dir=toy_dataset))
    assert list(parsed.train_indices) == [0, 1]
    assert list(parsed.eval_indices) == [2]


def test_applied_transform_and_scale_honored(toy_dataset):
    """applied_transform/applied_scale (fruitnerf_dataparser.py:275-282)
    compose into the REPORTED dataparser transform/scale — training poses are
    untouched (they already live in the preprocessed frame), but export
    un-normalization maps back to the original world frame."""
    base = parse_transforms(DataParserConfig(data_dir=toy_dataset))
    with open(toy_dataset / "transforms.json") as f:
        meta = json.load(f)
    at = np.eye(4)
    at[:3, :3] = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], float)
    at[:3, 3] = [0.5, -0.25, 2.0]
    meta["applied_transform"] = at[:3].tolist()
    meta["applied_scale"] = 0.5
    with open(toy_dataset / "transforms.json", "w") as f:
        json.dump(meta, f)
    parsed = parse_transforms(DataParserConfig(data_dir=toy_dataset))
    # training-space poses are identical
    np.testing.assert_allclose(parsed.poses, base.poses, atol=1e-6)
    # reported scale picked up applied_scale
    np.testing.assert_allclose(
        parsed.dataparser_scale, base.dataparser_scale * 0.5, rtol=1e-6
    )
    # reported transform is base_transform @ applied_transform
    b4 = np.concatenate([base.dataparser_transform, [[0, 0, 0, 1]]], axis=0)
    np.testing.assert_allclose(
        parsed.dataparser_transform, (b4 @ at)[:3], atol=1e-9
    )


def test_train_cli_wires_preset_split_fraction(tmp_path, toy_dataset, monkeypatch):
    """Regression: the preset's train_split_fraction must reach the
    dataparser (it was dead config in round 1)."""
    import fruitnerf_tpu.data.dataparser as dp_mod
    from fruitnerf_tpu.__main__ import main as cli

    seen = {}
    orig = dp_mod.parse_transforms

    def spy(config):
        seen["fraction"] = config.train_split_fraction
        return orig(config)

    monkeypatch.setattr("fruitnerf_tpu.scripts.train.parse_transforms", spy, raising=False)
    # train.py imports parse_transforms inside main(); patch at the source
    monkeypatch.setattr(dp_mod, "parse_transforms", spy)
    out = tmp_path / "run"
    cli([
        "train", "--preset", "fruit_nerf_smoke",
        "--data", str(toy_dataset), "--output-dir", str(out),
        "--max-iters", "1", "--train-rays-per-batch", "64",
        "--train-split-fraction", "0.5",
    ])
    assert seen["fraction"] == 0.5


def test_mask_normalization_rules():
    # fruit_dataset.py:48-55 rules
    jpg_mask = np.array([[0, 120, 130, 255]], np.uint8)
    np.testing.assert_array_equal(
        normalize_mask_array(jpg_mask, is_jpg=True), [[0, 0, 1, 1]]
    )
    png255 = np.array([[0, 255]], np.uint8)
    np.testing.assert_allclose(normalize_mask_array(png255), [[0, 1.0]])
    already01 = np.array([[0.0, 1.0]])
    np.testing.assert_allclose(normalize_mask_array(already01), [[0, 1.0]])


def test_process_data_cli(tmp_path, toy_dataset):
    """process-data ingests images + masks and merges transforms.json."""
    from fruitnerf_tpu.__main__ import main as cli

    out = tmp_path / "processed"
    cli([
        "process-data",
        "--data", str(toy_dataset / "images"),
        "--data-semantic", str(toy_dataset / "semantics"),
        "--output-dir", str(out),
        "--transforms", str(toy_dataset / "transforms.json"),
        "--num-downscales", "2",
    ])
    assert (out / "transforms.json").exists()
    assert (out / "images_2").is_dir() and (out / "semantics_4").is_dir()
    parsed = parse_transforms(DataParserConfig(data_dir=out))
    assert len(parsed.image_paths) == 6
    assert parsed.mask_paths[0] is not None
    masks = parsed.load_masks([0])
    assert set(np.unique(masks)).issubset({0.0, 1.0})


def test_end_to_end_disk_dataset_trains(toy_dataset):
    """dataset_from_parsed -> one train step (the on-disk data path)."""
    import jax

    from fruitnerf_tpu.configs import fruit_nerf_smoke
    from fruitnerf_tpu.data.builder import dataset_from_parsed
    from fruitnerf_tpu.engine.trainer import init_train_state, make_train_step

    parsed = parse_transforms(DataParserConfig(data_dir=toy_dataset))
    data = dataset_from_parsed(parsed)
    import dataclasses

    config = dataclasses.replace(
        fruit_nerf_smoke(num_images=data.cameras.num_cameras),
        train_rays_per_batch=256,
    )
    state = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    step_fn = make_train_step(config)
    state, metrics = step_fn(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
