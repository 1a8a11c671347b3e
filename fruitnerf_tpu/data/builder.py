"""Glue: turn a parsed/synthetic scene into device-resident training data."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..cameras.cameras import Cameras
from ..engine.trainer import DeviceDataset, build_device_dataset


def cameras_from_scene(scene: dict) -> Cameras:
    """scene: output of synthetic.render_scene (or equivalent dict)."""
    n = scene["poses"].shape[0]
    return Cameras(
        camera_to_worlds=jnp.asarray(scene["poses"]),
        fx=jnp.full((n,), float(scene["fx"])),
        fy=jnp.full((n,), float(scene["fy"])),
        cx=jnp.full((n,), float(scene["cx"])),
        cy=jnp.full((n,), float(scene["cy"])),
        width=jnp.full((n,), int(scene["width"]), jnp.int32),
        height=jnp.full((n,), int(scene["height"]), jnp.int32),
        distortion=jnp.zeros((n, 6)),
    )


def dataset_from_scene(scene: dict, train_fraction: float = 0.9) -> DeviceDataset:
    n = scene["images"].shape[0]
    num_train = max(1, int(np.ceil(n * train_fraction)))
    train_idx = (
        np.arange(n)
        if num_train >= n
        else np.unique(np.linspace(0, n - 1, num_train, dtype=np.int64))
    )
    return build_device_dataset(
        scene["images"], scene["masks"], cameras_from_scene(scene), train_idx
    )


def dataset_from_parsed(parsed) -> DeviceDataset:
    """From a dataparser.ParsedScene with on-disk images/masks (all frames
    must share one resolution for the device-resident fast path)."""
    images = parsed.load_images()
    masks = parsed.load_masks()
    n = images.shape[0]
    cams = Cameras(
        camera_to_worlds=jnp.asarray(parsed.poses),
        fx=jnp.asarray(parsed.fx),
        fy=jnp.asarray(parsed.fy),
        cx=jnp.asarray(parsed.cx),
        cy=jnp.asarray(parsed.cy),
        width=jnp.asarray(parsed.width),
        height=jnp.asarray(parsed.height),
        distortion=jnp.asarray(parsed.distortion),
    )
    del n
    return build_device_dataset(images, masks, cams, parsed.train_indices)
