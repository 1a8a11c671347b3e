"""Checkpointing + the run manifest.

The reference saves every 2000 steps through the nerfstudio Trainer and
reloads via ``eval_setup(config.yaml)`` + ``dataparser_transforms.json``
(fruit_nerf_config.py:31; exporter.py:86,99-100; fruit_pipeline.py:229-240).
Export and clustering *consume* those run artifacts, so the manifest here is
a hard API contract: it records the preset, the dataparser transform/scale,
and the scene AABB next to the weights.

Weights/opt-state/step are serialized with flax msgpack (single portable
file, no directory protocol) — checkpoints are written atomically via
rename so a preempted save never corrupts the latest checkpoint.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from pathlib import Path

import flax.serialization
import jax
import numpy as np

_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def save_checkpoint(checkpoint_dir, state) -> Path:
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step)
    data = flax.serialization.to_bytes(state)
    path = checkpoint_dir / f"ckpt_{step:09d}.msgpack"
    tmp = checkpoint_dir / f".tmp_ckpt_{step:09d}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic -> preemption-safe
    return path


_SAVE_POOL = None


def save_checkpoint_async(checkpoint_dir, state):
    """Overlap checkpoint IO with training: snapshot device->host NOW (the
    transfer must happen before the next donated train chunk reuses the
    buffers), then serialize + write on a single background worker (ordered
    writes, same atomic rename). Returns a Future; call .result() to flush.

    The round-3 profile attributed part of the 33% train-loop overhead to
    the 15 blocking ~100 MB msgpack writes of a 30k run."""
    global _SAVE_POOL
    import concurrent.futures

    if _SAVE_POOL is None:
        _SAVE_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
    host_state = jax.device_get(state)
    return _SAVE_POOL.submit(save_checkpoint, checkpoint_dir, host_state)


def latest_checkpoint(checkpoint_dir) -> Path | None:
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.is_dir():
        return None
    best = None
    for p in checkpoint_dir.iterdir():
        m = _CKPT_RE.search(p.name)
        if m:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), p)
    return best[1] if best else None


def load_checkpoint(path, target_state):
    """Restore into a template state (same pytree structure, e.g. from
    ``init_train_state``). Strips nothing — unlike the reference's DDP
    ``module.`` prefix surgery (fruit_pipeline.py:229-240), sharded training
    here produces the same flat pytree as single-chip."""
    with open(path, "rb") as f:
        data = f.read()
    restored = flax.serialization.from_bytes(target_state, data)
    # flax from_bytes does not validate leaf shapes against the template;
    # a config/checkpoint mismatch would otherwise load silently.
    mismatches = []

    def _check(p, a, b):
        sa = getattr(a, "shape", None)
        sb = getattr(b, "shape", None)
        if sa != sb:
            mismatches.append(f"{jax.tree_util.keystr(p)}: ckpt {sb} vs template {sa}")

    jax.tree_util.tree_map_with_path(
        lambda p, a, b: _check(p, a, b), target_state, restored
    )
    if mismatches:
        raise ValueError(
            f"checkpoint {path} does not match the model/config template:\n  "
            + "\n  ".join(mismatches[:10])
        )
    return jax.tree.map(jax.numpy.asarray, restored)


def resume_from_latest(checkpoint_dir, target_state):
    path = latest_checkpoint(checkpoint_dir)
    if path is None:
        return target_state, False
    return load_checkpoint(path, target_state), True


# ---------------------------------------------------------------------------
# run manifest
# ---------------------------------------------------------------------------


def _to_jsonable(x):
    if isinstance(x, (np.ndarray, jax.Array)):
        return np.asarray(x).tolist()
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return {f.name: _to_jsonable(getattr(x, f.name)) for f in dataclasses.fields(x)}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    return str(x)


def write_manifest(
    run_dir,
    preset: str,
    dataparser_transform: np.ndarray,
    dataparser_scale: float,
    scene_aabb: np.ndarray,
    num_images: int,
    semantics_classes=("apple", "stuff"),
    extra: dict | None = None,
) -> Path:
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    manifest = {
        "framework": "fruitnerf_tpu",
        "preset": preset,
        "dataparser_transform": _to_jsonable(dataparser_transform),
        "dataparser_scale": float(dataparser_scale),
        "scene_aabb": _to_jsonable(scene_aabb),
        "num_images": int(num_images),
        "semantics_classes": list(semantics_classes),
    }
    if extra:
        manifest.update(_to_jsonable(extra))
    path = run_dir / "manifest.json"
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def read_manifest(run_dir) -> dict:
    with open(Path(run_dir) / "manifest.json") as f:
        return json.load(f)
