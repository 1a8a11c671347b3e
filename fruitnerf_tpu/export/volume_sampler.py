"""Volume export: uniform grid probing of the trained field -> fruit point clouds.

Rebuild of the reference export path (exporter.py:80-121 +
exporter_utils.py:47-258 + fruit_datamanager.py:42-121 +
components/ray_generators.py:24-66):

  * an N x N grid of orthographic ray origins on one AABB face, rays along
    the face normal, nears=0, fars=box extent — N samples per ray gives
    N^3 uniform volume probes;
  * per batch: export-mode field query (NO volume rendering) -> positions,
    rgb, semantic logits, density;
  * threshold masks (exporter_utils.py:110-114): semantic logit >= 3,
    density >= 70, colormap sigmoid >= 0.9. NOTE the colormap threshold:
    the reference's export forward emits ``semantics_colormap`` as a BINARY
    heaviside label, heaviside(sigmoid(logit) - 0.9) in {0, 1}
    (fruit_nerf.py:261-265), and the exporter's ``>= 0.999`` compare runs on
    that label (exporter_utils.py:106,112) — i.e. it just tests label == 1,
    an effective sigmoid >= 0.9 (logit >= 2.197). The colormap cloud is
    therefore a SUPERSET of the logit>=3 ``semantic`` cloud, which is why it
    is the densest product and the counting configs' path of record
    (clustering/config_synthetic.py:3). Round <=3 of this build misread the
    0.999 as a raw-probability threshold and shipped a near-empty colormap
    cloud; ``colormap_prob_threshold=0.9`` (on the raw sigmoid) reproduces
    the reference's effective mask exactly.
  * three clouds: semantic_colormap (sigmoid mask & density), semantic
    (logit mask & density), density; colors = rgb + sigmoid confidence;
  * un-normalization: points * (1 / dataparser_scale) * 2 (exporter_utils.py:
    184-191). The x2 is not a fudge factor: training contracts positions via
    (x+2)/4 while the export path normalizes by the +-1 scene box via (x+1)/2
    (setup_inference nulls the contraction, fruit_nerf.py:179-183), so field
    content trained at x' answers queries at x = x'/2 — the x2 maps exported
    points back to true scene coordinates. The clustering configs' length
    scales (eps, merge distances, template sizes) are calibrated to this
    output space.

TPU-first difference: the reference ships every raw sample to the host and
masks in Python per batch; here thresholding AND stream compaction
(fixed-capacity ``jnp.nonzero``) run on device inside one jit, so only
surviving fruit points cross the host boundary (typically <2% of probes).
"""
from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import RayBundle
from ..models.fruit_model import FruitModelConfig, forward_export
from .ply import write_ply


@dataclasses.dataclass(frozen=True)
class ExportConfig:
    """Mirrors ExportSemanticPointCloud flags (exporter.py:65-78)."""

    bounding_box_min: tuple = (-1.0, -1.0, -1.0)
    bounding_box_max: tuple = (1.0, 1.0, 1.0)
    num_points_per_side: int = 1000
    num_rays_per_batch: int = 32768
    semantic_logit_threshold: float = 3.0
    density_threshold: float = 70.0
    # Effective reference threshold: the exporter's 0.999 compare runs on a
    # binary heaviside@0.9 label, not the raw sigmoid (fruit_nerf.py:261-265
    # + exporter_utils.py:106,112) — see the module docstring.
    colormap_prob_threshold: float = 0.9
    # device-side compaction capacity, as a fraction of probes per batch
    compaction_fraction: float = 1.0 / 16.0

    @property
    def aabb(self) -> np.ndarray:
        return np.array(
            [self.bounding_box_min, self.bounding_box_max], np.float32
        )


def orthographic_ray_grid(aabb: np.ndarray, n: int, axis: int = 2):
    """[n*n, 3] ray origins on the min face orthogonal to ``axis`` + the
    shared direction and far plane (components/ray_generators.py:24-66)."""
    lo, hi = aabb[0], aabb[1]
    axes = [a for a in range(3) if a != axis]
    u = np.linspace(lo[axes[0]], hi[axes[0]], n, dtype=np.float32)
    v = np.linspace(lo[axes[1]], hi[axes[1]], n, dtype=np.float32)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    origins = np.zeros((n * n, 3), np.float32)
    origins[:, axes[0]] = uu.ravel()
    origins[:, axes[1]] = vv.ravel()
    origins[:, axis] = lo[axis]
    direction = np.zeros(3, np.float32)
    direction[axis] = 1.0
    far = float(hi[axis] - lo[axis])
    return origins, direction, far


def export_masks(logit, prob, density, thresholds):
    """The three survival masks (exporter_utils.py:110-114).

    thresholds = [semantic_logit, density, colormap_prob]. The colormap mask
    compares the RAW sigmoid against ``colormap_prob`` — with the default
    0.9 this equals the reference's heaviside@0.9-label-then->=0.999 compare
    (fruit_nerf.py:261-265 + exporter_utils.py:106,112), so under default
    thresholds semantic (logit>=3) implies semantic_colormap (logit>=2.197):
    the colormap cloud is the superset / path of record."""
    dens_m = density >= thresholds[1]
    return {
        "semantic": (logit >= thresholds[0]) & dens_m,
        "semantic_colormap": (prob >= thresholds[2]) & dens_m,
        "density": dens_m,
    }


def _export_batch_core(
    params,
    origins,
    direction,
    far,
    scene_aabb,  # [2,3] field-normalization box (the model's scene box)
    thresholds,  # [3]: logit, density, prob
    model_config: FruitModelConfig,
    num_samples: int,
    capacity: int,
):
    r = origins.shape[0]
    bundle = RayBundle(
        origins=origins,
        directions=jnp.broadcast_to(direction, (r, 3)),
        nears=jnp.zeros((r,)),
        fars=jnp.full((r,), far),
        camera_indices=jnp.zeros((r,), jnp.int32),
    )
    out = forward_export(params, bundle, model_config, num_samples, scene_aabb)
    pos = out["positions"].reshape(-1, 3)
    rgb = out["rgb"].reshape(-1, 3)
    logit = out["semantics"].reshape(-1)
    prob = out["semantics_prob"].reshape(-1)
    density = out["density"].reshape(-1)

    masks = export_masks(logit, prob, density, thresholds)
    # pos + rgb + confidence in one row so compaction is a single scatter
    payload = jnp.concatenate([pos, rgb, prob[:, None]], axis=-1)  # [N, 7]

    results = {}
    for name, m in masks.items():
        # stream compaction via cumsum + capped scatter: jnp.nonzero(size=...)
        # is sort-based on TPU (measured 18.5 s for 4.2M elements vs 0.18 s
        # for this formulation); rows over capacity drop into a trash slot
        slot = jnp.cumsum(m.astype(jnp.int32)) - 1
        tgt = jnp.where(m, jnp.minimum(slot, capacity - 1), capacity)
        out = jnp.zeros((capacity + 1, payload.shape[1]), payload.dtype)
        out = out.at[tgt].set(payload, mode="drop")[:capacity]
        count = jnp.sum(m.astype(jnp.int32))
        valid = jnp.arange(capacity) < jnp.minimum(count, capacity)
        results[name] = {
            "points": out[:, :3],
            "colors": out[:, 3:],
            "valid": valid,
            # [1] (not scalar) so the mesh path can concatenate shard counts
            # along axis 0
            "count": count[None],
        }
    return results


@functools.partial(
    jax.jit,
    static_argnames=("model_config", "num_samples", "capacity"),
)
def _export_batch_compact(
    params, origins, direction, far, scene_aabb, thresholds,
    model_config: FruitModelConfig, num_samples: int, capacity: int,
):
    return _export_batch_core(
        params, origins, direction, far, scene_aabb, thresholds,
        model_config, num_samples, capacity,
    )


@functools.lru_cache(maxsize=4)
def _export_batch_sharded(mesh, model_config, num_samples, capacity):
    """shard_map the export batch over the mesh's 'data' axis: each device
    field-queries and compacts ITS ray shard locally (no collectives); the
    host slices each shard's [capacity, ...] block by its count. This is the
    TPU scaling story for the N^3 probe stream (N=1000-2000 -> 1-8G probes,
    exporter.py:77-78) — the reference export is strictly single-GPU."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    leaf_specs = {
        "points": P("data", None),
        "colors": P("data", None),
        "valid": P("data"),
        "count": P("data"),
    }
    out_specs = {
        name: dict(leaf_specs)
        for name in ("semantic", "semantic_colormap", "density")
    }
    fn = shard_map(
        functools.partial(
            _export_batch_core,
            model_config=model_config,
            num_samples=num_samples,
            capacity=capacity,
        ),
        mesh=mesh,
        in_specs=(P(), P("data", None), P(), P(), P(), P()),
        out_specs=out_specs,
    )
    return jax.jit(fn)


def sample_volume(
    params,
    model_config: FruitModelConfig,
    export_config: ExportConfig,
    dataparser_scale: float,
    output_dir,
    scene_aabb=None,  # [2,3]; defaults to the +-1 scene box
    progress: bool = True,
    mesh=None,  # jax.sharding.Mesh with a 'data' axis: shard the ray stream
) -> dict:
    """Stream the N^3 probe grid through the field; write the three .ply
    clouds. Returns {name: {"points", "colors", "path", "overflowed"}}.
    With ``mesh``, each device queries+compacts its shard of every ray batch
    (see _export_batch_sharded)."""
    n = export_config.num_points_per_side
    aabb = export_config.aabb
    origins_np, direction_np, far = orthographic_ray_grid(aabb, n)
    num_samples = n
    num_shards = int(mesh.devices.size) if mesh is not None else 1
    # Probes per jit call = rays x samples; at large N the configured ray
    # batch would put >16M probes into one program (N=512 x 32768 rays blew
    # up the v5e compiler). Cap the per-call probe count (per shard) and
    # shrink the ray batch to fit; the stream loop makes up the difference.
    max_probes = (1 << 22) * num_shards
    batch = min(
        export_config.num_rays_per_batch,
        max(1024, max_probes // num_samples),
    )
    batch = max(num_shards, batch - batch % num_shards)
    cap_shard = max(
        1024, int(batch * n * export_config.compaction_fraction) // num_shards
    )
    thresholds = jnp.asarray(
        [
            export_config.semantic_logit_threshold,
            export_config.density_threshold,
            export_config.colormap_prob_threshold,
        ]
    )
    if scene_aabb is None:
        scene_aabb = np.array([[-1.0] * 3, [1.0] * 3], np.float32)
    scene_aabb_j = jnp.asarray(scene_aabb)
    direction = jnp.asarray(direction_np)

    acc = {
        k: {"points": [], "colors": [], "overflowed": 0}
        for k in ("semantic", "semantic_colormap", "density")
    }
    total = origins_np.shape[0]
    # shard-balance: shard_map hands each device a CONTIGUOUS row slab of the
    # batch, and the orthographic grid is u-major — a fruit-dense band would
    # concentrate hits (and compaction overflow) on one shard. A stride
    # permutation gives every shard a uniform subsample of the face.
    shard_perm = (
        np.arange(batch).reshape(-1, num_shards).T.ravel()
        if num_shards > 1
        else None
    )
    for start in range(0, total, batch):
        chunk = origins_np[start : start + batch]
        if chunk.shape[0] < batch:  # pad to static shape; padded rays land
            pad = batch - chunk.shape[0]  # outside AABB -> density 0
            chunk = np.concatenate(
                [chunk, np.full((pad, 3), 1e6, np.float32)], axis=0
            )
        if shard_perm is not None:
            chunk = chunk[shard_perm]
        if mesh is not None:
            fn = _export_batch_sharded(mesh, model_config, num_samples, cap_shard)
            results = fn(
                params, jnp.asarray(chunk), direction, jnp.asarray(far),
                scene_aabb_j, thresholds,
            )
        else:
            results = _export_batch_compact(
                params,
                jnp.asarray(chunk),
                direction,
                jnp.asarray(far),
                scene_aabb_j,
                thresholds,
                model_config,
                num_samples,
                cap_shard,
            )
        for name, res in results.items():
            counts = np.asarray(res["count"])  # [num_shards], tiny sync
            for i, count in enumerate(counts):
                count = int(count)
                if count > cap_shard:
                    acc[name]["overflowed"] += count - cap_shard
                m = min(count, cap_shard)
                lo = i * cap_shard
                # slice on device BEFORE the host transfer: fruit points are
                # a tiny fraction of capacity, and host links can be slow
                acc[name]["points"].append(np.asarray(res["points"][lo : lo + m]))
                acc[name]["colors"].append(np.asarray(res["colors"][lo : lo + m]))
        if progress:
            done = min(start + batch, total)
            print(
                f"export: {done}/{total} rays "
                f"({done * num_samples / 1e6:.1f}M probes)",
                flush=True,
            )

    out = {}
    output_dir = Path(output_dir)
    unscale = (1.0 / dataparser_scale) * 2.0  # exporter_utils.py:184-191
    for name, d in acc.items():
        pts = (
            np.concatenate(d["points"]) if d["points"] else np.zeros((0, 3))
        ) * unscale
        cols = np.concatenate(d["colors"]) if d["colors"] else np.zeros((0, 4))
        path = write_ply(output_dir / f"{name}.ply", pts, cols)
        if d["overflowed"]:
            print(
                f"WARNING export/{name}: compaction capacity exceeded, "
                f"{d['overflowed']} points dropped — raise compaction_fraction"
            )
        out[name] = {
            "points": pts,
            "colors": cols,
            "path": path,
            "overflowed": d["overflowed"],
        }
    return out
