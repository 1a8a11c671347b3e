"""Training engine: device-resident data, a single fused jit train step, and
the outer loop with eval/checkpoint hooks.

Replaces the nerfstudio Trainer + FruitPipeline + FruitDataManager composition
the reference rides on (fruit_pipeline.py:121-146; fruit_datamanager.py:
188-215) with a TPU-first design:

  * the ENTIRE step — pixel sampling, ray generation (incl. camera-opt
    adjustment), proposal sampling, field, losses, backward, optimizer —
    is one jit. The image/mask stacks live in HBM as uint8; there is no
    host<->device dataloader boundary at all (the reference crosses it every
    step, SURVEY.md §3.1).
  * data parallelism is a sharding annotation: the sampled ray batch is
    constrained to the ``data`` mesh axis, parameters stay replicated, and
    XLA inserts the gradient psum (the reference's DDP/NCCL allreduce,
    fruit_pipeline.py:115-118).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cameras.camera_opt import exp_map_so3xr3, init_camera_opt
from ..cameras.cameras import Cameras, generate_image_rays, generate_rays
from ..configs import OptimizerConfig, TrainConfig
from ..models.fruit_model import (
    forward_train,
    init_fruit_model,
    loss_dict,
    metrics_dict,
)
from ..parallel.mesh import DATA_AXIS


@flax.struct.dataclass
class DeviceDataset:
    """Whole training set resident on device. uint8 keeps HBM small; pixels
    are converted to f32 after the gather."""

    images: jnp.ndarray  # [N, H, W, 3] uint8
    masks: jnp.ndarray  # [N, H, W] uint8 (0/1)
    cameras: Cameras
    train_indices: jnp.ndarray  # [T] int32

    @property
    def image_shape(self):
        return self.images.shape[1], self.images.shape[2]


def build_device_dataset(
    images: np.ndarray,  # [N,H,W,3] float (0..1) or uint8
    masks: np.ndarray,  # [N,H,W] float (0/1) or uint8
    cameras: Cameras,
    train_indices: np.ndarray,
) -> DeviceDataset:
    if images.dtype != np.uint8:
        images = (np.clip(images, 0, 1) * 255).astype(np.uint8)
    if masks.dtype != np.uint8:
        masks = (masks > 0.5).astype(np.uint8)
    return DeviceDataset(
        images=jnp.asarray(images),
        masks=jnp.asarray(masks),
        cameras=cameras,
        train_indices=jnp.asarray(train_indices, jnp.int32),
    )


@flax.struct.dataclass
class TrainState:
    params: Any  # {"model": {...}, "camera_opt": [N,6]}
    opt_state: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# optimizers: per-group Adam/RAdam with exponential decay
# (fruit_nerf_config.py:47-56: Adam lr 1e-2 eps 1e-15 -> 1e-4; camera 6e-4)
# ---------------------------------------------------------------------------


def _make_group_tx(opt: OptimizerConfig, max_steps: int) -> optax.GradientTransformation:
    steps = opt.max_steps or max_steps
    schedule = optax.exponential_decay(
        init_value=opt.lr_init,
        transition_steps=steps,
        decay_rate=opt.lr_final / opt.lr_init,
    )
    if opt.warmup_steps:
        zero = optax.constant_schedule(0.0)
        schedule = optax.join_schedules([zero, schedule], [opt.warmup_steps])
    if opt.name == "adam":
        tx = optax.adam(schedule, eps=opt.eps)
    elif opt.name == "radam":
        tx = optax.radam(schedule, eps=opt.eps)
    else:
        raise ValueError(f"unknown optimizer {opt.name!r}")
    if opt.weight_decay:
        # decoupled decay scaled by the same schedule (adamw semantics)
        tx = optax.chain(tx, _decoupled_decay(opt.weight_decay, schedule))
    return tx


def _decoupled_decay(weight_decay: float, schedule):
    """AdamW-style decoupled weight decay: update -= wd * lr(step) * param."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("decoupled decay needs params")
        lr = schedule(state.count)
        updates = jax.tree.map(
            lambda u, p: u - weight_decay * lr * p, updates, params
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    def label_fn(params):
        field_labels = {
            k: jax.tree.map(
                lambda _: "appearance" if k == "appearance" else "fields", v
            )
            for k, v in params["model"]["field"].items()
        }
        return {
            "model": {
                "field": field_labels,
                "proposal_networks": jax.tree.map(
                    lambda _: "proposal_networks",
                    params["model"]["proposal_networks"],
                ),
            },
            "camera_opt": jax.tree.map(
                lambda _: "camera_opt", params["camera_opt"]
            ),
        }

    return optax.multi_transform(
        {
            "fields": _make_group_tx(config.fields_opt, config.max_iters),
            "proposal_networks": _make_group_tx(config.proposal_opt, config.max_iters),
            "appearance": _make_group_tx(config.appearance_opt, config.max_iters),
            "camera_opt": _make_group_tx(config.camera_opt, config.max_iters),
        },
        label_fn,
    )


def init_train_state(key: jax.Array, config: TrainConfig, num_cameras: int) -> TrainState:
    params = {
        "model": init_fruit_model(key, config.model),
        "camera_opt": init_camera_opt(num_cameras),
    }
    tx = make_optimizer(config)
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32)
    )


# ---------------------------------------------------------------------------
# the fused train step
# ---------------------------------------------------------------------------


def _shard_rays(x, mesh):
    if mesh is None or mesh.devices.size == 1:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_train_step(config: TrainConfig, mesh=None):
    """Returns jit'd (state, dataset, key) -> (state, metrics)."""
    return jax.jit(build_step_fn(config, mesh), donate_argnums=(0,))


def make_train_chunk(config: TrainConfig, mesh=None, length: int = 100):
    """jit'd (state, dataset, key) -> (state, metrics) advancing ``length``
    steps in ONE device call (lax.scan inside the jit; the body compiles
    once, not ``length`` times).

    Per-step dispatch is not free: through this harness's remote-TPU tunnel
    it measured ~24 ms/step of pure host overhead (orchard runs trained at
    81K rays/s while the same step benched at 159K), and even locally the
    python loop costs dispatches. RNG/schedules fold in ``state.step``, so a
    chunk is bit-identical to ``length`` single steps."""
    raw = build_step_fn(config, mesh)

    def chunk(state, data, key):
        if length > 1:
            def body(s, _):
                s2, _ = raw(s, data, key)
                return s2, None

            state, _ = jax.lax.scan(body, state, None, length=length - 1)
        return raw(state, data, key)  # final step supplies the metrics

    return jax.jit(chunk, donate_argnums=(0,))


def build_step_fn(config: TrainConfig, mesh=None):
    """The raw (unjitted) fused train step — exposed so multi-scene training
    can vmap it over a scene axis (parallel/multi_scene.py)."""
    tx = make_optimizer(config)
    num_rays = config.train_rays_per_batch

    def step_fn(state: TrainState, data: DeviceDataset, key: jax.Array):
        h, w = data.images.shape[1], data.images.shape[2]
        k_img, k_y, k_x, k_samp, k_sparse, k_jit = jax.random.split(
            jax.random.fold_in(key, state.step), 6
        )
        # pixel sampler (the reference's PixelSampler over the image batch)
        slot = jax.random.randint(k_img, (num_rays,), 0, data.train_indices.shape[0])
        cam = data.train_indices[slot]
        py = jax.random.randint(k_y, (num_rays,), 0, h)
        px = jax.random.randint(k_x, (num_rays,), 0, w)
        cam = _shard_rays(cam, mesh)
        py = _shard_rays(py, mesh)
        px = _shard_rays(px, mesh)

        rgb_gt = data.images[cam, py, px].astype(jnp.float32) / 255.0
        mask_gt = data.masks[cam, py, px].astype(jnp.float32)
        if config.train_subpixel_jitter:
            # float pixel coords: ray sweeps the pixel footprint (see
            # TrainConfig.train_subpixel_jitter)
            jit = jax.random.uniform(
                k_jit, (2,) + py.shape, minval=-0.5, maxval=0.5
            )
            ray_y = py.astype(jnp.float32) + jit[0]
            ray_x = px.astype(jnp.float32) + jit[1]
        else:
            ray_y, ray_x = py, px

        def loss_fn(params):
            adj = exp_map_so3xr3(params["camera_opt"]) if config.use_camera_opt else None
            bundle = generate_rays(
                data.cameras, cam, ray_y, ray_x, pose_adjustment=adj
            )
            outputs = forward_train(
                params["model"], bundle, config.model, k_samp, state.step, train=True
            )
            losses = loss_dict(outputs, rgb_gt, mask_gt, config.model)
            mc = config.model
            if mc.density_sparsity_mult > 0:
                from ..fields.fruit_field import get_density

                # Uniform WORLD-box sampling (±sparsity_extent), validated at
                # reference scale (283 fruits: eval PSNR 10.5 -> 21.9/27.5).
                # Uniform CONTRACTED-space sampling was tried and made things
                # WORSE (eval stuck at ~10.5 in three runs): 7/8 of contracted
                # volume is the periphery shell, and its hashed cells collide
                # with scene content in the small table — the prior's negative
                # updates drag content features down through the collisions.
                pts = jax.random.uniform(
                    k_sparse, (mc.sparsity_num_points, 3),
                    minval=-mc.sparsity_extent, maxval=mc.sparsity_extent,
                )
                dens, _ = get_density(
                    params["model"]["field"], pts, mc.field, contraction=True
                )
                occ = 1.0 - jnp.exp(-dens * mc.sparsity_cell)
                if mc.sparsity_unobserved_boost > 1.0:
                    # boost the prior where NO training frustum sees the
                    # point: fog there is photometrically unsupervised and
                    # must be carved by the prior alone (sparse captures)
                    from ..cameras.cameras import frustum_coverage

                    cov = frustum_coverage(
                        data.cameras, pts, camera_indices=data.train_indices
                    )
                    w_sp = jnp.where(
                        cov > 0, 1.0, mc.sparsity_unobserved_boost
                    )
                    occ = occ * w_sp
                losses["sparsity_loss"] = mc.density_sparsity_mult * jnp.mean(
                    occ
                )
            total = sum(losses.values())
            metrics = metrics_dict(outputs, rgb_gt)
            return total, (losses, metrics)

        (total, (losses, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = dict(metrics)
        metrics.update(losses)
        metrics["total_loss"] = total
        if config.use_camera_opt:
            t = params["camera_opt"]
            metrics["camera_opt_translation"] = jnp.linalg.norm(t[..., 3:])
            metrics["camera_opt_rotation"] = jnp.linalg.norm(t[..., :3])
        return new_state, metrics

    return step_fn


# ---------------------------------------------------------------------------
# full-image eval rendering (chunked inside one jit; the reference loops
# 1<<15-ray chunks in Python, fruit_nerf.py:225-249)
# ---------------------------------------------------------------------------


def _panel_chunk(params, config, b):
    """One eval-mode forward on a ray chunk -> the 5 output panels (shared
    by the single-device and mesh-sharded render paths)."""
    out = forward_train(
        params["model"], b, config.model, key=None,
        step=jnp.asarray(1 << 30), train=False,
    )
    return {
        "rgb": out["rgb"],
        "depth": out["depth"],
        "accumulation": out["accumulation"],
        "semantics": out["semantics"],
        "semantics_colormap": out["semantics_colormap"],
    }


@functools.partial(jax.jit, static_argnames=("config", "height", "width"))
def _render_rays_chunked(params, bundle_flat, config, height, width):
    chunk = config.eval_rays_per_chunk
    n = height * width
    n_pad = ((n + chunk - 1) // chunk) * chunk

    def pad(x):
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    padded = jax.tree.map(pad, bundle_flat)
    reshaped = jax.tree.map(
        lambda x: x.reshape(n_pad // chunk, chunk, *x.shape[1:]), padded
    )

    outs = jax.lax.map(
        functools.partial(_panel_chunk, params, config), reshaped
    )
    return jax.tree.map(
        lambda x: x.reshape(n_pad, *x.shape[2:])[:n].reshape(
            height, width, *x.shape[2:]
        ),
        outs,
    )


@functools.lru_cache(maxsize=8)
def _render_sharded_fn(mesh, config, height, width):
    """Full-image render with the ray axis sharded over the mesh's 'data'
    axis: each device runs the chunked forward on its ray shard (per-ray
    math, no collectives). The reference's analog is chunking only
    (fruit_nerf.py:225-249) — eval/viewer rendering never scales past one
    GPU there."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = int(mesh.devices.size)
    chunk = config.eval_rays_per_chunk
    n = height * width
    n_pad = ((n + chunk * ndev - 1) // (chunk * ndev)) * (chunk * ndev)

    def local(params, bundle_shard):
        reshaped = jax.tree.map(
            lambda x: x.reshape(-1, chunk, *x.shape[1:]), bundle_shard
        )
        outs = jax.lax.map(
            functools.partial(_panel_chunk, params, config), reshaped
        )
        return jax.tree.map(
            lambda x: x.reshape(-1, *x.shape[2:]), outs
        )

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data")
    )

    @jax.jit
    def run(params, bundle_flat):
        def pad(x):
            pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        outs = fn(params, jax.tree.map(pad, bundle_flat))
        return jax.tree.map(
            lambda x: x[:n].reshape(height, width, *x.shape[1:]), outs
        )

    return run


def render_camera(
    params, cameras: Cameras, camera_index: int, config: TrainConfig,
    mesh=None,
) -> dict[str, jnp.ndarray]:
    """Render every output panel for one camera ([H,W,...] arrays). With
    ``mesh``, rays shard over the 'data' axis (see _render_sharded_fn)."""
    h = int(cameras.height[camera_index])
    w = int(cameras.width[camera_index])
    bundle = generate_image_rays(cameras, camera_index, h, w)
    if mesh is not None:
        return _render_sharded_fn(mesh, config, h, w)(params, bundle)
    return _render_rays_chunked(params, bundle, config, h, w)


# ---------------------------------------------------------------------------
# outer loop
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EvalResult:
    psnr: float
    ssim: float
    iou: float
    num_rays_per_sec: float
    fps: float


@jax.jit
def _eval_metrics(rgb, sem_logits, gt_u8, mask_u8):
    """All four eval metrics in ONE jit: unjitted jnp calls dispatch ~15
    eager ops each through the remote-TPU tunnel and sync the host four
    times — measured ~1.5 s/eval of pure overhead on top of a ~1 s render
    (60 evals x 2.5 s = the 153 s eval_s in the r4 headline loop timings)."""
    from ..utils import metrics as M

    gt = gt_u8.astype(jnp.float32) / 255.0
    mask = mask_u8.astype(jnp.float32)
    return {
        "psnr": M.psnr(rgb, gt),
        "ssim": M.ssim(rgb, gt),
        "iou": M.binary_iou(sem_logits, mask),
        "iou_reference_quirk": M.binary_iou_reference_quirk(sem_logits, mask),
    }


def evaluate_image(
    params,
    data: DeviceDataset,
    camera_index: int,
    config: TrainConfig,
    lpips_weights_path=None,
    mesh=None,
) -> tuple[dict, dict]:
    """Renders one eval camera and computes PSNR/SSIM/IoU + throughput
    (fruit_pipeline.py:157-227 emits num_rays_per_sec and fps). LPIPS is
    reported too when backbone weights are supplied (fruit_nerf.py:425)."""
    import time

    t0 = time.perf_counter()
    out = render_camera(params, data.cameras, camera_index, config, mesh=mesh)
    jax.block_until_ready(out["rgb"])
    dt = time.perf_counter() - t0
    h, w = out["rgb"].shape[:2]
    m = jax.device_get(
        _eval_metrics(
            out["rgb"], out["semantics"][..., 0],
            data.images[camera_index], data.masks[camera_index],
        )
    )
    stats = {
        **{k: float(v) for k, v in m.items()},
        "num_rays_per_sec": h * w / dt,
        "fps": 1.0 / dt,
    }
    if lpips_weights_path is not None:
        from ..utils.lpips import lpips

        gt = data.images[camera_index].astype(jnp.float32) / 255.0
        stats["lpips"] = lpips(out["rgb"], gt, weights_path=lpips_weights_path)
    return stats, out


def train_loop(
    config: TrainConfig,
    data: DeviceDataset,
    eval_indices: np.ndarray | None = None,
    state: TrainState | None = None,
    key: jax.Array | None = None,
    mesh=None,
    writer=None,
    checkpoint_dir=None,
    callbacks=(),
    timings: dict | None = None,
) -> TrainState:
    """Python outer loop; all compute stays on device inside step_fn.

    ``timings`` (optional dict) is filled with accumulated wall-seconds per
    loop section: train_s (chunk dispatch+sync), eval_s, save_s — the
    instrumentation behind the train-loop vs benched-step gap analysis."""
    import time as _time

    from .checkpoints import save_checkpoint, save_checkpoint_async

    # rbg keys: threefry split/fold_in fusions cost ~15ms/step on TPU v5e
    key = key if key is not None else jax.random.key(config.seed, impl="rbg")
    if state is None:
        state = init_train_state(key, config, data.cameras.num_cameras)

    # chunk the loop: advance to the next log/eval/save boundary in ONE
    # device call (see make_train_chunk — per-step dispatch measured ~24 ms
    # of host overhead through the remote-TPU tunnel). Per-step callbacks
    # force the single-step path. Chunk length = gcd of the active
    # boundaries (capped at 512) so every boundary lands on a chunk edge.
    import math

    active = []
    if writer is not None and config.steps_per_log > 0:
        active.append(config.steps_per_log)
    if eval_indices is not None and len(eval_indices) and config.steps_per_eval > 0:
        active.append(config.steps_per_eval)
    if checkpoint_dir is not None and config.steps_per_save > 0:
        active.append(config.steps_per_save)
    g = math.gcd(*active) if active else 512
    if g > 512:  # largest divisor of g that fits the cap
        g = max(d for d in range(1, 513) if g % d == 0)
    chunk_len = 1 if callbacks else max(1, g)
    chunk_fns: dict[int, Any] = {}

    def advance(state, n):
        if n not in chunk_fns:
            fn = (
                make_train_step(config, mesh) if n == 1
                else make_train_chunk(config, mesh, length=n)
            )
            # AOT-compile each chunk shape (30-120 s cold through the remote
            # tunnel; ~1 s from the persistent cache) so compile_s holds ONLY
            # compilation and every dispatch — including the first — counts
            # toward train_s. (Booking the whole first dispatch as compile
            # excluded a chunk of real training per shape and overstated the
            # steady-state rate, ADVICE r4 #2.) The Compiled object is kept:
            # re-calling the jit wrapper would not reuse this compilation.
            t0 = _time.perf_counter()
            chunk_fns[n] = fn.lower(state, data, key).compile()
            timings["compile_s"] += _time.perf_counter() - t0
        return chunk_fns[n](state, data, key)

    # preemption safety: SIGTERM/SIGINT set a flag; the loop checkpoints at
    # the next chunk edge and returns early (resume_from_latest picks it up).
    # Production TPU pools preempt with SIGTERM; the reference's only story
    # is its periodic save (fruit_nerf_config.py:31). Main-thread only —
    # signal.signal raises ValueError elsewhere (e.g. the viewer's threads).
    import signal
    import threading

    stop = threading.Event()
    prev_handlers = {}
    if checkpoint_dir is not None and threading.current_thread() is threading.main_thread():

        def _on_signal(signum, frame):
            del frame
            stop.set()

        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _on_signal)

    if timings is None:
        timings = {}
    timings.setdefault("train_s", 0.0)
    timings.setdefault("eval_s", 0.0)
    timings.setdefault("save_s", 0.0)
    timings.setdefault("compile_s", 0.0)
    pending_saves: list = []

    try:
        it = int(state.step)
        metrics = None
        while it < config.max_iters:
            t0 = _time.perf_counter()
            compile_before = timings["compile_s"]
            n = min(chunk_len - (it % chunk_len), config.max_iters - it)
            state, metrics = advance(state, n)
            it += n
            t0 += timings["compile_s"] - compile_before  # exclude compiles
            if stop.is_set():
                jax.block_until_ready(state.params)
                for fut in pending_saves:
                    fut.result()
                path = save_checkpoint(checkpoint_dir, state)
                print(
                    f"train_loop: signal received — checkpointed step "
                    f"{int(state.step)} to {path}; exiting early",
                    flush=True,
                )
                return state
            if writer is not None and config.steps_per_log > 0 and it % config.steps_per_log == 0:
                # ONE device_get for the whole metrics dict: per-metric
                # float(v) is a separate synchronous transfer (~30 ms each
                # through the remote-TPU tunnel; ~12 metrics x 300 chunks
                # accounted for ~100 s of the r4 headline's in-train gap)
                host_metrics = jax.device_get(metrics)
                writer.write(
                    int(state.step),
                    {k: float(v) for k, v in host_metrics.items()},
                )
            timings["train_s"] += _time.perf_counter() - t0

            if (
                config.steps_per_eval > 0
                and it % config.steps_per_eval == 0
                and eval_indices is not None
                and len(eval_indices)
            ):
                t0 = _time.perf_counter()
                # rotate through the eval cameras across eval steps (the
                # reference evals a random eval image each time,
                # fruit_pipeline.py:147-155)
                which = (it // config.steps_per_eval - 1) % len(eval_indices)
                stats, _ = evaluate_image(
                    state.params, data, int(eval_indices[which]), config
                )
                if writer is not None:
                    writer.write(int(state.step), {f"eval_{k}": v for k, v in stats.items()})
                timings["eval_s"] += _time.perf_counter() - t0
            if checkpoint_dir is not None and config.steps_per_save > 0 and it % config.steps_per_save == 0:
                t0 = _time.perf_counter()
                # device->host snapshot blocks only on the transfer; the
                # msgpack serialization + disk write overlap the next chunk
                pending_saves.append(save_checkpoint_async(checkpoint_dir, state))
                timings["save_s"] += _time.perf_counter() - t0
            for cb in callbacks:
                cb(int(state.step), state, metrics)
        # final checkpoint at loop end (nerfstudio's Trainer also saves after
        # training); max_iters is rarely a steps_per_save multiple
        if checkpoint_dir is not None and config.steps_per_save > 0:
            t0 = _time.perf_counter()
            if it % config.steps_per_save != 0:
                pending_saves.append(
                    save_checkpoint_async(checkpoint_dir, state)
                )
            for fut in pending_saves:
                fut.result()  # flush + surface background-write errors
            timings["save_s"] += _time.perf_counter() - t0
        return state
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)


def subsample_train_images(data: DeviceDataset, max_images: int) -> DeviceDataset:
    """Evenly subsample the training image set (the big/huge presets train on
    200 images with dataloader repeats, fruit_nerf_config.py:63-111; with the
    device-resident store a repeat factor is meaningless — sampling is uniform
    over the kept images every step)."""
    idx = np.asarray(data.train_indices)
    if len(idx) <= max_images:
        return data
    keep = np.unique(np.linspace(0, len(idx) - 1, max_images, dtype=np.int64))
    return data.replace(train_indices=jnp.asarray(idx[keep], jnp.int32))


def evaluate_all(
    params, data: DeviceDataset, indices, config: TrainConfig,
    lpips_weights_path=None,
    mesh=None,
) -> dict:
    """Average eval metrics over cameras + throughput, the
    ``get_average_eval_image_metrics`` analog (fruit_pipeline.py:176-227)."""
    all_stats = []
    for ci in indices:
        stats, _ = evaluate_image(
            params, data, int(ci), config,
            lpips_weights_path=lpips_weights_path, mesh=mesh,
        )
        all_stats.append(stats)
    keys = all_stats[0].keys()
    return {k: float(np.mean([s[k] for s in all_stats])) for k in keys}
