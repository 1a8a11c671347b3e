"""End-to-end smoke: train the hash-grid FruitModel on a synthetic fruit
scene (the build plan's 'minimum end-to-end slice', SURVEY.md §7.2), verify
losses fall, rendering works, and checkpoints roundtrip."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fruitnerf_tpu.configs import fruit_nerf_smoke
from fruitnerf_tpu.data.builder import dataset_from_scene
from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene
from fruitnerf_tpu.engine.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    read_manifest,
    resume_from_latest,
    save_checkpoint,
    write_manifest,
)
from fruitnerf_tpu.engine.trainer import (
    evaluate_image,
    init_train_state,
    make_train_step,
    render_camera,
)


@pytest.fixture(scope="module")
def scene():
    return render_scene(
        SyntheticSceneConfig(num_fruits=5, fruit_radius=0.13, num_cameras=12, image_size=48, num_leaves=8)
    )


@pytest.fixture(scope="module")
def data(scene):
    return dataset_from_scene(scene)


@pytest.fixture(scope="module")
def config(data):
    cfg = fruit_nerf_smoke(num_images=data.cameras.num_cameras)
    return dataclasses.replace(cfg, train_rays_per_batch=512)


@pytest.fixture(scope="module")
def trained(config, data):
    # 640 steps, not 320: semantic fruit/background separation at 320 smoke
    # steps is dominated by SEED variance, not capability — measured across
    # jitter x {seed 0,1,2}: @320 the separation spans 0.017-0.78 for
    # jitter-on and 0.044-0.77 for jitter-off (same config otherwise); by
    # @640 every run exceeds 0.023. The round-2 suite red on this fixture
    # (0.0177 < 0.02 with jitter on) was inside that noise band, not a
    # jitter regression. See NOTES_ROUND3 "jitter regression resolution".
    state = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    step_fn = make_train_step(config)
    key = jax.random.PRNGKey(1)
    first_metrics = None
    for i in range(640):
        state, metrics = step_fn(state, data, key)
        if first_metrics is None:
            first_metrics = jax.tree.map(float, metrics)
    return state, jax.tree.map(float, metrics), first_metrics


def test_losses_decrease(trained):
    _, last, first = trained
    assert last["rgb_loss"] < first["rgb_loss"] * 0.8
    assert last["semantics_loss"] < first["semantics_loss"]
    assert np.isfinite(last["total_loss"])
    assert last["psnr"] > first["psnr"]


def test_render_camera_outputs(trained, config, data):
    state, _, _ = trained
    out = render_camera(state.params, data.cameras, 0, config)
    h, w = data.image_shape
    assert out["rgb"].shape == (h, w, 3)
    assert out["depth"].shape == (h, w)
    assert out["semantics_colormap"].shape == (h, w, 1)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all() and rgb.min() >= 0 and rgb.max() <= 1


def test_eval_metrics_reasonable(trained, config, data):
    state, _, _ = trained
    stats, _ = evaluate_image(state.params, data, 0, config)
    # 120 tiny steps won't be pretty, but must beat a constant image
    assert stats["psnr"] > 10.0
    assert 0.0 <= stats["iou"] <= 1.0
    assert stats["num_rays_per_sec"] > 0
    # the reference-quirk IoU equals fruit-pixel fraction vs all-ones
    assert 0.0 <= stats["iou_reference_quirk"] <= 1.0


def test_semantics_learned_fruit_vs_background(trained, config, data, scene):
    state, _, _ = trained
    out = render_camera(state.params, data.cameras, 0, config)
    sem = np.asarray(jax.nn.sigmoid(out["semantics"][..., 0]))
    mask = np.asarray(data.masks[0]).astype(bool)
    if mask.sum() > 4:
        # fruit pixels should score higher than background on average.
        # Margin settled from the measured @640 worst case (0.023 across
        # jitter x seed; see the `trained` fixture comment) — 0.015 keeps
        # ~35% headroom below the slowest observed run while still failing
        # on any genuinely unlearned semantic head (separation ~0).
        assert sem[mask].mean() > sem[~mask].mean() + 0.015


def test_checkpoint_roundtrip(trained, config, data, tmp_path):
    state, _, _ = trained
    path = save_checkpoint(tmp_path, state)
    assert latest_checkpoint(tmp_path) == path
    template = init_train_state(jax.random.PRNGKey(9), config, data.cameras.num_cameras)
    restored = load_checkpoint(path, template)
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(restored.params["model"]["field"]["hash_table"]),
        np.asarray(state.params["model"]["field"]["hash_table"]),
    )
    # restored state continues training identically. step_fn donates its
    # input state, and `state` is the module-scoped fixture used by later
    # tests — pass a copy so its buffers survive.
    step_fn = make_train_step(config)
    state_copy = jax.tree.map(jnp.copy, state)
    s1, m1 = step_fn(state_copy, data, jax.random.PRNGKey(7))
    s2, m2 = step_fn(restored, data, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )


def test_resume_from_latest_empty_dir(tmp_path, config, data):
    template = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    state, resumed = resume_from_latest(tmp_path, template)
    assert not resumed


def test_manifest_roundtrip(tmp_path):
    write_manifest(
        tmp_path,
        preset="fruit_nerf_smoke",
        dataparser_transform=np.eye(4)[:3],
        dataparser_scale=0.5,
        scene_aabb=np.array([[-1.0] * 3, [1.0] * 3]),
        num_images=12,
    )
    m = read_manifest(tmp_path)
    assert m["dataparser_scale"] == 0.5
    assert m["preset"] == "fruit_nerf_smoke"
    assert np.asarray(m["dataparser_transform"]).shape == (3, 4)


def test_determinism_same_seed_same_loss(config, data):
    """SURVEY.md §5: add a determinism check (same seed -> same trajectory)."""
    def run():
        state = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
        step_fn = make_train_step(config)
        for _ in range(3):
            state, metrics = step_fn(state, data, jax.random.PRNGKey(1))
        return float(metrics["total_loss"])

    assert run() == run()


def test_train_step_multidevice_mesh(config, data):
    """DP sharding: the train step runs under an 8-device mesh with the ray
    batch sharded over the data axis."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from fruitnerf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    step_fn = make_train_step(config, mesh=mesh)
    state2, metrics = step_fn(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state2.step) == 1


def test_dp_1_vs_8_numerical_equivalence(config, data):
    """SURVEY.md §4: DP on 1 chip == DP on N chips. Same init and batch key;
    the 8-device sharded step must produce the same loss, metrics, and
    updated params as the single-device step. A wrong sharding annotation
    that silently averaged instead of summing gradients would fail here."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    def run(mesh):
        state = init_train_state(
            jax.random.PRNGKey(0), config, data.cameras.num_cameras
        )
        step_fn = make_train_step(config, mesh=mesh)
        state, metrics = step_fn(state, data, jax.random.PRNGKey(1))
        return state, jax.tree.map(float, metrics)

    s1, m1 = run(None)
    s8, m8 = run(Mesh(np.asarray(jax.devices()[:8]), ("data",)))
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, err_msg=k)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    assert len(leaves1) == len(leaves8)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_volume_export_finds_fruit(trained, config, data, scene, tmp_path):
    """Export the trained field (tiny grid) and check surviving semantic
    points lie near ground-truth fruit centers (SURVEY.md §4: export-shape
    test on a known scene)."""
    import dataclasses as dc

    from fruitnerf_tpu.export.volume_sampler import ExportConfig, sample_volume

    state, _, _ = trained
    exp_cfg = ExportConfig(
        bounding_box_min=(-0.7, -0.7, -0.7),
        bounding_box_max=(0.7, 0.7, 0.7),
        num_points_per_side=48,
        num_rays_per_batch=48 * 48,
        # short training -> use permissive thresholds scaled to smoke model
        semantic_logit_threshold=-1.0,
        density_threshold=0.3,
        colormap_prob_threshold=0.6,
        compaction_fraction=0.5,
    )
    out = sample_volume(
        state.params["model"], config.model, exp_cfg,
        dataparser_scale=1.0, output_dir=tmp_path, progress=False,
    )
    assert (tmp_path / "semantic.ply").exists()
    assert (tmp_path / "density.ply").exists()
    sem = out["semantic"]["points"]
    assert out["density"]["points"].shape[0] > 0
    if sem.shape[0] >= 20:
        # exported points are already in true scene coordinates (the x2
        # un-normalization undoes the contraction/normalization mismatch)
        pts = sem
        centers = scene["fruit_centers"]
        d = np.linalg.norm(pts[:, None, :] - centers[None], axis=-1).min(axis=1)
        # most surviving semantic points sit within ~2 fruit radii of a fruit
        assert np.median(d) < 2.5 * scene["fruit_radius"], (
            sem.shape, float(np.median(d)))


def test_train_loop_sigterm_checkpoints_and_exits(config, data, tmp_path):
    """Preemption safety: SIGTERM mid-run makes train_loop checkpoint at the
    next chunk edge and return early; resume_from_latest continues from it.
    (Production TPU pools preempt with SIGTERM; the reference only has its
    periodic save, fruit_nerf_config.py:31.)"""
    import dataclasses as dc
    import os
    import signal

    from fruitnerf_tpu.engine.checkpoints import latest_checkpoint, resume_from_latest
    from fruitnerf_tpu.engine.trainer import init_train_state, train_loop

    cfg = dc.replace(config, max_iters=50, steps_per_save=1000, steps_per_eval=0)
    fired = []

    def send_sigterm(step, state, metrics):
        if step >= 3 and not fired:
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    prev = signal.getsignal(signal.SIGTERM)
    state = train_loop(
        cfg, data, checkpoint_dir=tmp_path, callbacks=(send_sigterm,)
    )
    assert signal.getsignal(signal.SIGTERM) == prev, "handler not restored"
    assert fired and int(state.step) < 50, int(state.step)
    ckpt = latest_checkpoint(tmp_path)
    assert ckpt is not None
    template = init_train_state(jax.random.PRNGKey(0), cfg, data.cameras.num_cameras)
    resumed, ok = resume_from_latest(tmp_path, template)
    assert ok and int(resumed.step) == int(state.step)


def test_render_camera_mesh_sharded_equivalence(trained, config, data):
    """Ray-sharded full-image rendering == single-device chunked rendering
    (SURVEY §5: shard the ray axis across the mesh — 'sequence parallelism'
    for rays; the reference only chunks, fruit_nerf.py:225-249)."""
    from jax.sharding import Mesh

    from fruitnerf_tpu.engine.trainer import render_camera

    state, _, _ = trained
    out1 = render_camera(state.params, data.cameras, 0, config)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    out8 = render_camera(state.params, data.cameras, 0, config, mesh=mesh)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out8[k]), atol=1e-5, err_msg=k
        )


def test_volume_export_mesh_sharded_equivalence(trained, config, tmp_path):
    """Mesh-sharded export (each device compacts its ray shard) recovers the
    same point multiset as the single-device stream — the export-side scaling
    story (SURVEY §5: 'stream the N^3 export grid as sharded batched
    queries'); the reference export is strictly single-GPU (exporter.py)."""
    from jax.sharding import Mesh

    from fruitnerf_tpu.export.volume_sampler import ExportConfig, sample_volume

    state, _, _ = trained
    exp_cfg = ExportConfig(
        bounding_box_min=(-0.7, -0.7, -0.7),
        bounding_box_max=(0.7, 0.7, 0.7),
        num_points_per_side=32,
        num_rays_per_batch=32 * 32,
        semantic_logit_threshold=-1.0,
        density_threshold=0.3,
        colormap_prob_threshold=0.6,
        compaction_fraction=0.5,
    )

    def run(mesh, sub):
        return sample_volume(
            state.params["model"], config.model, exp_cfg,
            dataparser_scale=1.0, output_dir=tmp_path / sub, progress=False,
            mesh=mesh,
        )

    out1 = run(None, "single")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    out8 = run(mesh, "mesh")
    for name in ("semantic", "semantic_colormap", "density"):
        p1, p8 = out1[name]["points"], out8[name]["points"]
        assert p1.shape == p8.shape, (name, p1.shape, p8.shape)
        assert not out1[name]["overflowed"] and not out8[name]["overflowed"]
        if p1.shape[0] == 0:
            continue
        o1 = np.lexsort(p1.T)
        o8 = np.lexsort(p8.T)
        np.testing.assert_allclose(p1[o1], p8[o8], atol=1e-5, err_msg=name)
        np.testing.assert_allclose(
            out1[name]["colors"][o1], out8[name]["colors"][o8], atol=1e-5,
            err_msg=name,
        )


def test_distortion_loss_opt_in(config, data):
    """The reference keeps distortion metric-only (fruit_nerf.py:400); the
    opt-in flag must add it as a real loss term (anti-floater at scale)."""
    import dataclasses

    cfg = dataclasses.replace(
        config, model=dataclasses.replace(config.model, use_distortion_loss=True)
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg, data.cameras.num_cameras)
    step_fn = make_train_step(cfg)
    state, metrics = step_fn(state, data, jax.random.PRNGKey(1))
    assert "distortion_loss" in metrics
    assert float(metrics["distortion_loss"]) >= 0.0
    # total includes the term
    parts = [float(metrics[k]) for k in
             ("rgb_loss", "semantics_loss", "interlevel_loss", "distortion_loss")]
    assert abs(float(metrics["total_loss"]) - sum(parts)) < 1e-4


def test_sparsity_loss_opt_in(config, data):
    """Occupancy-sparsity prior: off by default (reference parity); when on,
    the term appears, is in [0, mult], and contributes to the total."""
    import dataclasses

    cfg = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, density_sparsity_mult=0.01,
                                  sparsity_num_points=256),
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg, data.cameras.num_cameras)
    step_fn = make_train_step(cfg)
    state, metrics = step_fn(state, data, jax.random.PRNGKey(1))
    assert "sparsity_loss" in metrics
    v = float(metrics["sparsity_loss"])
    assert 0.0 <= v <= 0.01 + 1e-6
    parts = [float(metrics[k]) for k in
             ("rgb_loss", "semantics_loss", "interlevel_loss", "sparsity_loss")]
    assert abs(float(metrics["total_loss"]) - sum(parts)) < 1e-4
    # default config emits no such term
    state0 = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    _, m0 = make_train_step(config)(state0, data, jax.random.PRNGKey(1))
    assert "sparsity_loss" not in m0


def test_train_chunk_equals_single_steps(config, data):
    """make_train_chunk(n) must be bit-identical to n single steps (RNG and
    schedules fold in state.step, so chunking is pure batching)."""
    from fruitnerf_tpu.engine.trainer import make_train_chunk

    key = jax.random.PRNGKey(3)
    s1 = init_train_state(jax.random.PRNGKey(7), config, data.cameras.num_cameras)
    s2 = init_train_state(jax.random.PRNGKey(7), config, data.cameras.num_cameras)
    step = make_train_step(config)
    for _ in range(5):
        s1, m1 = step(s1, data, key)
    chunk = make_train_chunk(config, length=5)
    s2, m2 = chunk(s2, data, key)
    assert int(s1.step) == int(s2.step) == 5
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6
    )
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6,
                                   atol=1e-7)


def test_density_bias_shifts_init_density(config, data):
    """density_bias shifts the raw logit: at init, bias -3 scales density by
    ~exp(-3) (the sparse-capture start-empty fix)."""
    import dataclasses as dc

    from fruitnerf_tpu.fields.fruit_field import get_density, init_fruit_field

    f0 = config.model.field
    fb = dc.replace(f0, density_bias=-3.0)
    params = init_fruit_field(jax.random.PRNGKey(0), f0)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5,
                             maxval=0.5)
    d0, _ = get_density(params, pts, f0)
    db, _ = get_density(params, pts, fb)
    ratio = np.asarray(db) / np.maximum(np.asarray(d0), 1e-12)
    np.testing.assert_allclose(ratio, np.exp(-3.0), rtol=1e-4)
