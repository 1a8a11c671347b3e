"""fruitnerf_tpu — TPU-native semantic radiance-field framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of meyerls/FruitNeRF
(a nerfstudio 0.3.2 plugin backed by tiny-cuda-nn CUDA kernels): train a
nerfacto-style NeRF with a semantic "fruit" head from RGB images + binary fruit
masks, volume-sample the trained field into fruit-only point clouds, and count
fruits via cascaded clustering.

Layer map (mirrors reference SURVEY.md §1):
  core/      ray & sampling math (RayBundle/RaySamples pytrees, samplers,
             alpha compositing, losses)
  cameras/   intrinsics + distortion, pose normalization, SO3xR3 camera opt
  fields/    hash-grid / SH / frequency encodings, FruitField, proposal fields
  models/    FruitModel with train / inference / export forward modes
  data/      transforms.json parser, mask ingestion, device-resident sampling
  engine/    jit'd train step, optimizers/schedules, checkpoints, eval
  export/    batched XLA volume grid query -> .ply fruit point clouds
  counting/  DBSCAN + merge/split cascade + template ICP fruit counter
  parallel/  mesh + sharding helpers (data-parallel pjit)
  ops/       Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
