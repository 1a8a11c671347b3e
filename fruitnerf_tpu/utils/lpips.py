"""LPIPS (learned perceptual image patch similarity) in pure JAX.

The reference evaluates LPIPS via torchmetrics with pretrained VGG/AlexNet
weights (fruit_nerf.py:16,177,425). This build environment has no network
egress and no vendored perceptual weights, so the *weights* must be supplied
by the user; the *computation* — the standard Zhang et al. 2018 formula — is
implemented here in full:

  1. map inputs from [0,1] to [-1,1] (torchmetrics ``normalize=True``)
  2. per-channel shift/scale whitening
  3. VGG-style backbone: stages of (3x3 conv, pad 1) + ReLU, with 2x2/2
     max-pool between stages; the activation AFTER the last ReLU of each
     stage is a feature tap
  4. unit-normalize each tap across channels
  5. squared difference -> 1x1 "lin" conv (non-negative weights) -> spatial
     mean -> sum over stages

Expected ``.npz`` schema (all arrays in torch conv layout ``[out,in,kh,kw]``,
biases ``[out]``):

  shift                 [3]   per-channel whitening shift (e.g. VGG
  scale                 [3]   -.030/-.088/-.188 and .458/.448/.450)
  stage{s}_conv{j}_w    conv weight, s = 0..S-1, j = 0..(convs in stage)-1
  stage{s}_conv{j}_b    conv bias
  lin{s}_w              [1,C_s,1,1] (or [C_s]) LPIPS linear head per stage

To export from the official ``lpips`` PyTorch package::

  import lpips, numpy as np
  m = lpips.LPIPS(net='vgg')
  out = {'shift': m.scaling_layer.shift.numpy().ravel(),
         'scale': m.scaling_layer.scale.numpy().ravel()}
  slices = [m.net.slice1, m.net.slice2, m.net.slice3, m.net.slice4, m.net.slice5]
  for s, sl in enumerate(slices):
      convs = [l for l in sl if l.__class__.__name__ == 'Conv2d']
      for j, c in enumerate(convs):
          out[f'stage{s}_conv{j}_w'] = c.weight.detach().numpy()
          out[f'stage{s}_conv{j}_b'] = c.bias.detach().numpy()
  for s, lin in enumerate(m.lins):
      out[f'lin{s}_w'] = lin.model[-1].weight.detach().numpy()
  np.savez('lpips_vgg.npz', **out)
"""
from __future__ import annotations

import functools
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def load_lpips_weights(weights_path) -> dict:
    """Parse the npz into {shift, scale, stages: [[(w,b),...]], lins: [w]}."""
    raw = dict(np.load(weights_path))
    stage_keys = sorted(
        (int(m.group(1)), int(m.group(2)))
        for k in raw
        if (m := re.fullmatch(r"stage(\d+)_conv(\d+)_w", k))
    )
    if not stage_keys:
        raise ValueError(
            f"{weights_path}: no 'stage{{s}}_conv{{j}}_w' arrays found; see "
            "fruitnerf_tpu.utils.lpips docstring for the expected npz schema"
        )
    num_stages = max(s for s, _ in stage_keys) + 1
    stages = []
    for s in range(num_stages):
        convs = []
        for j in range(max(j for t, j in stage_keys if t == s) + 1):
            w = jnp.asarray(raw[f"stage{s}_conv{j}_w"], jnp.float32)
            b = jnp.asarray(raw[f"stage{s}_conv{j}_b"], jnp.float32)
            convs.append((w, b))
        stages.append(convs)
    lins = []
    for s in range(num_stages):
        lw = jnp.asarray(raw[f"lin{s}_w"], jnp.float32).reshape(-1)
        lins.append(lw)
    shift = jnp.asarray(raw.get("shift", np.zeros(3)), jnp.float32).reshape(1, 3, 1, 1)
    scale = jnp.asarray(raw.get("scale", np.ones(3)), jnp.float32).reshape(1, 3, 1, 1)
    return {"stages": stages, "lins": lins, "shift": shift, "scale": scale}


def _conv3x3(x, w, b):
    """NCHW conv with torch-layout [out,in,kh,kw] weights, SAME-for-3x3 pad."""
    kh, kw = w.shape[2], w.shape[3]
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.reshape(1, -1, 1, 1)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def _features(x, weights):
    """Feature taps after each stage's final ReLU (maxpool between stages)."""
    taps = []
    for s, convs in enumerate(weights["stages"]):
        if s > 0:
            x = _maxpool2(x)
        for w, b in convs:
            x = jax.nn.relu(_conv3x3(x, w, b))
        taps.append(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True) + eps)


def lpips_fn(pred, target, weights) -> jnp.ndarray:
    """LPIPS on [N,3,H,W] or [H,W,3] inputs in [0,1], given parsed weights."""
    def to_nchw(img):
        img = jnp.asarray(img, jnp.float32)
        if img.ndim == 3:  # [H,W,3]
            img = img.transpose(2, 0, 1)[None]
        return img

    p, t = to_nchw(pred), to_nchw(target)
    # [0,1] -> [-1,1] (torchmetrics normalize=True), then whitening
    p = (2.0 * p - 1.0 - weights["shift"]) / weights["scale"]
    t = (2.0 * t - 1.0 - weights["shift"]) / weights["scale"]
    total = 0.0
    for fp, ft, lw in zip(_features(p, weights), _features(t, weights), weights["lins"]):
        d = (_unit_normalize(fp) - _unit_normalize(ft)) ** 2
        # 1x1 non-negative lin conv == channel-weighted sum
        per_pixel = jnp.einsum("nchw,c->nhw", d, lw)
        total = total + per_pixel.mean(axis=(1, 2))
    return total.mean()


@functools.lru_cache(maxsize=2)
def _cached_weights(path_str: str):
    return load_lpips_weights(path_str)


def lpips(pred, target, weights_path: str | Path | None = None):
    """LPIPS distance between two images in [0,1].

    ``weights_path`` points at an npz of backbone + lin-head weights (schema
    in the module docstring). Without weights LPIPS cannot be computed
    faithfully offline — raises with guidance (the reference's torchmetrics
    LPIPS downloads pretrained VGG at import, fruit_nerf.py:177)."""
    if weights_path is None:
        raise NotImplementedError(
            "LPIPS needs pretrained backbone weights, unavailable in this "
            "offline environment. Provide weights_path (npz; schema in "
            "fruitnerf_tpu.utils.lpips docstring) or use psnr/ssim/iou from "
            "fruitnerf_tpu.utils.metrics."
        )
    weights = _cached_weights(str(weights_path))
    return float(lpips_fn(pred, target, weights))
