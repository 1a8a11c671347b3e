"""Image-quality + segmentation metrics (torchmetrics equivalents the
reference evaluates with: PSNR / SSIM / IoU, fruit_nerf.py:175-177,403-458;
LPIPS needs pretrained VGG weights — unavailable offline, reported as None)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-10))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0
) -> jnp.ndarray:
    """Standard SSIM with an 11x11 gaussian window. pred/target: [H, W, C]."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel()[None, None]  # [1,1,11,11] OIHW

    def filt(img):
        # [H,W,C] -> [C,1,H,W] grouped conv, per channel
        x = jnp.transpose(img, (2, 0, 1))[:, None]
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID"
        )
        return out[:, 0]

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    # E[x^2]-mu^2 cancels catastrophically in f32 on near-flat regions and can
    # go (slightly) negative, driving den negative and the map out of [-1,1];
    # clamp variances at 0 (covariance is then Cauchy-Schwarz-bounded).
    sigma_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(filt(target * target) - mu_tt, 0.0)
    sigma_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(jnp.clip(num / den, -1.0, 1.0))


def binary_iou(
    sem_logits: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """Sigmoid-threshold IoU — the *fixed* metric. The reference computes IoU
    on a softmax over a single logit, which is constant 1.0 (degenerate quirk,
    fruit_nerf.py:454); see ``binary_iou_reference_quirk``."""
    pred = (jax.nn.sigmoid(sem_logits) > threshold).astype(jnp.float32)
    gt = (mask > 0.5).astype(jnp.float32)
    inter = jnp.sum(pred * gt)
    union = jnp.sum(jnp.clip(pred + gt, 0, 1))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)


def binary_iou_reference_quirk(sem_logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Reproduces the reference's degenerate IoU (softmax over one logit == 1
    everywhere -> IoU == mean(mask>0 ... against all-ones)). Logged alongside
    the fixed metric for parity auditing."""
    pred = jnp.ones_like(sem_logits)  # softmax of a single logit
    gt = (mask > 0.5).astype(jnp.float32)
    inter = jnp.sum(pred * gt)
    union = jnp.sum(jnp.clip(pred + gt, 0, 1))
    return inter / jnp.maximum(union, 1.0)
