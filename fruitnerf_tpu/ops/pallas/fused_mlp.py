"""Fully-fused MLP as a Pallas TPU kernel (forward + custom VJP).

The TPU-native analog of tiny-cuda-nn's FullyFusedMLP (the reference's
``implementation="tcnn"`` MLPs, fruit_field.py:94): all layer weights live in
VMEM for the whole pass and inter-layer activations never touch HBM — one
block of rows streams HBM->VMEM, runs every layer on the MXU, and streams the
output back. The backward kernel recomputes forward activations per block
(cheap, MXU-bound) and accumulates weight/bias gradients in VMEM across the
row-block grid (constant-index output blocks persist between grid steps),
zeroing at the first block.

Semantics match ``fields.mlp.apply_mlp`` with ReLU hidden activations and no
output activation: f32 params/in/out, bf16 (or f32) compute. Rows are padded
to the block size internally.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 1024


def _interpret() -> bool:
    # interpret mode keeps the kernels testable on CPU
    return jax.devices()[0].platform == "cpu"


def _forward_pass(x, ws, bs, compute_dtype, keep_preacts=False):
    """Shared layer loop; returns output (+ pre-activation list)."""
    h = x.astype(compute_dtype)
    preacts = []
    n = len(ws)
    for i in range(n):
        # Mosaic requires 32-bit matmul accumulators; cast back after
        h = (
            jnp.dot(h, ws[i].astype(compute_dtype), preferred_element_type=jnp.float32)
            .astype(compute_dtype)
            + bs[i].astype(compute_dtype)[None, :]
        )
        if keep_preacts:
            preacts.append(h)
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return (h, preacts) if keep_preacts else h


def _fwd_kernel(n_layers, compute_dtype, x_ref, *refs):
    ws = [refs[2 * i][:] for i in range(n_layers)]
    bs = [refs[2 * i + 1][:] for i in range(n_layers)]
    out_ref = refs[-1]
    out = _forward_pass(x_ref[:], ws, bs, compute_dtype)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(n_layers, compute_dtype, x_ref, g_ref, *refs):
    ws = [refs[2 * i][:] for i in range(n_layers)]
    bs = [refs[2 * i + 1][:] for i in range(n_layers)]
    dx_ref = refs[2 * n_layers]
    dparam_refs = refs[2 * n_layers + 1 :]  # dw0, db0, dw1, db1, ...

    i_blk = pl.program_id(0)

    x = x_ref[:].astype(compute_dtype)
    _, preacts = _forward_pass(x, ws, bs, compute_dtype, keep_preacts=True)

    @pl.when(i_blk == 0)
    def _zero():
        for r in dparam_refs:
            r[:] = jnp.zeros_like(r)

    g = g_ref[:].astype(compute_dtype)
    for i in reversed(range(n_layers)):
        a_in = x if i == 0 else jnp.maximum(preacts[i - 1], 0.0)
        dw = jax.lax.dot_general(
            a_in, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dparam_refs[2 * i][:] += dw
        dparam_refs[2 * i + 1][:] += jnp.sum(
            g.astype(jnp.float32), axis=0
        )
        g = jax.lax.dot_general(
            g, ws[i].astype(compute_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
        if i > 0:
            # Mosaic rejects bf16 comparisons on this target: compare in f32
            mask = preacts[i - 1].astype(jnp.float32) > 0.0
            g = g * mask.astype(compute_dtype)
    dx_ref[:] = g.astype(dx_ref.dtype)


def _pad_rows(x, block_rows):
    p = x.shape[0]
    pad = (-p) % block_rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, p


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def fused_mlp(x, params_flat, n_layers, compute_dtype_name, block_rows):
    """x [P, Din] f32, params_flat = (w0, b0, ..., w{n-1}, b{n-1}).

    Returns [P, Dout] f32 (no output activation)."""
    return _fused_fwd_impl(x, params_flat, n_layers, compute_dtype_name, block_rows)


def _fused_fwd_impl(x, params_flat, n_layers, compute_dtype_name, block_rows):
    cdt = jnp.dtype(compute_dtype_name)
    xp, p = _pad_rows(x, block_rows)
    d_out = params_flat[-2].shape[-1]
    grid = (xp.shape[0] // block_rows,)
    weight_specs = []
    for i in range(n_layers):
        weight_specs.append(pl.BlockSpec(params_flat[2 * i].shape, lambda g: (0, 0)))
        weight_specs.append(pl.BlockSpec(params_flat[2 * i + 1].shape, lambda g: (0,)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, cdt),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d_out), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, x.shape[1]), lambda g: (g, 0)),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((block_rows, d_out), lambda g: (g, 0)),
        interpret=_interpret(),
    )(xp, *params_flat)
    return out[:p]


def _fused_fwd_vjp(x, params_flat, n_layers, compute_dtype_name, block_rows):
    out = _fused_fwd_impl(x, params_flat, n_layers, compute_dtype_name, block_rows)
    return out, (x, params_flat)


def _fused_bwd_vjp(n_layers, compute_dtype_name, block_rows, residuals, g):
    x, params_flat = residuals
    cdt = jnp.dtype(compute_dtype_name)
    xp, p = _pad_rows(x, block_rows)
    gp, _ = _pad_rows(g, block_rows)
    grid = (xp.shape[0] // block_rows,)

    weight_specs = []
    for i in range(n_layers):
        weight_specs.append(pl.BlockSpec(params_flat[2 * i].shape, lambda gg: (0, 0)))
        weight_specs.append(
            pl.BlockSpec(params_flat[2 * i + 1].shape, lambda gg: (0,))
        )
    dparam_shapes = []
    dparam_specs = []
    for i in range(n_layers):
        w, b = params_flat[2 * i], params_flat[2 * i + 1]
        dparam_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        dparam_specs.append(pl.BlockSpec(w.shape, lambda gg: (0, 0)))
        dparam_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        dparam_specs.append(pl.BlockSpec(b.shape, lambda gg: (0,)))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, cdt),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            *dparam_shapes,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, x.shape[1]), lambda gg: (gg, 0)),
            pl.BlockSpec((block_rows, g.shape[1]), lambda gg: (gg, 0)),
            *weight_specs,
        ],
        out_specs=(
            pl.BlockSpec((block_rows, x.shape[1]), lambda gg: (gg, 0)),
            *dparam_specs,
        ),
        interpret=_interpret(),
    )(xp, gp, *params_flat)
    dx = outs[0][:p]
    dparams = tuple(outs[1:])
    return dx, dparams


fused_mlp.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)


def fused_apply_mlp(params: dict, x, config, compute_dtype=jnp.bfloat16,
                    block_rows: int = DEFAULT_BLOCK_ROWS):
    """Drop-in for fields.mlp.apply_mlp (ReLU hidden, optional sigmoid out)
    backed by the fused Pallas kernel. x: [..., Din]."""
    batch_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    flat = []
    for i in range(config.num_layers):
        flat.append(params[f"w{i}"])
        flat.append(params[f"b{i}"])
    out = fused_mlp(
        x2, tuple(flat), config.num_layers, jnp.dtype(compute_dtype).name,
        block_rows,
    )
    out = out.reshape(*batch_shape, config.out_dim)
    if config.out_activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    return out
