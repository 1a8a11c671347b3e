"""Unified CLI dispatcher: python -m fruitnerf_tpu <command> ...

Commands mirror the reference's console scripts (pyproject.toml:24-32):
  train         ns-train fruit_nerf / _big / _huge
  multi-scene   batched multi-orchard counting campaign (one XLA program)
  export        ns-export-semantics semantic-pointcloud
  count         clustering/run_clustering.py (+ --sweep)
  process-data  ns-process-fruit-data fruit (mask ingestion)
  render        offline eval-camera render (debug/render.py analog)
  eval          ns-eval analog: averaged full-eval-set metrics
  orchard-e2e   reference-scale synthetic validation (train->export->count)
  suggest-crop  crop-box discovery (offline analog of the viewer workflow)
  viewer        interactive orbit viewer + crop-box picker (debug/viewer.py)
"""
from __future__ import annotations

import argparse
import sys

from .scripts import count as count_cmd
from .scripts import multi_scene_campaign as campaign_cmd
from .scripts import orchard_e2e as orchard_cmd
from .scripts import suggest_crop as crop_cmd
from .scripts import evaluate as eval_cmd
from .scripts import export as export_cmd
from .scripts import process_data as process_cmd
from .scripts import render as render_cmd
from .scripts import speed_probe as speed_cmd
from .scripts import train as train_cmd
from .viewer import server as viewer_cmd

COMMANDS = {
    "train": train_cmd,
    "export": export_cmd,
    "count": count_cmd,
    "process-data": process_cmd,
    "render": render_cmd,
    "eval": eval_cmd,
    "orchard-e2e": orchard_cmd,
    "multi-scene": campaign_cmd,
    "suggest-crop": crop_cmd,
    "speed-probe": speed_cmd,
    "viewer": viewer_cmd,
}


def _pin_cpu_devices(n: int) -> None:
    """Pin an n-virtual-device CPU backend BEFORE any JAX backend touch.

    Shell-level JAX_PLATFORMS=cpu does not survive this container's
    sitecustomize (it registers a remote-TPU PJRT plugin); backend selection
    is lazy, so an in-process config update works — the same technique as
    tests/conftest.py and __graft_entry__.dryrun_multichip."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="fruitnerf_tpu")
    parser.add_argument(
        "--cpu-mesh", type=int, default=None, metavar="N",
        help="run on a virtual N-device CPU mesh instead of the TPU "
             "(multi-scene campaigns / sharding checks without chips)",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name, mod in COMMANDS.items():
        p = sub.add_parser(name, help=(mod.__doc__ or "").strip().splitlines()[0])
        mod.add_args(p)
    args = parser.parse_args(argv)
    if args.cpu_mesh:
        _pin_cpu_devices(args.cpu_mesh)
    from .utils.jitcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    COMMANDS[args.command].main(args)


if __name__ == "__main__":
    main(sys.argv[1:])
