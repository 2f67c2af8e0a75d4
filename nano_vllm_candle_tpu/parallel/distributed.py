"""Multi-host runtime: process-group init and hybrid ICI×DCN meshes.

The reference has **no** distributed communication backend at all — no
NCCL/MPI/Gloo dependency (``/root/reference/Cargo.toml:15-33``), no process
group; its "TP" is env-var config (``/root/reference/src/tp.rs:21-31``) plus
load-time weight slicing (SURVEY.md §5.8). The TPU-native backend is JAX's
own multi-controller runtime:

- ``initialize()`` wraps ``jax.distributed.initialize`` — one Python
  process per host, all launched with the same coordinator address; after
  init, ``jax.devices()`` spans the whole slice and every jitted collective
  rides ICI within a host/slice and DCN across.
- ``make_hybrid_mesh()`` builds a ``(dp, tp)`` mesh where tp maps onto the
  ICI-connected devices of each slice (fast axis: the per-matmul psum /
  all-gathers of tensor parallelism) and dp spans slices over DCN (slow
  axis: no per-layer traffic — each DP replica schedules its own request
  slots, so DCN carries nothing in steady state). This is the standard
  "shard within a slice, replicate across slices" recipe.

SPMD control-plane determinism (SURVEY.md §5.2, hard part #3): every host
runs the same scheduler over the same request stream, so every host computes
identical slot assignments and issues identical jitted step calls. The
engine enforces this by seeding sampling from the shared EngineConfig seed
and keeping scheduling pure-functional over (waiting, running) state — no
wall-clock or per-host randomness anywhere in the control plane
(engine/scheduler.py). Multi-host failure = job failure, matching the
reference's posture (SURVEY.md §5.3); there is no elastic recovery.

Single-process testing: ``initialize()`` is a no-op when num_processes == 1,
and ``make_hybrid_mesh`` degrades to ``mesh.make_mesh`` over local devices —
the virtual 8-device CPU fixture (tests/conftest.py) exercises the same code
paths the real multi-host launch takes.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

_initialized = False

#: XLA flags that make multi-chip collectives overlap with compute (the
#: mechanism behind BASELINE config 5's >=85% 2-host scaling target,
#: SURVEY.md §5.8). ``async_collective_fusion`` lets XLA split a collective
#: into start/done pairs and fuse compute between them;
#: ``latency_hiding_scheduler`` reorders the HLO schedule so the row-parallel
#: psums of tensor parallelism run under the next layer's matmuls. No-ops on
#: single-device TPU programs (no collectives to schedule), but FATAL on the
#: CPU backend — its flag parser aborts on unknown ``--xla_tpu_*`` names —
#: so callers must gate on the target device (cli.py/bench.py do).
COLLECTIVE_OVERLAP_XLA_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
    "--xla_tpu_overlap_compute_collective_tc=true",
    "--xla_enable_async_all_gather=true",
    "--xla_enable_async_collective_permute=true",
    "--xla_tpu_enable_latency_hiding_scheduler=true",
)


def apply_collective_overlap_flags() -> None:
    """Append the collective/compute-overlap flags to ``XLA_FLAGS``.

    Must run BEFORE the first backend use (XLA reads the env at
    initialization). Idempotent; flags already present are not duplicated.
    ``EngineConfig.collective_overlap`` gates this from the engine builders;
    ``bench.py``/``cli.py`` call it ahead of any multi-chip run so the
    2-host measurement (BASELINE config 5) is one command when hardware
    exists.
    """
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    # Match on the flag NAME: a user who explicitly set e.g.
    # `--xla_tpu_enable_latency_hiding_scheduler=false` must not have it
    # silently re-enabled by an appended (last-wins) `=true` duplicate.
    missing = [
        f for f in COLLECTIVE_OVERLAP_XLA_FLAGS
        if f.split("=", 1)[0] not in flags
    ]
    if missing:
        os.environ["XLA_FLAGS"] = (flags + " " + " ".join(missing)).strip()
        logger.info("collective-overlap XLA flags applied: %s", missing)
        try:  # XLA reads the env once, at backend init — warn if too late
            from jax._src import xla_bridge

            if getattr(xla_bridge, "_backends", None):
                logger.warning(
                    "collective-overlap XLA flags were set AFTER the JAX "
                    "backend initialized; they will NOT take effect in this "
                    "process. Apply them before the first device use (the "
                    "bench/CLI entry points do) or export XLA_FLAGS."
                )
        except Exception:  # pragma: no cover - private-API probe
            pass


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host process group (idempotent).

    With no arguments, JAX auto-detects the environment (TPU pods export
    their topology via metadata; GKE/JobSet set the env vars). Explicit
    arguments mirror ``jax.distributed.initialize`` for manual launches:

        # host 0                           # host 1
        initialize("10.0.0.1:9999", 2, 0)  initialize("10.0.0.1:9999", 2, 1)

    No-op for single-process runs so library code can call it
    unconditionally.
    """
    global _initialized
    if _initialized:
        return
    if num_processes in (None, 1) and coordinator_address is None:
        # Single process: nothing to coordinate.
        logger.debug("distributed.initialize: single process, skipping")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    logger.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def make_hybrid_mesh(
    tp: int,
    dp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """``(dp, tp)`` mesh with tp on the fast (ICI) axis, dp across hosts.

    Uses ``mesh_utils.create_hybrid_device_mesh`` when the device set spans
    multiple processes/slices (it orders devices so the tp axis never
    crosses DCN when ``tp <= devices_per_slice``); falls back to a plain
    local mesh otherwise.
    """
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devices = list(devices)[:n]
    num_slices = len({getattr(d, "process_index", 0) for d in devices})
    if num_slices > 1 and dp % num_slices == 0:
        from jax.experimental import mesh_utils

        per_slice = n // num_slices
        if tp > per_slice:
            raise ValueError(
                f"tp={tp} exceeds the {per_slice} ICI-connected devices per "
                "slice; a tp group crossing DCN pays per-layer latency"
            )
        try:
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(dp // num_slices, tp),
                dcn_mesh_shape=(num_slices, 1),
                devices=devices,
            )
            return Mesh(arr, axis_names=("dp", "tp"))
        except ValueError as e:
            # Devices without slice metadata (e.g. multi-process CPU, where
            # every virtual device reports slice 0). jax.devices() orders by
            # process, so a plain (dp, tp) reshape already keeps each tp
            # group within one process — the property the hybrid mesh
            # utility would have enforced.
            logger.debug("hybrid mesh fallback (%s); using process-ordered reshape", e)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
