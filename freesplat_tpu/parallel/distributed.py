"""Multi-chip / multi-host training setup (SPMD data parallelism).

The TPU-native replacement for the reference's Lightning DDP strategy
(``/root/reference/src/main.py:96-110``, ``devices="auto"``): one
``jax.sharding.Mesh`` over every addressable device, the global batch
sharded along its leading axis, parameters/optimizer state replicated,
and XLA's partitioner inserting the gradient ``psum`` over ICI.

Multi-host: ``maybe_initialize_distributed`` wires ``jax.distributed``
from standard cluster env vars (JAX auto-detects GKE/GCE metadata; the
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID variables force it
elsewhere).  Single-process runs skip initialization entirely.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np


# Only coordinator-style variables imply a multi-process launch; things
# like TPU_WORKER_HOSTNAMES also appear on single-host TPU VMs and must
# not trigger initialization.
_DIST_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "NUM_PROCESSES",
    "JAX_NUM_PROCESSES",
)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when running under a multi-host
    launcher; no-op (returns False) for single-process runs.

    Controlled by env: set FREESPLAT_DISTRIBUTED=1 to force, =0 to forbid;
    otherwise auto-detect from the usual coordinator variables.
    """
    global _initialized
    if _initialized:
        return True
    force = os.environ.get("FREESPLAT_DISTRIBUTED")
    if force == "0":
        return False
    detected = any(os.environ.get(k) for k in _DIST_ENV_VARS)
    if force != "1" and not detected:
        return False
    import jax

    # JAX's own auto-detection only understands SLURM/OMPI/GKE/mpi4py
    # launchers; the generic coordinator variables must be passed
    # explicitly.
    kwargs: dict = {}
    addr = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("NUM_PROCESSES") or os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    pid = os.environ.get("PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    elif any((addr, nproc, pid)):
        # A PARTIAL coordinator spec must fail loudly: falling through to
        # auto-detect (which doesn't understand these generic vars) would
        # leave N processes training independently on identical seeds —
        # the worst failure mode, silent and plausible-looking.
        missing = [
            name
            for name, val in (
                ("COORDINATOR_ADDRESS", addr),
                ("NUM_PROCESSES", nproc),
                ("PROCESS_ID", pid),
            )
            if val is None
        ]
        raise RuntimeError(
            f"incomplete multi-host launch spec: missing {missing} "
            "(set all of COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID, "
            "or none to use SLURM/OMPI/GKE auto-detection)"
        )

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if kwargs or force == "1":
            raise  # an explicit multi-host launch must not degrade
        # Auto-detected-but-unavailable (e.g. backend already touched) —
        # continue single-process.
        print(f"warning: jax.distributed.initialize skipped: {e}", flush=True)
        return False
    _initialized = True
    return True


def process_rank() -> tuple[int, int]:
    """(process_index, process_count), robust to jax being unimportable
    or uninitialized (host-side data code calls this)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def make_mesh(num_devices: int | str = "auto"):
    """1-D ``("data",)`` mesh over the first ``num_devices`` devices.

    ``"auto"`` uses every addressable device.  A mesh of size 1 compiles
    to exactly the single-chip program (no collectives), so the mesh path
    is the only code path — there is no separate single-device trainer.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if num_devices != "auto":
        devices = devices[: int(num_devices)]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh) -> Any:
    """NamedSharding pytree-prefix: shard the leading (batch) dim."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh) -> Any:
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_batch(mesh, batch: Any) -> Any:
    """Put a host batch on the mesh with its leading axis split over
    ``data``.

    Single-process: a plain sharded ``device_put``.  Multi-process (DCN):
    each process passes its LOCAL shard of the global batch (global batch
    = local batch x process count along dim 0) and the pieces are
    assembled into one global array — ``device_put`` cannot address other
    hosts' devices."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    multi = jax.process_count() > 1

    def put(x):
        if multi:
            return jax.make_array_from_process_local_data(
                NamedSharding(
                    mesh, P("data", *([None] * (np.ndim(x) - 1)))
                ),
                np.asarray(x),
            )
        sharding = NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x  # already resident with the right layout (e.g. a
            # cached synthetic batch) — never round-trip through host
            # numpy, which blocks on a device fetch every step.
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def make_view_sharded_encode(encoder, mesh, axis: str = "data"):
    """Whole-scene view parallelism (SURVEY §2.5: "shard views across
    chips for backbone/cost-volume; PTF is the serialization point").

    Returns ``encode(variables, context) -> results`` jitted with the
    context's VIEW axis (dim 1) sharded over ``mesh[axis]`` and
    parameters replicated.  XLA's partitioner runs the per-view trunk
    (backbone, matching, sweep, depth decoder) on each device's view
    shard and inserts the all-gathers where cross-view data is needed
    (nearest-k source features, PTF fusion).  The view count must divide
    the mesh axis size; use ``pad_views`` otherwise.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    view_sharded = NamedSharding(mesh, P(None, axis))
    replicated = NamedSharding(mesh, P())

    def encode(variables, context):
        return encoder.apply(variables, context)

    # Every standard context array is (b, v, ...) — the view-sharded spec
    # applies as a pytree prefix to the whole dict.
    return jax.jit(encode, in_shardings=(replicated, view_sharded))


def pad_views(context: dict, multiple: int) -> tuple[dict, int]:
    """Pad the view axis (dim 1) up to a multiple by repeating the last
    view; returns (padded context, original view count).  Extra views
    only add duplicate Gaussians (PTF merges them; slots stay valid) —
    callers slice per-view outputs back to ``v`` where it matters."""
    v = context["image"].shape[1]
    pad = (-v) % multiple
    if pad == 0:
        return context, v

    import jax.numpy as jnp

    def pad_arr(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if getattr(x, "ndim", 0) >= 2 and x.shape[1] == v:
            reps = [x[:, -1:]] * pad
            return jnp.concatenate([jnp.asarray(x), *reps], axis=1)
        return x

    return {k: pad_arr(x) for k, x in context.items()}, v


def replicate_state(mesh, state: Any) -> Any:
    """Replicate the train state over the mesh (every process must hold
    identical values — true for same-seed init or a restored checkpoint)."""
    import jax

    rep = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)
            ),
            state,
        )
    return jax.device_put(state, jax.tree_util.tree_map(lambda _: rep, state))
