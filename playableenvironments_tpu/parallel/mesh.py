"""Mesh construction and sharding for data-parallel training.

The reference's scaling story is single-process nn.DataParallel over local
GPUs (train.py:61; SURVEY.md §2.i). The TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis; batches are sharded over it, parameters
replicated, and XLA inserts the gradient psum over ICI — no explicit
collectives in user code. Models here are small (MBs), so pure DP is the
right layout; the ray axis within each example is already device-local.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """A 1D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(
    batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS, leading_axes: int = 0
) -> Any:
    """Place a host batch pytree on the mesh, batch axis sharded.

    :param leading_axes: number of unsharded axes BEFORE the batch axis
        (e.g. 1 for a (steps, batch, ...) stacked block of batches).

    Multi-host (DCN): each process holds ITS slice of the global batch
    (dataset.iterate_batches(process_index=...)); the slices assemble into
    one global array per leaf without any cross-host copy."""
    if leading_axes:
        spec = PartitionSpec(*([None] * leading_axes + [axis_name]))
        sharding = NamedSharding(mesh, spec)
    else:
        sharding = batch_sharding(mesh, axis_name)

    if jax.process_count() > 1:
        def place(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
    else:
        def place(x):
            return jax.device_put(x, sharding)

    return jax.tree.map(place, batch)


def maybe_initialize_distributed():
    """`jax.distributed.initialize()` when a multi-host launch is configured
    (COORDINATOR_ADDRESS/JAX coordination env vars or PE_MULTIHOST=1 on TPU
    pods, where jax auto-discovers peers). No-op otherwise — single-process
    runs must not wait on a coordination service."""
    import os

    def _truthy(value):
        # PE_MULTIHOST=0 must mean OFF: raw string truthiness would treat
        # "0"/"false" as configured and block on a coordination service.
        return bool(value) and value.strip().lower() not in ("0", "false", "no")

    configured = (
        _truthy(os.environ.get("PE_MULTIHOST"))
        or _truthy(os.environ.get("COORDINATOR_ADDRESS"))
        or _truthy(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    )
    if not configured:
        return False
    import jax

    jax.distributed.initialize()
    warmup_collectives()
    return True


def warmup_collectives():
    """Run one tiny cross-process collective immediately after
    `jax.distributed.initialize`, while all processes are still aligned from
    the coordinator barrier. The first collective of the job creates the
    backend communicator context under a fixed rendezvous deadline (30 s for
    CPU Gloo); deferring it to the first train step lets per-process compile
    skew blow that deadline. No-op single-process."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pe:collective_warmup")


def compile_barrier(jitted, *example_args, tag: str = "pe:step_compiled"):
    """AOT-compile a jitted train step on every process, then barrier, and
    return the compiled executable to dispatch.

    `warmup_collectives` covers the communicator the warmup collective
    itself uses, but a train step's psum can create a DIFFERENT backend
    context (keyed by device set and local-participant layout), and that
    creation runs under the same fixed rendezvous deadline (30 s for CPU
    Gloo). Dispatching a freshly-jitted step lets per-process compile skew
    — a compilation-cache hit on one host and a miss on another, or a
    shared-CPU CI box serializing both compiles — blow the deadline at the
    FIRST step (observed: Gloo `GetKeyValue() timed out` on the 2-process
    x 4-device layout). Compiling ahead of time and syncing afterwards puts
    every process within milliseconds of the first dispatch.

    Single-process: returns `jitted` unchanged (keeps normal jit dispatch).
    The example args are only traced/lowered, never executed, so donation
    declared on `jitted` takes effect on the returned executable's calls,
    and all later calls must match the example shapes (training batches are
    fixed-shape by construction here).
    """
    import jax

    if jax.process_count() <= 1:
        return jitted
    compiled = jitted.lower(*example_args).compile()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
    return compiled


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, train state) on every device.

    Multi-process: every process holds an identical copy (same-seed init or
    same checkpoint read), so the global array assembles from process-local
    buffers with ZERO collectives. `jax.device_put` would instead run a
    cross-host `assert_equal` allgather PER LEAF — thousands of DCN
    collectives on a pod, and the first one establishes the Gloo/ICI context,
    deadlining (30 s) when processes reach it skewed by compile time.

    That zero-collective assembly trusts the "identical copy" premise; a
    divergence (seed plumbing bug, divergent restore, a leaf derived from the
    process-local batch) would silently train with inconsistent parameters.
    `PE_VERIFY_REPLICATION=1` buys the check back for ONE collective total
    (not per leaf): a crc32 fingerprint of every leaf's bytes, allgathered
    and compared across processes."""
    import os

    sharding = replicated(mesh)
    if jax.process_count() > 1:
        if os.environ.get("PE_VERIFY_REPLICATION", "").strip() in (
            "1", "true", "yes",
        ):
            verify_replication(tree)

        def place(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )
    else:
        def place(x):
            return jax.device_put(x, sharding)

    return jax.tree.map(place, tree)


def verify_replication(tree: Any) -> None:
    """Assert every process holds bytewise-identical leaves, with exactly one
    cross-process collective (a 1-scalar allgather of a combined crc32)."""
    import zlib

    from jax.experimental import multihost_utils

    fingerprint = 0
    for index, leaf in enumerate(jax.tree.leaves(tree)):
        data = np.ascontiguousarray(np.asarray(leaf))
        # Mix the leaf index in so swapped leaves can't cancel.
        fingerprint = zlib.crc32(
            data.tobytes(), fingerprint ^ (index * 0x9E3779B1 & 0xFFFFFFFF)
        )
    gathered = multihost_utils.process_allgather(
        np.asarray(fingerprint, dtype=np.uint32)
    )
    if not (gathered == gathered[0]).all():
        raise ValueError(
            "replicate(): state differs across processes — per-process "
            f"fingerprints {gathered.tolist()} (PE_VERIFY_REPLICATION)"
        )


RAYS_AXIS = "rays"


def create_2d_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = 0,
    data_axis: str = DATA_AXIS,
    rays_axis: str = RAYS_AXIS,
) -> Mesh:
    """A (data, rays) mesh: batch sharded over `data`, the per-example ray
    axis sharded over `rays` (rays are embarrassingly parallel until the
    per-ray integral, which stays device-local — SURVEY.md §2.i SP row).

    :param data: data-axis size (0 = all devices on data, rays size 1).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data <= 0:
        data = n
    if n % data:
        raise ValueError(f"{n} devices not divisible by data={data}")
    return Mesh(devices.reshape(data, n // data), (data_axis, rays_axis))


def constrain_ray_axis(
    x: jax.Array,
    ray_axis: int,
    data_axis_name: str = DATA_AXIS,
    rays_axis_name: str = RAYS_AXIS,
) -> jax.Array:
    """Apply an SP-style sharding constraint: leading axis on the data mesh
    axis, `ray_axis` on the rays mesh axis. No-op unless the ambient mesh
    (jax.set_mesh) carries a rays axis — single-mesh DP runs are untouched.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if rays_axis_name not in mesh.axis_names:
        return x
    ray_axis = ray_axis % x.ndim
    if ray_axis == 0:
        raise ValueError(
            "constrain_ray_axis: ray_axis resolves to axis 0, which is the "
            "data (batch) axis — constraining it to the rays mesh axis "
            "would silently shard the batch over rays"
        )
    spec = [None] * x.ndim
    if data_axis_name in mesh.axis_names:
        spec[0] = data_axis_name
    spec[ray_axis] = rays_axis_name
    return jax.lax.with_sharding_constraint(x, PartitionSpec(*spec))
