"""Device mesh and sharding utilities — the framework's distributed runtime.

The reference has no distributed layer at all (SURVEY.md §2.9: single GPU,
vestigial DataParallel prefixes only).  Here scaling is first-class and
TPU-native: a ``jax.sharding.Mesh`` over all chips with a ``data`` axis,
batches sharded along it, parameters replicated, and the gradient all-reduce
emitted by XLA as an ICI ``psum`` when the jitted train step is annotated
with these shardings.  No NCCL/MPI translation — the JAX runtime owns
collectives.

For very large frames a spatial ``space`` axis can shard H with halo
exchange via ``shard_map`` (documented, not required for Sintel/KITTI —
SURVEY.md §2.9 "sequence parallel" row).
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "resolve_data_parallel",
           "batch_sharding", "replicated", "shard_batch",
           "replicate", "distributed_init", "barrier", "local_batch_size"]


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None, **kwargs) -> tuple:
    """Initialize the multi-host runtime (one JAX process per host).

    On TPU pods every argument auto-detects from the pod metadata; on
    CPU/GPU pass ``coordinator`` ("host:port" of process 0),
    ``num_processes`` and this host's ``process_id``.  Must run before the
    backend initializes (i.e. before any device is touched).  After this,
    ``jax.devices()`` is the GLOBAL device list, ``make_mesh()`` spans all
    hosts, and the data-parallel ``psum`` rides ICI within a slice and DCN
    across slices — the multi-slice story SURVEY.md §5 calls for (the
    reference has no distributed layer at all).

    Extra ``**kwargs`` pass through to ``jax.distributed.initialize``
    (e.g. ``shutdown_timeout_seconds`` when rank exit times can skew).
    Returns ``(process_index, process_count)``.
    """
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def barrier(name: str = "oftpu_barrier", timeout_s: int = 1800) -> None:
    """Block until every process reaches this point.

    Rides the coordination service (gRPC to process 0), NOT a device
    collective — so it works before any program has compiled.  Useful to
    de-skew ranks whose first-collective rendezvous has a short timeout
    (XLA's Gloo CPU context init allows 30 s; a compile finishing minutes
    apart across hosts would blow it).  No-op in single-process mode.
    """
    from jax._src import distributed as _distributed  # no public barrier API
    client = _distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_s * 1000)


def _from_process_local(tree, sharding):
    """Assemble global arrays from per-process host data.

    ``jax.device_put`` only reaches addressable devices; under a multi-host
    mesh each process contributes its local slice (or its replica, for a
    fully-replicated sharding) and XLA stitches the global array."""
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)), tree)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def resolve_data_parallel(spec: str) -> Optional[Mesh]:
    """Parse a CLI ``--data-parallel N|all`` spec into a mesh (or ``None``).

    ``"1"`` (the default) returns ``None`` — plain single-device dispatch
    with no sharding machinery.  ``"all"`` always builds a mesh over every
    visible device (even one: useful to drive the sharded code path on a
    single chip).  ``N > len(jax.devices())`` raises instead of silently
    truncating — a truncated mesh would make every later sharded dispatch
    fail inside jit with a much less legible error.  ``N < 1`` and
    non-integer specs also raise (``--data-parallel 0`` is a typo, not a
    request for single-device dispatch).
    """
    if spec == "all":
        ndev = len(jax.devices())
    else:
        try:
            ndev = int(spec)
        except ValueError:
            raise ValueError(
                f"--data-parallel expects an integer or 'all', got {spec!r}")
        if ndev < 1:
            raise ValueError(
                f"--data-parallel must be >= 1 (or 'all'), got {spec!r}")
    if ndev <= 1 and spec != "all":
        return None
    if ndev > len(jax.devices()):
        raise ValueError(
            f"--data-parallel {ndev} exceeds the {len(jax.devices())} "
            f"visible devices; pass 'all' to use every device")
    return make_mesh(jax.devices()[:ndev])


def check_eval_cli_mesh_args(mesh: Optional[Mesh], dispatch_chunk,
                             batch: int) -> None:
    """Shared fail-fast validation for the eval CLIs' mesh-adjacent flags
    (before any checkpoint load).  One site for the invariants that
    ``FlowEngine.__init__`` / ``flow_from_batch`` would otherwise surface
    later as tracebacks: ``--dispatch-chunk`` is single-chip-only, and the
    eval batch must divide over the mesh."""
    if mesh is None:
        return
    if dispatch_chunk is not None:
        raise SystemExit(
            "--dispatch-chunk is a single-chip scheduling lever; it is "
            "mutually exclusive with --data-parallel (the mesh shards each "
            "batch instead)")
    if batch % mesh.shape["data"]:
        raise SystemExit(
            f"--batch {batch} must be divisible by the data-parallel "
            f"width {mesh.shape['data']} (each evaluation batch is sharded "
            f"over the mesh)")


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch on the mesh with its leading dim sharded.

    Single-process: a plain ``device_put``.  Multi-process (after
    :func:`distributed_init`): ``batch`` is this process's LOCAL portion —
    ``global_batch = local_batch * process_count`` — assembled into global
    arrays without any cross-host host-side traffic."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return _from_process_local(batch, sh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


_EQ_TAGS = itertools.count()


def _assert_equal_across_processes(fingerprint: str) -> None:
    """Raise on every process if ``fingerprint`` differs from process 0's.

    Rides the coordination service (generous timeout), NOT a device
    collective: ``jax.device_put`` onto a multi-process sharding performs
    the same check via a Gloo allgather whose 30 s context-init window is
    routinely blown by checkpoint-load/compile skew between ranks — the
    reason :func:`replicate` assembles process-local data instead.  Every
    process must call this the same number of times (tags are a counter)."""
    from jax._src import distributed as _distributed
    client = _distributed.global_state.client
    if client is None:
        return
    tag = next(_EQ_TAGS)
    client.key_value_set(f"oftpu_eq/{tag}/{jax.process_index()}", fingerprint)
    ref = client.blocking_key_value_get(f"oftpu_eq/{tag}/0", 1800_000)
    if ref != fingerprint:
        raise ValueError(
            f"process {jax.process_index()} holds different replicated "
            f"values than process 0 (fingerprint {fingerprint[:12]} vs "
            f"{ref[:12]}) — e.g. a stale or mismatched checkpoint on this "
            f"host; every process must load identical params")


def replicate(tree, mesh: Mesh):
    """Place a host pytree fully replicated on the mesh (params, opt state);
    process-aware like :func:`shard_batch` (every process passes the same
    values).  Leaves that are already global (non-fully-addressable) jax
    Arrays pass through untouched — their shards span devices this process
    cannot read, and they were necessarily placed by an equivalent
    cross-process assembly already.  Multi-process placement verifies the
    host data is identical across processes (loudly, via the coordination
    service) before assembling — divergent checkpoints would otherwise
    silently serve mixed-weight garbage."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        import hashlib
        digest = hashlib.sha256()
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                continue
            a = np.asarray(leaf)
            digest.update(str(path).encode())
            digest.update(str(a.shape).encode() + str(a.dtype).encode())
            digest.update(a.tobytes())
        _assert_equal_across_processes(digest.hexdigest())
        return jax.tree.map(
            lambda a: a if (isinstance(a, jax.Array)
                            and not a.is_fully_addressable)
            else jax.make_array_from_process_local_data(sh, np.asarray(a)),
            tree)
    return jax.device_put(tree, sh)


def local_batch_size(global_batch: int, mesh: Mesh,
                     axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis "
            f"{axis_name!r} of size {n}")
    return global_batch // n
