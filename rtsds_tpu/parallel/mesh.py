"""Device mesh + sharding: the TPU-native replacement for the reference's
entire distributed stack (a single ``nn.DataParallel`` wrap,
``utils.py:97-107``).

Design (SURVEY.md §2.3/§5.8): a 1-D ``jax.sharding.Mesh`` over all chips
with a ``data`` axis; batches are sharded over ``data``, params/optimizer
state are replicated.  Train steps are ordinary ``jax.jit`` programs --
XLA's sharding propagation inserts the gradient all-reduce (psum over ICI)
and cross-replica BatchNorm reductions automatically, overlapping them with
the backward pass.  Multi-host extends the same mesh via
``jax.distributed.initialize`` (DCN between slices); nothing in the step
function changes.

Note on BatchNorm: because batch stats are computed under the global batch
sharding, BN is effectively *synchronized* across devices (the reference's
DataParallel keeps per-replica stats and never syncs them -- sync-BN is the
strictly better behavior, documented as a deliberate deviation).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data",
              batch_size: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices.

    When ``batch_size`` is given, the mesh is trimmed to the largest device
    count that divides it (a global batch must shard evenly; for full
    scale-out set batch_size to a multiple of the chip count).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n < len(devices):
            if jax.process_count() > 1:
                # trimming devices in a multi-process job can leave a
                # process with ZERO addressable shards of the global batch
                # (make_array_from_process_local_data then fails with an
                # opaque "Process addresses 0 elements") -- fail clearly
                raise ValueError(
                    f"multihost: global batch {batch_size} must divide by "
                    f"the total device count {len(devices)}; trimming to "
                    f"{n} device(s) would idle entire processes")
            import warnings

            warnings.warn(
                f"make_mesh: global batch {batch_size} is not divisible by "
                f"{len(devices)} devices; using only {n} device(s) and "
                f"idling {len(devices) - n}. Set the batch size to a "
                f"multiple of the chip count for full utilization.",
                stacklevel=2)
        devices = devices[:n]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the HEIGHT dimension of NHWC images across the mesh.

    The vision analog of sequence/context parallelism (SURVEY.md §5.7):
    one giant image is split into horizontal bands, one per chip; XLA's
    SPMD partitioner inserts the halo exchanges convolutions need at band
    boundaries and the all-reduces for global pooling.  Use for inputs too
    large for one chip's HBM (e.g. >4K panoramas) -- batch parallelism is
    more efficient whenever the batch is large enough to shard instead.
    """
    return NamedSharding(mesh, P(None, axis_name))


def shard_spatial(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put NHWC arrays with height-banded sharding."""
    sharding = spatial_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put a (possibly nested) batch with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt state/batch stats) over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        state)


def make_mesh_2d(shape: tuple[int, ...], axis_names=("data", "spatial"),
                 devices=None) -> Mesh:
    """General named N-D mesh (e.g. data x spatial, data x model, or
    data x spatial x model).

    Combines parallelism strategies in one jit program: shard the batch
    over ``data`` and, simultaneously, image height over ``spatial``
    (:func:`dp_spatial_sharding`) and/or parameters over ``model``
    (:func:`fsdp_shard_state`).  XLA's SPMD partitioner composes the
    collectives (gradient psum over data, conv halo exchange over spatial,
    param all-gather / grad reduce-scatter over model) automatically.
    """
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, axis_names=tuple(axis_names))


def dp_spatial_sharding(mesh: Mesh, data_axis: str = "data",
                        spatial_axis: str = "spatial") -> NamedSharding:
    """Batch over ``data`` AND image height over ``spatial`` at once.

    The vision composition of DP + sequence/context parallelism
    (SURVEY.md §5.7): each device holds a horizontal band of a slice of
    the batch.  Works for NHWC images and NHW label maps alike (both have
    batch leading, height second).  Use when per-device batch would
    otherwise be < 1 image, or when single images exceed HBM.
    """
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def fsdp_shard_state(state, mesh: Mesh, axis: str = "model",
                     min_size: int = 2 ** 15):
    """Fully-sharded data parallelism: parameters (and their mirrored
    optimizer moments) sharded over the ``axis`` of the mesh instead of
    replicated.

    Each large array is split on its trailing (output-channel) dimension
    when that divides the axis size, else on its largest divisible
    dimension; small arrays (< ``min_size`` elements -- biases, BN
    vectors) stay replicated.  Inside the jitted train step XLA
    all-gathers each kernel just before use and reduce-scatters its
    gradient, so peak parameter memory per chip drops by the axis size --
    the TPU-native answer to models larger than one chip's HBM.  Batch
    inputs should be sharded over the remaining (data) axis; numerics are
    identical to replicated execution (unit-tested).
    """
    axis_size = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def choose(x):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return x
        if x.ndim == 0 or x.size < min_size:
            return jax.device_put(x, repl)
        dims = list(range(x.ndim))
        # prefer the trailing dim (HWIO out-channels), then the largest
        for d in sorted(dims, key=lambda d: (d != x.ndim - 1, -x.shape[d])):
            if x.shape[d] % axis_size == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(choose, state)


def make_mesh_from_config(spec: dict, devices=None,
                          batch_size: int | None = None) -> Mesh:
    """Build the job mesh from the config.yaml ``mesh:`` section.

    ``spec`` keys (all optional): ``data`` (-1 = fill with the remaining
    devices), ``spatial`` (height-band parallelism), ``model`` (FSDP
    parameter sharding), ``pipe`` (GPipe pipeline over DeepLab's layer3,
    ``train/pipelined.py``; -1 = all devices; exclusive with the other
    axes -- inputs are replicated and the schedule owns the devices;
    single-process only).  A pure-data spec keeps
    :func:`make_mesh`'s batch-divisibility trimming; composed specs
    require the device count to divide exactly.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    d = int(spec.get("data", -1))
    s = int(spec.get("spatial", 1))
    m = int(spec.get("model", 1))
    p = int(spec.get("pipe", 1))
    if p in (-1, 0):  # same convention as data: fill with all devices
        p = len(devices)
        if p == 1:
            # pipe: -1 on a single-device box silently becomes a plain
            # data mesh -- warn loudly, because pipe_microbatches is then
            # ignored and the numerics (full-batch BN vs per-microbatch
            # BN) differ from the multi-device run this config describes;
            # accumulate_steps reproduces the microbatched semantics
            import warnings

            warnings.warn(
                f"mesh spec {spec}: pipe resolved to a single device, so "
                f"the job runs as a plain data mesh and pipe_microbatches "
                f"is ignored; use training.*.accumulate_steps to "
                f"reproduce per-microbatch numerics on one device",
                stacklevel=2)
    elif p < -1:
        raise ValueError(f"mesh spec {spec}: pipe must be a positive "
                         f"stage count or -1 (all devices)")
    if p > 1:
        # pipeline stages compute BN statistics per microbatch; a data or
        # spatial axis inside the schedule would silently turn sync-BN
        # into per-shard BN, so composition is rejected rather than wrong
        if s > 1 or m > 1 or d not in (-1, 0, 1):
            raise ValueError(
                f"mesh spec {spec}: pipe does not compose with data/"
                f"spatial/model axes (BN statistics would become "
                f"per-shard); use mesh: {{pipe: {p}}} alone")
        if jax.process_count() > 1:
            raise ValueError(
                "mesh: {pipe: N} is single-process only: the schedule "
                "replicates inputs, which is incompatible with "
                "per-process sharded loading (--multihost)")
        if len(devices) < p:
            raise ValueError(
                f"mesh spec {spec} needs {p} devices, have {len(devices)}")
        if p < len(devices):
            import warnings

            warnings.warn(
                f"mesh spec {spec} uses {p} of {len(devices)} devices; "
                f"{len(devices) - p} chip(s) will idle.", stacklevel=2)
        return Mesh(np.asarray(devices[:p]), axis_names=("pipe",))
    if s <= 1 and m <= 1:
        return make_mesh(devices if d in (-1, 0) else devices[:d],
                         batch_size=batch_size)
    if d in (-1, 0):
        d = len(devices) // (s * m)
        if d == 0:
            raise ValueError(
                f"mesh spec {spec} needs at least {s * m} devices, "
                f"have {len(devices)}")
    if d * s * m < len(devices):
        import warnings

        warnings.warn(
            f"mesh spec {spec} uses {d * s * m} of {len(devices)} devices; "
            f"{len(devices) - d * s * m} chip(s) will idle. Adjust the "
            f"spec (or use data: -1) for full utilization.", stacklevel=2)
    if batch_size is not None and batch_size % d != 0:
        raise ValueError(
            f"global batch {batch_size} does not divide over the {d}-wide "
            f"data axis of mesh spec {spec}; set the batch size to a "
            f"multiple of {d} or shrink the data axis")
    shape, axes = [d], ["data"]
    if s > 1:
        shape.append(s)
        axes.append("spatial")
    if m > 1:
        shape.append(m)
        axes.append("model")
    return make_mesh_2d(tuple(shape), axis_names=tuple(axes),
                        devices=devices)


def input_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for input batches on any job mesh: batch over ``data``,
    plus height bands over ``spatial`` when the mesh has that axis (the
    ``model`` axis never shards inputs -- it shards parameters).  A
    ``pipe`` mesh replicates inputs: the GPipe schedule splits the batch
    into microbatches itself."""
    if "pipe" in mesh.axis_names:
        return NamedSharding(mesh, P())
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def place_state(state, mesh: Mesh):
    """Place a TrainState on the job mesh: FSDP-sharded over ``model``
    when that axis exists, replicated otherwise."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return fsdp_shard_state(state, mesh, axis="model")
    return shard_state(state, mesh)


def make_hybrid_mesh(n_slices: int, devices=None,
                     axis_names=("dcn", "ici")) -> Mesh:
    """2-D mesh for multi-slice jobs: slices on the outer (DCN) axis,
    per-slice chips on the inner (ICI) axis (SURVEY §5.8).

    Data parallelism shards the batch over BOTH axes
    (``hybrid_batch_sharding``); XLA then reduces gradients hierarchically
    -- fast all-reduce within a slice over ICI, one cross-slice hop over
    DCN -- instead of treating all chips as one flat ring.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if len(devices) % n_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices")
    per_slice = len(devices) // n_slices
    grid = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(grid, axis_names=axis_names)


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch dimension over every mesh axis (DCN x ICI)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Multi-slice / multi-host entry (``jax.distributed.initialize``).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass them explicitly or export
    ``RTSDS_COORDINATOR_ADDRESS`` / ``RTSDS_NUM_PROCESSES`` /
    ``RTSDS_PROCESS_ID`` (e.g. one ``python main.py --multihost`` per node
    on a plain cluster).  After this, ``jax.devices()`` spans the full job
    and :func:`make_mesh` lays the data axis across ICI + DCN.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("RTSDS_COORDINATOR_ADDRESS")
    if num_processes is None and "RTSDS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["RTSDS_NUM_PROCESSES"])
    if process_id is None and "RTSDS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["RTSDS_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
