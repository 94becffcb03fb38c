"""Device mesh + sharding helpers — the framework's scaling layer.

The reference has NO distributed capability (SURVEY.md §2.4: no
torch.distributed/NCCL anywhere; one process, one GPU). Scaling here is a
first-class new design: a 1-D ``data`` mesh for the VisCoIN workload (vision
CNN/GAN, batch is the natural scaling axis), expressed with
``jax.sharding.Mesh`` + NamedSharding so XLA GSPMD lays the gradient
all-reduce on ICI. The mesh generalizes to 2-D ("data", "model") for future
spatially-sharded synthesis (GSPMD expresses it without custom code).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data", specs=None):
    """Place host arrays onto the mesh, sharded along their leading dim.

    ``specs``: optional per-array :class:`PartitionSpec` overrides (e.g. the
    spatial ``P("data", "model", None, None)`` for images on a 2-D mesh —
    jit refuses to reshard committed arrays, so the loop must place them
    with the step's exact input sharding)."""
    if specs is None:
        specs = (P(axis),) * len(arrays)
    out = tuple(jax.device_put(a, NamedSharding(mesh, s))
                for a, s in zip(arrays, specs, strict=True))
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh.

    Multi-host: built via ``make_array_from_callback`` — NO collectives.
    ``jax.device_put`` to a multi-host replicated sharding runs a collective
    equality assertion PER LEAF (multihost_utils.assert_equal), i.e. hundreds
    of startup micro-collectives, each of whose lazy gloo-context creation
    carries a ~30 s rendezvous deadline; compile-time skew between ranks
    blows that deadline (observed in the 2-process CPU test). Every caller
    passes identical values on all hosts by construction (same seeds, same
    checkpoint), which is exactly the callback path's contract."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the leading dim up to a multiple (for uneven final batches);
    returns (padded, real_count)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[:1], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n


def make_mesh_2d(data: int, model: int, axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """A 2-D (data, model) mesh. The ``model`` axis spatially shards image /
    feature-map heights (SURVEY.md §2.4: the sequence-parallel analogue for
    this vision workload); GSPMD inserts the conv halo exchanges."""
    devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {data}x{model} mesh, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data, model), axes)


def image_sharding(mesh: Mesh, batch_axis: str = "data",
                   spatial_axis: str = "model") -> NamedSharding:
    """NHWC images sharded over (batch, H): pass as jit in/out_shardings to
    spatially shard a synthesis/classifier forward over the model axis."""
    return NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))


def image_spec(mesh: Mesh) -> P:
    """The NHWC image PartitionSpec for this mesh: (batch, H) over
    (data, model) on a 2-D mesh, batch-only on a 1-D mesh. Single source for
    every site that places image batches — the loop's placement must match
    the jitted step's in_shardings exactly (jit refuses to reshard committed
    arrays)."""
    if "model" in mesh.axis_names:
        return P("data", "model", None, None)
    return P("data")


def global_shard_batch(mesh: Mesh, *arrays, axis: str = "data", specs=None):
    """Multi-host form of :func:`shard_batch`: each process passes its LOCAL
    slice of the global batch (loaded with ``DataLoader(shard=(process_index,
    process_count))``), and the returned ``jax.Array``s are globally sharded
    along the mesh's batch axis with global shape ``(local_n *
    process_count, ...)``.

    On a single process this is exactly ``shard_batch`` (and is tested as
    such); on a multi-host mesh it uses
    ``jax.make_array_from_process_local_data``, the single-controller JAX
    idiom for per-host input pipelines — no host ever materializes the full
    global batch.

    ``specs``: per-array :class:`PartitionSpec` overrides, as in
    :func:`shard_batch`. Multi-host: each process still passes its full
    local batch rows; ``make_array_from_process_local_data`` slices the
    non-process dims (e.g. a spatially-sharded H axis) per device."""
    if jax.process_count() == 1:
        return shard_batch(mesh, *arrays, axis=axis, specs=specs)
    if specs is None:
        specs = (P(axis),) * len(arrays)
    out = tuple(
        jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(a),
            (a.shape[0] * jax.process_count(),) + tuple(a.shape[1:]))
        for a, s in zip(arrays, specs, strict=True)
    )
    return out if len(out) > 1 else out[0]


def tpu_compiler_options() -> dict | None:
    """Measured-good server-side XLA compile options for the VisCoIN train
    step on v5e (BASELINE.md: scoped VMEM 64 MB cut the step 306 -> 292 ms by
    giving the fusion/tiling passes more on-chip headroom). Returns None off
    TPU — other backends reject xla_tpu_* options. Client-side XLA_FLAGS
    cannot set these through a remote-attached (relay) compiler; per-jit
    ``compiler_options`` ride the compile request instead."""
    if jax.devices()[0].platform != "tpu":
        return None
    return {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_aggressive_broadcast_priority_update": "true",
    }
