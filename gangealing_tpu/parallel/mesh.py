"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's NCCL data-parallel runtime.

Capability reference: utils/distributed.py:6-162. The mapping:
  setup_distributed()    -> make_mesh() (1-D 'data' axis over all chips)
  DDP gradient all-reduce -> automatic: params replicated, batch sharded,
                             XLA inserts psums over ICI in the jitted step
  all_gather / all_gatherv / all_reduce / rank0_to_all / reduce_loss_dict
                         -> process_allgather or plain jnp ops inside jit
                            (single-controller: every "rank" sees the result)
  DistributedSampler     -> shard_batch: lay a host batch out over the mesh
  primary()              -> jax.process_index() == 0

On a single controller (one host, N chips) collectives never need explicit
calls: jit + shardings compile to ICI collectives. The helpers below also
carry the multi-host (DCN) layouts — shard_batch assembles global arrays
from per-process shards and all_gather_hosts crosses processes — but note
the reference itself is single-node (torchrun, one machine) and our
multi-host paths are exercised only on a single-process virtual mesh in CI,
not on real multi-host DCN hardware.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 1, axis_name: str = "data"):
    """Shard the leading axis over the mesh; replicate the rest."""
    spec = [axis_name] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def _spans_other_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices this process cannot address
    (a true multi-host mesh, vs. a local per-process eval mesh)."""
    if jax.process_count() == 1:
        return False
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a batch pytree onto the mesh, leading axis sharded. Equivalent
    of DistributedSampler's rank striding — but layout is contiguous blocks
    per device.

    Mesh of addressable devices: ``batch`` is the global batch (device_put
    lays it out). Mesh spanning other processes: ``batch`` is this
    process's LOCAL shard — the global array is assembled from all
    processes' shards without any cross-host transfer
    (jax.make_array_from_process_local_data)."""
    multi = _spans_other_processes(mesh)

    def put(x):
        sh = data_sharding(mesh, np.ndim(x), axis_name)
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a (host-identical) pytree over the whole mesh. Mesh
    spanning other processes: every process must pass the same values; the
    global replicated array is assembled from each process's local copy
    without cross-host transfer (the mesh spans non-addressable devices,
    so device_put alone would fail there)."""
    sh = replicated_sharding(mesh)
    if _spans_other_processes(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def all_gather_hosts(x):
    """Gather a per-host array across processes (multi-host DCN path);
    identity on a single controller. Replaces utils/distributed.py:87-122."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)


def auto_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Optional[Mesh]:
    """Mesh for data-parallel inference, or None when it would be trivial.

    The TPU equivalent of the reference's implicit torchrun world: every
    eval app shards its batches over all local chips by default
    (applications/congeal_dataset.py:32, flow_scores.py:40-41,
    mixed_reality.py:28-33, pck.py:172-174 all rank-stride). Pass
    ``num_devices`` to cap the mesh; 1 disables sharding entirely.

    Under a multi-process runtime the mesh covers only THIS process's
    local devices: eval apps follow the reference's per-rank design (each
    process strides the dataset and computes its stripe independently,
    then reduces with all_gather_hosts), rather than lock-stepping one
    global batch across hosts."""
    devices = jax.local_devices() if jax.process_count() > 1 \
        else jax.devices()
    n = len(devices) if num_devices is None else num_devices
    if n <= 1:
        return None
    return make_mesh(n, axis_name, devices=devices)


def mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(mesh.devices.size)


def round_up_batch(batch: int, mesh: Optional[Mesh]) -> int:
    """Smallest batch >= ``batch`` divisible by the mesh (sharded arrays
    need equal per-device shards; apps pad the tail and mask)."""
    d = mesh_size(mesh)
    return (batch + d - 1) // d * d


def pad_batch(x, pad_to):
    """Pad a (N, ...) batch up to ``pad_to`` rows by repeating the last row
    (the eval apps' tail-padding idiom: padded outputs are sliced back to
    the real row count, so the filler only has to be shape-compatible)."""
    n = x.shape[0]
    if n >= pad_to:
        return x
    reps = jnp.repeat(x[-1:], pad_to - n, axis=0)
    return jnp.concatenate([x, reps], axis=0)


def pad_to_multiple(x, multiple, axis=0):
    """Pad the leading axis so it divides the mesh (the reference's
    all_gatherv padding idiom, distributed.py:103-122). Returns (padded, n)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_width), n
