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


def shard_global_batch(mesh: Mesh, batch, axis: int = 0,
                       axis_name: str = "data"):
    """Place a GLOBAL batch (identical on every process) onto the mesh,
    sharded along ``axis``. On a single controller this is a plain
    device_put; when the mesh spans processes, each process's contiguous
    block along ``axis`` is sliced out automatically and the global array
    assembled from the per-process blocks (the layout shard_batch expects
    — a 1-D mesh over jax.devices() lists process 0's chips first, so
    process p owns rows [p*n/P, (p+1)*n/P)).

    This is the drop-in for the train loops, where every process draws the
    same global latent batch from a shared PRNG key (the reference seeds
    ranks identically then DistributedSampler-slices, train.py:255-259)."""
    multi = _spans_other_processes(mesh)
    n_proc, pid = jax.process_count(), jax.process_index()

    def put(x):
        spec = [None] * np.ndim(x)
        spec[axis] = axis_name
        sh = NamedSharding(mesh, P(*spec))
        if multi:
            n = x.shape[axis]
            if n % n_proc:
                raise ValueError(
                    f"global batch axis {axis} ({n}) must be divisible "
                    f"by the process count ({n_proc})")
            b = n // n_proc
            idx = [slice(None)] * np.ndim(x)
            idx[axis] = slice(pid * b, (pid + 1) * b)
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x)[tuple(idx)])
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


def process_stripe(n: int):
    """This process's stride of ``n`` items: indices [p, p+P, p+2P, ...] —
    the reference's DistributedSampler / torch.arange(rank, N, world) rank
    striding (congeal_dataset.py:32, mixed_reality.py:28-33). Identity
    (range(n)) on a single process."""
    return list(range(jax.process_index(), n, jax.process_count()))


_STRIPE_MAXD = 8  # max trailing dims carried in the stripe descriptor


def gather_process_stripes(x, n_total: int):
    """Inverse of process_stripe for per-item results: gather each
    process's stripe outputs and de-interleave back to global item order —
    the reference's all_gather(...).permute(1, 0).reshape(-1)[:N] reduction
    (utils/distributed.py:87-122 via flow_scores.py:39-42). ``x`` is this
    process's (len(stripe), ...) results; stripes are padded to equal
    length by repeating the last row (padding lands past ``n_total`` after
    de-interleaving, so it is trimmed). Identity on a single process.

    A process with an EMPTY stripe (n_total < process count) may pass any
    empty array — e.g. ``np.zeros((0,))`` — without knowing the item
    shape/dtype: a descriptor gather first reconciles empty inputs to the
    non-empty processes' trailing shape and dtype, so callers never
    hand-build shape-compatible placeholders."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return np.asarray(x)[:n_total]
    x = np.asarray(x)
    # descriptor: [n_local, ndim, tail shape (MAXD), dtype.str as bytes]
    if x.ndim - 1 > _STRIPE_MAXD:
        raise ValueError(f"items with >{_STRIPE_MAXD} dims not supported")
    d = np.zeros(2 + _STRIPE_MAXD + 8, np.int64)
    d[0], d[1] = x.shape[0], x.ndim
    d[2:2 + x.ndim - 1] = x.shape[1:]
    code = np.frombuffer(x.dtype.str.encode().ljust(8), np.uint8)
    d[2 + _STRIPE_MAXD:] = code
    g_d = np.asarray(all_gather_hosts(d))  # (P, D)
    ref = next((g_d[p] for p in range(n_proc) if g_d[p][0] > 0), None)
    if x.shape[0] == 0 and ref is not None:
        ndim = int(ref[1])
        tail = tuple(int(v) for v in ref[2:2 + ndim - 1])
        dtype = np.dtype(bytes(ref[2 + _STRIPE_MAXD:].astype(np.uint8))
                         .decode().strip())
        x = np.zeros((0,) + tail, dtype)
    m = (n_total + n_proc - 1) // n_proc
    if x.shape[0] < m:  # short stripe (n_total % n_proc != 0): pad
        reps = np.repeat(x[-1:] if x.shape[0] else
                         np.zeros((1,) + x.shape[1:], x.dtype),
                         m - x.shape[0], axis=0)
        x = np.concatenate([x, reps], axis=0)
    g = np.asarray(all_gather_hosts(x))  # (P, m, ...)
    out = g.transpose(1, 0, *range(2, g.ndim)).reshape(
        (n_proc * m,) + g.shape[2:])
    return out[:n_total]


def all_gather_hosts(x):
    """Gather a per-host array across processes (multi-host DCN path);
    identity on a single controller. Replaces utils/distributed.py:87-122."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)


def all_gatherv_hosts(x):
    """Variable-length cross-process gather: concatenate per-process 1-D
    arrays of DIFFERENT lengths in process order (the reference's
    all_gatherv, utils/distributed.py:103-122: gather lengths, pad to the
    max, gather, trim). Identity on a single controller."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    lens = np.asarray(all_gather_hosts(
        np.asarray([x.shape[0]], np.int64))).reshape(-1)
    m = int(lens.max())
    padded = np.zeros((m,) + x.shape[1:], x.dtype)
    padded[:x.shape[0]] = x
    g = np.asarray(all_gather_hosts(padded))  # (P, m, ...)
    return np.concatenate([g[p, :lens[p]] for p in range(g.shape[0])], 0)


def host_barrier(name: str = "barrier"):
    """Block until every process reaches this point (the reference's
    synchronize(), utils/distributed.py:40-49) — e.g. before the primary
    process assembles outputs other processes wrote to a shared
    filesystem. No-op on a single controller."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


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
