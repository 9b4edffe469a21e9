from gangealing_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated_sharding, shard_batch,
    all_gather_hosts, replicate, pad_to_multiple, auto_mesh, mesh_size,
    round_up_batch, pad_batch, shard_global_batch, process_stripe,
    gather_process_stripes, host_barrier, all_gatherv_hosts)
