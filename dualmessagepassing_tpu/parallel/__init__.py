from .dp import batch_sharding, make_dp_mesh, replicate, replicated, shard_batch
from .edge_partition import (
    init_edge_parallel_params,
    make_edge_parallel_dmp_apply,
    pad_to_multiple,
    shard_flat_edges,
)
from .halo import (
    build_halo_partition,
    make_halo_dmp_apply,
    shard_halo_arrays,
    unshard_nodes,
)
