from .encoding import get_enc_len, int2anybase, int2multihot, multihot_table, position_table
from .scatter import (
    gather_nodes,
    scatter_max_edges,
    scatter_sum_edges,
    scatter_sum_flat,
    segment_softmax_edges,
)
from .spectral import (
    compute_norm_np,
    degrees_np,
    edge_norm_device,
    largest_eigenvalue_bounds_np,
)
