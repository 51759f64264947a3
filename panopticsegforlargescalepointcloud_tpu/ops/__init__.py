"""Sparse voxel core ops: coordinate hashing, sparse grids, kernel maps, convs."""

from .hashing import (  # noqa: F401
    BitLayout,
    DEFAULT_BITS,
    INVALID_KEY,
    pack_coords,
    unpack_coords,
    lookup,
)
from .sparse import (  # noqa: F401
    SparseGrid,
    make_grid,
    same_level_map,
    downsample,
    down_map,
    down_map_fine_side,
    up_map,
    up_map_from_down,
    KERNEL_OFFSETS_K3,
)
from .scatter import segment_sum, segment_mean, segment_max, segment_min  # noqa: F401
from .conv import sparse_conv  # noqa: F401
from .points import (  # noqa: F401
    ball_query,
    farthest_point_sample,
    knn,
    knn_interpolate,
    pairwise_dist2,
)
