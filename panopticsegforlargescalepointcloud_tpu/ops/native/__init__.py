from .native import (  # noqa: F401
    available,
    voxel_sample_last,
    Grid2D,
    knn1,
)
