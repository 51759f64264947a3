"""On-device clustering: radius neighbors, region growing, mean-shift, NMS."""

from .neighbors import radius_neighbors  # noqa: F401
from .region_grow import region_grow, region_grow_folded  # noqa: F401
from .meanshift import mean_shift  # noqa: F401
