from .hash_encoding import (  # noqa: F401
    HashGridSpec,
    hash_encode,
    init_hash_table,
)
from .sh_encoding import sh_encode_deg4  # noqa: F401
from .ngp_mt import NGPMT  # noqa: F401
from .occupancy import OccupancyGrid  # noqa: F401
