from .scalar import (  # noqa: F401
    guarded_ratio, epoch_seconds, incident_id, iso_to_timestamp,
)
from .hashing import md5_long, affine_hashes, HASH_PRIME  # noqa: F401
from .percentile import exact_percentile_disc  # noqa: F401
