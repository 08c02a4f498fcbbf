from harp_tpu.parallel.sharding import (
    make_mesh,
    shard_frames,
    replicate,
    frame_sharding,
)
from harp_tpu.parallel.halo import neighbor_shift
