"""Distribution layer — device meshes, video-set sharding, metric reduction."""

from vdetlib_tpu.dist.sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    psum_metrics,
    shard_videos,
)
