"""Frame-parallel ORB extraction over a device mesh.

The reference extracts features for one frame at a time on two CPU threads
(src/ORBextractor.cc via Frame::ExtractORB, src/Frame.cc:513). On TPU the
extractor is a fixed-shape jit program, so a batch of frames maps onto the
mesh as pure data parallelism: shard the [B, H, W] image batch across
devices, vmap the production extractor inside shard_map, and every chip
extracts its shard concurrently with zero communication. This is the bulk
path for offline mapping / dataset ingestion and multi-camera rigs, where
frames are independent and throughput (not single-frame latency) matters.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import extractor

FRAME_AXIS = "frames"


def make_batch_extractor(mesh: Mesh, cfg: extractor.OrbConfig,
                         axis: str = FRAME_AXIS):
    """Returns a jitted fn: imgs [B, H, W] float32 -> FrameFeatures with a
    leading batch axis, B sharded over `axis` (B must be a multiple of the
    axis size; pad with a repeated frame and drop the tail otherwise)."""

    def body(imgs):
        return jax.vmap(lambda im: extractor.extract(im, cfg))(imgs)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False)
    return jax.jit(sharded)
