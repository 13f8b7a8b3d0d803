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
import numpy as np
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


def make_batch_preparer(mesh: Mesh, cam, cfg: extractor.OrbConfig,
                        axis: str = FRAME_AXIS):
    """Like make_batch_extractor but produces full PreparedFrames (ORB +
    undistortion + normalized coords) — the per-frame input of the tracker.
    Backs System.track_monocular_batch: extraction (the dominant per-frame
    device cost) fans out over the mesh while the inherently sequential
    state machine consumes the prepared frames in order."""
    from ..pipeline import kernels

    def body(imgs):
        return jax.vmap(lambda im: kernels.prepare_frame(im, cam, cfg))(imgs)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False)
    return jax.jit(sharded)


_PREPARER_CACHE: dict = {}


def prepare_frames(mesh: Mesh, cam, cfg: extractor.OrbConfig,
                   imgs, block_multiple: int = 2):
    """Batch-prepare frames over the mesh; returns a list of per-frame
    PreparedFrames. Processes in fixed-size blocks of
    `block_multiple * mesh size` frames (last block padded with repeats):
    the block shape is constant, so exactly ONE program compiles regardless
    of sequence length, and host/device memory stays bounded — a whole
    EuRoC sequence as one [3600, H, W] upload would OOM HBM and recompile
    per distinct length."""
    import jax.numpy as jnp
    key = (mesh, cam, cfg)
    fn = _PREPARER_CACHE.get(key)
    if fn is None:   # a fresh closure per call would re-jit every time
        fn = _PREPARER_CACHE[key] = make_batch_preparer(mesh, cam, cfg)
    n = len(imgs)
    block = block_multiple * mesh.devices.size
    out = []
    for s in range(0, n, block):
        chunk = np.asarray(imgs[s:s + block], np.float32)
        pad = block - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)])
        batched = fn(jnp.asarray(chunk))
        out.extend(jax.tree.map(lambda a: a[i], batched)
                   for i in range(min(block, n - s)))
    return out
