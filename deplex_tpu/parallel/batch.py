"""Frame-batched and device-sharded plane extraction.

The reference has no batch dimension at all (one serial process() per frame,
examples/process_sequence.cpp:31-43). On TPU, frames are embarrassingly
parallel, so throughput comes from:

  * vmap over a frame batch within one chip (amortizes the sequential
    region-growing rounds: the while_loop trip count becomes the max over
    the batch while every per-round op stays tiny), and
  * sharding the batch axis over a jax.sharding.Mesh for multi-chip /
    multi-host scale-out — no collectives are needed on the extraction path,
    so scaling rides data placement alone (ICI/DCN only move inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deplex_tpu.config import Config
from deplex_tpu.pipeline import extract_planes


@functools.partial(jax.jit, static_argnames=("image_height", "image_width", "config"))
def extract_planes_batch_jit(points, *, image_height: int, image_width: int, config: Config):
    """points: (B, H*W, 3) -> (B, H*W) int32 labels."""
    fn = functools.partial(extract_planes, image_height=image_height,
                           image_width=image_width, config=config)
    return jax.vmap(fn)(points)


class BatchPlaneExtractor:
    """Single-chip batched extractor: process B frames per dispatch."""

    def __init__(self, image_height: int, image_width: int,
                 config: Config | None = None):
        self._height = int(image_height)
        self._width = int(image_width)
        self._config = config if config is not None else Config()

    def process(self, pcd_batch) -> np.ndarray:
        pts = jnp.asarray(pcd_batch, dtype=jnp.float32)
        if pts.ndim != 3 or pts.shape[2] != 3 or pts.shape[1] != self._height * self._width:
            raise ValueError(
                f"Expected (B, {self._height * self._width}, 3) batch, got {pts.shape}")
        labels = extract_planes_batch_jit(pts, image_height=self._height,
                                          image_width=self._width, config=self._config)
        return np.asarray(labels)


class ShardedPlaneExtractor:
    """Multi-device extractor: batch axis sharded over a 1-D device mesh.

    mesh: a jax.sharding.Mesh with a 'data' axis (defaults to all local
    devices). The batch size must be divisible by the mesh size.
    """

    def __init__(self, image_height: int, image_width: int,
                 config: Config | None = None, mesh: Mesh | None = None):
        self._height = int(image_height)
        self._width = int(image_width)
        self._config = config if config is not None else Config()
        if mesh is None:
            devices = np.array(jax.devices())
            mesh = Mesh(devices, axis_names=("data",))
        self._mesh = mesh
        self._sharding = NamedSharding(mesh, P("data", None, None))

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    def process(self, pcd_batch) -> np.ndarray:
        pts = jnp.asarray(pcd_batch, dtype=jnp.float32)
        ndev = self._mesh.size
        if pts.shape[0] % ndev != 0:
            raise ValueError(f"Batch {pts.shape[0]} not divisible by mesh size {ndev}")
        pts = jax.device_put(pts, self._sharding)
        labels = extract_planes_batch_jit(pts, image_height=self._height,
                                          image_width=self._width, config=self._config)
        return np.asarray(labels)
