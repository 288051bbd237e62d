"""deplex-tpu: a TPU-native plane-extraction framework.

A from-scratch JAX/XLA/Pallas implementation of organized-point-cloud plane
segmentation (the Proenca-Gao CAPE pipeline) with the same capabilities and
Python API surface as the reference deplex library
(/root/reference/README.md:12-19), redesigned for TPU:

  * all per-cell work (validity gates, PCA plane fits, 3x3 eigensolves)
    runs batched over the whole cell grid on the VPU/MXU,
  * region growing is data-parallel label propagation inside lax.while_loop
    instead of serial BFS flood fill,
  * frames batch via vmap on one chip and shard across device meshes with
    jax.sharding for multi-chip / multi-host scale-out.

Public API:
    >>> from deplex_tpu import PlaneExtractor, Config
    >>> from deplex_tpu.utils import DepthImage
    >>> image = DepthImage("depth.png")
    >>> extractor = PlaneExtractor(image.height, image.width, config=Config())
    >>> labels = extractor.process(image.transform_to_pcd(K))
"""

from deplex_tpu.config import Config
from deplex_tpu.extractor import PlaneExtractor

__version__ = "0.1.0"

__all__ = ["Config", "PlaneExtractor", "__version__"]
