"""pixelnerf_tpu — a TPU-native reimplementation of pixelNeRF (Yu et al., CVPR 2021).

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch implementation (sxyu/pixel-nerf), re-designed TPU-first:

- functional core: ``encode()`` returns an explicit :class:`SceneEncoding`
  PyTree instead of mutating module buffers (reference: src/model/models.py:89)
- static shapes + ``lax.scan`` chunking instead of Python-loop chunking
  (reference: src/render/nerf.py:195-216)
- ray-dimension sharding over a ``jax.sharding.Mesh`` instead of
  ``torch.nn.DataParallel(dim=1)`` (reference: src/render/nerf.py:370)
- Pallas kernels for the pixel-aligned bilinear gather (the reference's
  ``F.grid_sample``; src/model/encoder.py:102)
"""

__version__ = "0.1.0"
