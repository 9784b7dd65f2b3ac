"""racformer_tpu: a TPU-native (JAX/XLA/Pallas) radar-camera fusion 3D detection framework.

A from-scratch reimplementation of the capability surface of RaCFormer
(CVPR 2025, arXiv 2412.12725; reference repo nogueira04/RaCFormer), designed
for TPU hardware: NHWC layouts, static shapes with masking, weight-shared
decoder expressed as `lax.scan`, gather-based sampling ops lowered to XLA /
Pallas, and GSPMD data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
