"""lsdm_tpu — a TPU-native scene-synthesis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of andvg3/LSDM
("Language-driven Scene Synthesis using Multi-conditional Diffusion Model",
NeurIPS 2023): a multi-conditional DDPM that, given a human motion point
cloud, existing scene objects, and a text prompt, generates the point cloud
(1024x3) and category distribution of a new object, plus the downstream
object-fitting / scene-assembly / evaluation stack and the ATISS / MIME /
ContactFormer baseline families.

Design principles (TPU-first, not a port):
  * All diffusion math is pure functions over a precomputed coefficient
    table; samplers are single jit'd ``lax.scan``s (1000 steps on device),
    not Python loops.
  * Static shapes everywhere: <=9 objects x 1024 points x 3, padded and
    masked exactly like the reference data contract.
  * bf16-friendly flax modules; Pallas kernels for the hot point-cloud ops.
  * Scaling via ``jax.sharding.Mesh`` + NamedSharding (data/model axes),
    with XLA collectives — no host-driven communication.
"""

__version__ = "0.1.0"

from lsdm_tpu import config  # noqa: F401
