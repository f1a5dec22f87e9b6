"""simvg_tpu: a TPU-native (JAX/XLA/Pallas) visual-grounding framework.

Re-designed from scratch with the capabilities of SimVG (NeurIPS 2024,
arXiv 2409.17531; reference implementation Dmmm1997/SimVG): a BEiT-3
multiway multimodal encoder with a DETR-style decoder branch and a
lightweight token branch trained with dynamic weight-balance distillation,
for referring-expression comprehension (RefCOCO/+/g, ReferIt, Flickr30k,
GRefCOCO).

Everything on the compute path is pure JAX (jit/pjit over a
`jax.sharding.Mesh`); the input pipeline runs on host.
"""

__version__ = "0.1.0"
