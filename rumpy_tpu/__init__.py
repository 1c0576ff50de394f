"""rumpy_tpu — a TPU-native blind single-image super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of um-dsrg/RUMpy
(reference layout surveyed in SURVEY.md): degradation-pipeline data
generation (blur / noise / compression) as fused on-device kernels, a SISR
model zoo (SRCNN → EDSR/RCAN/HAN/ELAN + GANs), degradation predictors
(DAN-style iterative estimators, MoCo-family contrastive encoders), and
meta-attention injection of degradation metadata into any SR network.

Design principles (TPU-first, not a port):
  * NHWC layouts, static shapes, bfloat16 compute / float32 params.
  * All hot paths jitted; degradations run on-device inside the input step.
  * Data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` collectives
    (the reference used single-host ``nn.DataParallel``; see SURVEY.md §2.1).
  * Functional train state pytrees (params / opt state / RNG / queues).
"""

__version__ = "0.1.0"
