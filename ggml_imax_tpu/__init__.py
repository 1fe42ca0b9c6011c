"""ggml_imax_tpu — a TPU-native quantized-inference framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of ggml
(reference: NAIST-Archlab/ggml-imax). See SURVEY.md for the design map.
"""

__version__ = "0.1.0"
