"""nnc_tpu: TPU-native NeRF model compression (LSA-enhanced NNCodec rebuild).

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference `vanilla-nerf-model-compression-using-lsa-enhanced-nncodec`
pipeline: NNR (ISO/IEC 15938-17 style) neural-network compression with
uniform/dependent quantization, DeepCABAC-style entropy coding (native C++),
and Local Scaling Adaptation (LSA) fine-tuned by differentiable NeRF volume
rendering on TPU.

Public API (mirrors the reference `nnc` package):
    compress_model, compress, decompress, decompress_model
"""
__version__ = "0.1.0"

from .compression import (compress, compress_model, decompress,
                          decompress_model, guess_block_id_and_param_type)
