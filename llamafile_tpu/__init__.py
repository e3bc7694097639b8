"""llamafile_tpu — a TPU-native quantized-inference framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of ludoplex/llamafile:
GGUF weight loading into sharded device arrays, fused dequant-GEMM Pallas kernels,
jit'd model runtimes (Llama family, MoE, multimodal), slot-based prefix-caching
serving with continuous batching, and benchmark/quality tooling.
"""
__version__ = "0.1.0"
