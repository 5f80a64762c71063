"""Deprecated CompressedLinear stub (API parity with the reference).

The reference demoted `CompressedLinear` to a raising stub
(ref linear/compressed_linear.py:15-21) because run-compressed inference
moved out of the library (into vLLM). In this framework run-compressed
execution is the default engine path: use
`compressed_tensors_tpu.ops.linear.QuantizedTensor` + `quantized_matmul`
(fused Pallas dequant+matmul kernels) instead.
"""

from compressed_tensors_tpu.linear.compressed_linear import CompressedLinear

__all__ = ["CompressedLinear"]
