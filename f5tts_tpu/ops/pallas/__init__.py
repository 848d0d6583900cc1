"""Pallas TPU kernels for the hot ops (SURVEY §2.2 kernel targets):
flash attention (non-causal, key-padding masked), fused AdaLN modulation,
ConvNeXt depthwise+GRN. Kernels run compiled on TPU and in interpreter mode on
CPU (so the same code path is unit-testable on the CPU mesh)."""
