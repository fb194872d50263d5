"""TPU compute kernels: XLA-decomposed and Pallas implementations of the hot
ops (distance matrix, fused gather+score, sharded table updates)."""

from besskge_tpu.ops.distance import p_distance_matrix  # noqa: F401
