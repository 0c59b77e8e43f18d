from hetmogp_tpu.ops import kernels, linalg, quadrature

__all__ = ["kernels", "linalg", "quadrature"]
