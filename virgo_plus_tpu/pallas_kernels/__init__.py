from .field_kernels import fold_bind_pallas  # noqa: F401
