from .sumcheck_fold import scan_sumcheck_batched_pallas  # noqa: F401
