from .stats import matrix_stats, roofline_report, spmv_bytes  # noqa: F401
