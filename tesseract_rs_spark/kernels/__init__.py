"""Pure-Python/numpy extraction kernels — no Spark imports here.

Spark is a distribution shell around these kernels (SURVEY.md §7.2): the
semantic core must be unit-testable and byte-deterministic on its own.
"""
