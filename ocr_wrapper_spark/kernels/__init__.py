"""Pure numpy/pandas kernels.

These are the single source of truth for per-document semantics: the same
functions run inside Arrow-batched Spark UDFs (operators/) and directly on
pandas in the test suite, so DataFrame output == kernel output by
construction (SURVEY.md §5 test plan).
"""
