"""Auxiliary subsystems: tracing/profiling, NaN debugging (SURVEY.md §5)."""
from istvt_tpu.utils.profiling import StepTimer, trace  # noqa: F401
from istvt_tpu.utils.debug import assert_finite, debug_nans  # noqa: F401
