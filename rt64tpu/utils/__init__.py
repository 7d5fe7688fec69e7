"""Host utilities: asset IO, profiling, logging."""
