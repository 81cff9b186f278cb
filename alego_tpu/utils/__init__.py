"""Host-side utilities: synthetic data, metrics, IO, profiling, checkpointing."""
