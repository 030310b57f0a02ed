"""Dataset sources: Parquet readers and the deterministic pages synth."""
