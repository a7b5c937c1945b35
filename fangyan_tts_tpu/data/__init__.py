"""Data plane: Kaldi-format corpus IO, audio loading/resampling, the
processor pipeline, parquet packing, and training-sequence plan builders."""
