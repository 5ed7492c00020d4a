"""Spark shell: UDFs, extraction job, resume/checkpointing, metrics, corpus."""
