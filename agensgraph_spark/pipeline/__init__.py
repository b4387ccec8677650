"""Large-scale training-data pipeline operators (engine extensions).

Not reference-parity items (the reference has no document/embedding
operators) — these are the LLM-data-pipeline operations the engine
adds on top, built DataFrame-first so they scale: exact + near
deduplication, similarity search, text analysis, multimodal column
plumbing.
"""
