"""Scale-path operators beyond the reference surface (SURVEY.md §7.2 step 8):
deduplication, similarity search, text analysis, multimodal plumbing.

Everything here is a reusable DataFrame→DataFrame transformation designed for
the 100 TB case: shuffle keys are explicit, candidate generation is always
bounded (LSH bands / stop-shingle caps / bucketing) before any pairwise work,
and the hot paths are built-in Spark expressions, not Python UDFs.
"""
