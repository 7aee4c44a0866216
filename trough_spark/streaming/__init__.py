"""Structured Streaming extensions (SURVEY.md §2.B18, §7.6).

The reference has NO streaming surface — its closest artifact is chunked HTTP
result transfer (reference: trough/read.py:30-52).  These modules are the
additive extension the north star asks for: event-stream processing with
watermarks, tumbling/sliding/session windows, and foreachBatch upserts into
segment tables.
"""
