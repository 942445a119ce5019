"""Structured Streaming operators over the events table (SURVEY.md §2.10).

The reference has no streaming at all; its closest analog is the Spanner
batch-read-only snapshot scan (REF/data/DataCopier.java:87-106).  This
package adds the Structured Streaming surface: watermarked tumbling /
sliding / session windows, streaming dedup, and a custom stateful
operator via applyInPandasWithState — each with a batch-equivalent used
for oracle checks (streaming result ≡ batch result on the same input).
"""
