"""Relational operators re-expressing the reference's semantics Spark-first.

Each module maps to a SURVEY.md §2 family:
  checks     — comparison mini-DSL -> Column (P9), check rows, alerts (A5/A6)
  enrich     — regex/CSV match enrichment + fallback + excludes (P1/P3/P4/P5)
  windows    — latest-per-key, change detection, top-k (W1/W2/W4, J4)
  period     — previous-period enrichment join (J1)
  dedup      — exact + MinHash/LSH + SimHash + n-gram Jaccard (beyond-reference)
  similarity — embedding cosine top-k, LSH-bucketed ANN (beyond-reference)
  textstats  — language ID, quality score, token counts, fingerprint
  idempotent — left-anti idempotent append (P12/A1 exactly-once analog)
"""
