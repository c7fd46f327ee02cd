"""webfilter — a PySpark-native web-scale quality-filter engine.

A from-scratch re-imagining of the reference pipeline
(balbarka/biomed_genai, /root/reference) as a language-ID +
quality-filter + PII/toxicity-scrub job over Iceberg-style tables of
Common-Crawl-like web pages.

Architecture (SURVEY.md §7): everything is pyspark.sql DataFrame +
vectorized pandas/Arrow UDFs — no per-row Python UDFs anywhere
(the reference's row UDFs, e.g. pmc.py:74-117, are deliberately NOT
reproduced; its one vectorized pandas_udf, _setup/utils.py:61-63, is
the idiom template for every Python-touching stage here).
"""

__version__ = "0.1.0"
