"""bioie_llm_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, DataFrame-first engine with the query and data-processing
capabilities of the reference (boxorange/BioIE-LLM, read-only at
/root/reference): batched mock-LLM triple extraction over an Iceberg-style
corpus table (repo, path, commit, lang, content), gazetteer entity linking
via broadcast hash join, canonicalization (normalized name + Jaccard +
connected components), and a (subj, pred, obj) triple table partitioned by
predicate — plus the scoring semantics (sort_and_pad, mention matcher,
choice extractor, micro/macro F1) the reference uses to grade results.

Everything is built on public PySpark 4.x APIs; no reference code is copied.
"""

__version__ = "0.1.0"
