"""biomedical_ner_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
the reference app (ourahma/biomedical-ner, surveyed in SURVEY.md): mention
detection (tokenize -> BIO tag -> span merge), entity linking, triple
extraction, canonicalization (connected components), corpus statistics,
evaluation metrics, exports — re-expressed as DataFrame/SQL plans plus
Arrow-vectorized UDFs, designed for 100 TB-scale partitioned execution.

Layout:
  core/       pure-Python transcriptions of the reference's deterministic
              stages (tokenizer, BIO decode, span merge) — shared verbatim
              by the single-process oracle and the Arrow UDF parity path.
  functions/  column-expression builders (text metrics, vector math).
  operators/  relational operators: spans, linking, triples, canonicalize,
              dedup, similarity, stats, eval, splits.
  sources/    corpus readers (CoNLL, NCBI-annotated) and the repo-shaped
              input view; sinks.
  plans/      end-to-end KG pipeline with checkpoint/manifest/resume.
  streaming/  Structured Streaming variant of the extraction DAG.
"""

__version__ = "0.1.0"
