"""delphi_pdf_parser_spark — a from-scratch, PySpark-native PDF
text-extraction engine with the capabilities of liyc1968/Delphi-PDF-Parser
(a Delphi 7 port of MuPDF 1.0).

Layout:
  pdfcore/    pure-Python reimplementation of the reference's extraction
              pipeline (no Spark dependency; unit-testable in isolation)
  operators/  Spark DataFrame operators (extraction mapInPandas, dedup,
              similarity, text stats, relational ops)
  sources/    table loaders for the documents/golden/metrics tables
  functions/  shared column helpers (pyspark.sql.functions compositions)
  streaming/  Structured Streaming drop-in around the same pure extractor
"""

__version__ = "0.1.0"
