"""Pure-Python PDF parsing / text-extraction core.

Reimplements (from public knowledge of the PDF 1.7 spec and the observed
behavior of the reference at /root/reference) the full pipeline:

  lexer -> xref (classic/stream/hybrid/Prev-chain/repair) -> object graph
  (per-document dict-of-offsets) -> filters -> page tree (iterative walk)
  -> content-stream interpreter (Tj/TJ/Td/Tm state machine) -> fonts
  (encodings/CMap/ToUnicode) -> text device (space/newline heuristics)
  -> serializer (CRLF / '?'-folding / ligature expansion).

No Spark imports here: this package is what the vectorized pandas UDF in
``operators/extraction.py`` calls per batch of documents.
"""

def __getattr__(name):  # lazy: avoids importing numpy/zlib chains at pkg import
    if name in ("extract_text", "stat_document", "ExtractResult"):
        from . import extract

        return getattr(extract, name)
    raise AttributeError(name)
