"""Top-level extraction entry: bytes -> text (+ metrics).

Drives the same per-document pipeline as the reference's showtext loop
(src/digPdfViewer.pas:632-666): per page, load -> interpret with the text
device at CTM = identity -> serialize spans with CRLF; pages concatenate.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .cos import to_int, is_indirect
from .document import PdfDocument, PdfError
from .interp import CSI, IDENTITY, run_buffer, run_form_xobject
from .metadata import extract_info
from .pages import count_pages, load_page, load_page_tree
from .textdev import TextDevice


@dataclass
class ExtractResult:
    text: str = ""
    npages: int = 0
    n_objects: int = 0
    status: str = "ok"  # ok | repaired | failed
    error: str = ""
    failures: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)
    wall_ms: int = 0


def _run_page_text(doc: PdfDocument, csi_cache: dict, pageno: int) -> str:
    page = load_page(doc, pageno)
    dev = TextDevice()
    csi = CSI(doc, dev, IDENTITY)
    csi.font_cache = csi_cache  # per-document font memo (pdf_store_s analogue)
    run_buffer(csi, page.resources, page.contents)
    csi.flush_text()
    # annotation appearance streams run after the page content
    # (pdf_run_page_with_usage, src/vcl/pdf_interprets.pas:2668-2704)
    for annot_ref in page.annots:
        annot = doc.resolve(annot_ref)
        if not isinstance(annot, dict):
            continue
        flags = to_int(doc.resolve(annot.get("F")))
        if flags & 0b100011:  # Invisible | Hidden | NoView
            continue
        ap = doc.resolve(annot.get("AP"))
        if not isinstance(ap, dict):
            continue
        n_ref = ap.get("N")
        n = doc.resolve(n_ref)
        if isinstance(n, dict) and "Subtype" not in n and not doc.is_stream(n_ref):
            # appearance substates: pick the /AS one or the first
            as_name = doc.resolve(annot.get("AS"))
            n_ref = n.get(str(as_name)) if as_name else None
            if n_ref is None and n:
                n_ref = next(iter(n.values()))
            n = doc.resolve(n_ref)
        if isinstance(n, dict) and is_indirect(n_ref) and doc.is_stream(n_ref):
            acsi = CSI(doc, dev, IDENTITY)
            acsi.font_cache = csi_cache
            try:
                run_form_xobject(acsi, page.resources, n_ref, n, IDENTITY)
                acsi.flush_text()
            except Exception:
                doc.note_failure("annot_ap_error")
    dev.close()
    return dev.to_text()


def extract_text(data: bytes, want_metadata: bool = True) -> ExtractResult:
    res = ExtractResult()
    t0 = time.perf_counter()
    try:
        doc = PdfDocument(data)
    except PdfError as e:
        res.status = "failed"
        res.error = e.code
        res.failures = {e.code: 1}
        res.wall_ms = int((time.perf_counter() - t0) * 1000)
        return res
    except Exception as e:  # noqa: BLE001 - any malformed doc must not kill the batch
        res.status = "failed"
        res.error = f"open_error:{type(e).__name__}"
        res.failures = {"open_error": 1}
        res.wall_ms = int((time.perf_counter() - t0) * 1000)
        return res

    try:
        load_page_tree(doc)
    except Exception as e:
        res.status = "failed"
        res.error = getattr(e, "code", f"pagetree_error:{type(e).__name__}")
        res.failures = dict(doc.failures)
        res.failures[res.error] = res.failures.get(res.error, 0) + 1
        res.n_objects = len(doc.table)
        res.wall_ms = int((time.perf_counter() - t0) * 1000)
        return res

    res.npages = count_pages(doc)
    parts: list[str] = []
    font_cache: dict = {}
    for i in range(res.npages):
        try:
            parts.append(_run_page_text(doc, font_cache, i))
        except Exception as e:  # page-level tolerance, like the reference's
            doc.note_failure(f"page_error:{type(e).__name__}")
            parts.append("")
    res.text = "".join(parts)
    res.n_objects = len(doc.table)
    if want_metadata:
        try:
            res.metadata = extract_info(doc)
        except Exception:
            doc.note_failure("metadata_error")
    res.failures = dict(doc.failures)
    res.status = "repaired" if doc.repaired else "ok"
    res.wall_ms = int((time.perf_counter() - t0) * 1000)
    return res
