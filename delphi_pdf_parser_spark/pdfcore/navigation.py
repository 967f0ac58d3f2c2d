"""Document navigation: outlines (bookmarks) and link annotations.

Reference surface: pdf_load_outline (src/vcl/fz_outline.pas, wired in
openfile1) walks /Outlines First/Next chains; pdf_load_link(s)
(src/vcl/fz_pdf_linkss.pas:51-168) resolves /Annots Link entries to URI
actions or GoTo destinations (named dests via the name tree,
src/vcl/pdfnamesstree.pas).
"""

from __future__ import annotations

from dataclasses import dataclass

from .cos import is_indirect, to_name
from .document import PdfDocument
from .metadata import pdf_to_text


@dataclass
class OutlineItem:
    level: int
    title: str
    dest: str  # textual form of the destination / action target


@dataclass
class Link:
    page: int
    rect: tuple
    kind: str  # uri | goto | named | other
    target: str


def _dest_str(doc: PdfDocument, dest) -> str:
    dest = doc.resolve(dest)
    if isinstance(dest, bytes):
        return pdf_to_text(dest)
    if isinstance(dest, list) and dest:
        first = dest[0]
        if is_indirect(first):
            return f"page-obj:{first.num}"
        return str(doc.resolve(first))
    if to_name(dest):
        return str(dest)
    return ""


def extract_outline(doc: PdfDocument, max_items: int = 4096) -> list[OutlineItem]:
    """Iterative First/Next walk with an explicit stack + visited set."""
    catalog = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(catalog, dict):
        return []
    outlines = doc.resolve(catalog.get("Outlines"))
    if not isinstance(outlines, dict):
        return []
    out: list[OutlineItem] = []
    seen: set[int] = set()
    stack = [(outlines.get("First"), 0)]
    while stack and len(out) < max_items:
        node_ref, level = stack.pop()
        while node_ref is not None and len(out) < max_items:
            num = node_ref.num if is_indirect(node_ref) else -1
            if num >= 0:
                if num in seen:
                    break
                seen.add(num)
            node = doc.resolve(node_ref)
            if not isinstance(node, dict):
                break
            title = node.get("Title")
            title_s = pdf_to_text(title) if isinstance(title, bytes) else ""
            dest = node.get("Dest")
            if dest is None:
                action = doc.resolve(node.get("A"))
                if isinstance(action, dict):
                    dest = action.get("D") or action.get("URI")
            out.append(OutlineItem(level, title_s, _dest_str(doc, dest)))
            if node.get("First") is not None:
                stack.append((node.get("Next"), level))
                node_ref = node.get("First")
                level += 1
                continue
            node_ref = node.get("Next")
    return out


def extract_links(doc: PdfDocument) -> list[Link]:
    out: list[Link] = []
    for pageno, pageobj in enumerate(doc.page_objs):
        annots = doc.resolve(pageobj.get("Annots"))
        if not isinstance(annots, list):
            continue
        for aref in annots:
            annot = doc.resolve(aref)
            if not isinstance(annot, dict):
                continue
            if to_name(doc.get(annot, "Subtype")) != "Link":
                continue
            rect_obj = doc.resolve(annot.get("Rect"))
            rect = tuple(
                float(doc.resolve(v))
                if isinstance(doc.resolve(v), (int, float))
                else 0.0
                for v in (rect_obj or [0, 0, 0, 0])[:4]
            )
            action = doc.resolve(annot.get("A"))
            dest = annot.get("Dest")
            if isinstance(action, dict):
                s = to_name(doc.get(action, "S"))
                if s == "URI":
                    uri = doc.resolve(action.get("URI"))
                    out.append(
                        Link(
                            pageno,
                            rect,
                            "uri",
                            pdf_to_text(uri) if isinstance(uri, bytes) else "",
                        )
                    )
                    continue
                if s == "GoTo":
                    dest = action.get("D")
            if dest is not None:
                kind = "named" if isinstance(doc.resolve(dest), bytes) else "goto"
                out.append(Link(pageno, rect, kind, _dest_str(doc, dest)))
            else:
                out.append(Link(pageno, rect, "other", ""))
    return out
