"""Page tree walk (iterative, explicit stack) + page loading.

Mirrors src/vcl/fz_pdf_page.pas:

- DFS over /Pages -> /Kids with a cycle guard (the reference marks nodes
  with a '.seen' key, :38-106; we keep a set of object numbers), with
  inheritance of Resources/MediaBox/CropBox/Rotate
- the walk is ITERATIVE with an explicit stack per the north star (the
  reference recurses)
- /Contents arrays are concatenated with a single space byte between the
  decoded parts (pdf_load_page_contents_array :254-295) — the space is
  semantic (token separation)
"""

from __future__ import annotations

from .cos import IndirectRef, is_indirect, to_int
from .document import PdfDocument, PdfError


class Page:
    __slots__ = ("resources", "contents", "rotate", "annots")

    def __init__(self):
        self.resources: dict | None = None
        self.contents: bytes = b""
        self.rotate = 0
        self.annots: list = []


def load_page_tree(doc: PdfDocument) -> None:
    """Flatten the page tree into doc.page_refs/page_objs."""
    catalog = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(catalog, dict):
        raise PdfError("missing_root")
    pages = doc.resolve(catalog.get("Pages"))
    if not isinstance(pages, dict):
        raise PdfError("missing_page_tree")
    count = doc.resolve(pages.get("Count"))
    if not isinstance(count, int) or isinstance(count, bool):
        raise PdfError("missing_page_count")

    doc.page_refs = []
    doc.page_objs = []

    # explicit stack of (node_ref_or_dict, inherited info, seen-path)
    Info = dict  # keys: Resources MediaBox CropBox Rotate
    root_ref = catalog.get("Pages")
    stack: list[tuple[object, dict, frozenset]] = [
        (root_ref, {}, frozenset())
    ]
    while stack:
        node_ref, info, path = stack.pop()
        num = node_ref.num if is_indirect(node_ref) else -1
        if num >= 0 and num in path:
            doc.note_failure("pagetree_cycle")
            continue
        node = doc.resolve(node_ref)
        if not isinstance(node, dict):
            continue
        kids = doc.resolve(node.get("Kids"))
        count = doc.resolve(node.get("Count"))
        if isinstance(kids, list) and isinstance(count, int):
            new_info = dict(info)
            for key in ("Resources", "MediaBox", "CropBox", "Rotate"):
                if node.get(key) is not None:
                    new_info[key] = node.get(key)
            new_path = path | {num} if num >= 0 else path
            # push in reverse so pop() visits kids in order
            for kid in reversed(kids):
                stack.append((kid, new_info, new_path))
        else:
            # leaf: install inherited attributes when absent
            for key, val in info.items():
                if node.get(key) is None:
                    node[key] = val
            doc.page_refs.append(
                node_ref if is_indirect(node_ref) else IndirectRef(-1, 0)
            )
            doc.page_objs.append(node)


def count_pages(doc: PdfDocument) -> int:
    return len(doc.page_objs)


def load_page_contents(doc: PdfDocument, obj) -> bytes:
    resolved = doc.resolve(obj)
    if isinstance(resolved, list):
        parts = []
        for stm in resolved:
            if not is_indirect(stm):
                continue
            try:
                parts.append(doc.load_stream(stm.num))
            except Exception:
                doc.note_failure("content_part_error")
        # single space byte joins the parts AND terminates the last one
        return b"".join(p + b" " for p in parts)
    if is_indirect(obj) and doc.is_stream(obj):
        return doc.load_stream(obj.num)
    doc.note_failure("page_contents_missing")
    return b""


def load_page(doc: PdfDocument, number: int) -> Page:
    if number < 0 or number >= len(doc.page_objs):
        raise PdfError("page_out_of_range", str(number))
    pageobj = doc.page_objs[number]
    page = Page()
    page.rotate = to_int(doc.resolve(pageobj.get("Rotate")))
    res = doc.resolve(pageobj.get("Resources"))
    page.resources = res if isinstance(res, dict) else None
    page.contents = load_page_contents(doc, pageobj.get("Contents"))
    annots = doc.resolve(pageobj.get("Annots"))
    if isinstance(annots, list):
        page.annots = annots
    return page
