"""Generate the CJK predefined-CMap data module (SURVEY §2.A A34).

The predefined CMaps (78-EUC-H, UniGB-UCS2-H, Adobe-Japan1-UCS2, ...) are
Adobe's published character-collection data (cmap-resources, BSD-licensed
by Adobe). This tool re-encodes that data into a compact .npz the engine
loads lazily per executor. It can parse either source:

  * Adobe's original cmap-resources checkout (preferred on a real
    deployment):  python tools/gen_cjk_cmaps.py --adobe <dir>
    [not implemented in this sandbox — no network]
  * the same tables as compiled into the reference repo's data units
    (src/vcl/camp_*.pas / cmap_koreass.pas), which are themselves a
    re-encoding of the Adobe data:
      python tools/gen_cjk_cmaps.py --reference /root/reference

Only DATA (integer mapping tables defined by the Adobe standard) is
extracted — no code. Output: delphi_pdf_parser_spark/pdfcore/data/
cjk_cmaps.npz with, per cmap NAME:
  NAME/meta       [wmode]
  NAME/codespaces (k,3) int64  (nbytes, low, high)
  NAME/ranges     (r,3) int64  (low, extent_flags, offset)  [packed:
                  high = low + (extent_flags>>2), flag = extent_flags&3]
  NAME/table      (t,)  uint16
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

DATA_UNITS = [
    "camp_japans.pas",
    "camp_cn.pas",
    "camp_cnns.pas",
    "camp_gbss.pas",
    "cmap_koreass.pas",
]

_ranges_re = re.compile(
    r"const\s+cmap_(\w+)_ranges\s*:\s*array\s*\[0\.\.(\d+)(?:\s*-\s*1)?\s*\]\s*of\s+pdf_range_s\s*=\s*\(",
    re.IGNORECASE,
)
_table_re = re.compile(
    r"const\s+cmap_(\w+)_table\s*:\s*array\s*\[0\.\.(\d+)(?:\s*-\s*1)?\s*\]\s*of\s+word\s*=\s*\(",
    re.IGNORECASE,
)
_cmap_re = re.compile(
    r"const\s+cmap_(\w+)\s*:\s*pdf_cmap_s\s*=\s*\(", re.IGNORECASE
)
_tuple_re = re.compile(r"\(low:(\d+);extent_flags:(\d+);offset:(\d+)\)")
_cs_re = re.compile(r"\(n:(\d+);low:(\d+);high:(\d+)\)")
_int_re = re.compile(r"\d+")


def _find_close(text: str, start: int) -> int:
    """Index just past the matching ')' for the '(' at start-1."""
    depth = 1
    i = start
    while depth:
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return i


def parse_unit(path: str):
    text = open(path, "r", encoding="latin-1").read()
    ranges: dict[str, np.ndarray] = {}
    tables: dict[str, np.ndarray] = {}
    cmaps: dict[str, dict] = {}
    for m in _ranges_re.finditer(text):
        name = m.group(1)
        end = _find_close(text, m.end())
        body = text[m.end() : end]
        tup = _tuple_re.findall(body)
        ranges[name] = np.array(tup, dtype=np.int64)
    for m in _table_re.finditer(text):
        name = m.group(1)
        end = _find_close(text, m.end())
        body = text[m.end() : end - 1]
        vals = [int(x) for x in _int_re.findall(body)]
        tables[name] = np.array(vals, dtype=np.uint16)
    for m in _cmap_re.finditer(text):
        name = m.group(1)
        end = _find_close(text, m.end())
        body = text[m.end() : end]
        nm = re.search(r"cmap_name:\s*'([^']*)'", body)
        wm = re.search(r"wmode:\s*(\d+)", body)
        use = re.search(r"usecmap_name:\s*'([^']*)'", body)
        cs = _cs_re.findall(body)
        cmaps[name] = {
            "cmap_name": nm.group(1) if nm else name,
            "wmode": int(wm.group(1)) if wm else 0,
            "usecmap": use.group(1) if use else "",
            "codespaces": np.array(
                [c for c in cs if int(c[0]) > 0], dtype=np.int64
            ),
        }
    return ranges, tables, cmaps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__),
            "..",
            "delphi_pdf_parser_spark",
            "pdfcore",
            "data",
            "cjk_cmaps.npz",
        ),
    )
    args = ap.parse_args()
    src = os.path.join(args.reference, "src", "vcl")
    if not os.path.isdir(src):
        print(f"reference source not found at {src}; skipping", file=sys.stderr)
        return 1

    all_ranges: dict[str, np.ndarray] = {}
    all_tables: dict[str, np.ndarray] = {}
    all_cmaps: dict[str, dict] = {}
    for unit in DATA_UNITS:
        path = os.path.join(src, unit)
        if not os.path.exists(path):
            print(f"missing data unit {unit}", file=sys.stderr)
            continue
        r, t, c = parse_unit(path)
        all_ranges.update(r)
        all_tables.update(t)
        all_cmaps.update(c)

    out: dict[str, np.ndarray] = {}
    skipped = []
    for ident, meta in sorted(all_cmaps.items()):
        name = meta["cmap_name"]
        rng = all_ranges.get(ident)
        if rng is None:
            skipped.append(name)
            continue
        tab = all_tables.get(ident, np.zeros(0, dtype=np.uint16))
        out[f"{name}/meta"] = np.array([meta["wmode"]], dtype=np.int64)
        out[f"{name}/use"] = np.array(
            [meta["usecmap"]], dtype=np.str_
        )
        out[f"{name}/codespaces"] = meta["codespaces"]
        out[f"{name}/ranges"] = rng
        out[f"{name}/table"] = tab

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    n = len({k.split("/")[0] for k in out})
    size = os.path.getsize(args.out)
    print(f"wrote {n} cmaps ({size/1e6:.1f} MB) to {args.out}")
    if skipped:
        print(f"skipped (no ranges): {skipped}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
