#!/usr/bin/env python3
"""Materialize the expected per-document summary table for the extraction
oracles (q01/q02/q03/q32) by replaying the ACTUAL reference implementation
(/root/reference/smartextractor, loaded via tools/reference_parity.py's
module harness) over the derived inputs dumped by `graft.ExpectedDump`.

Only the input derivation (geometry template, FIXTURES.md §2) is shared with
the Scala engine; all behavior — char grouping, column split, layout vote,
reading order, merge, post-process, and both adaptive engines including the
physical-page probe — is the reference's own Python executing here.

Usage:
  sbt "runMain graft.ExpectedDump /tmp/expected_dump.jsonl /root/testdata/sf0.1 /root/testdata/sf0.01 /root/testdata/sf0.001"
  GRAFT_KMEANS=exact python3 tools/gen_expected.py /tmp/expected_dump.jsonl src/main/resources/graft/expected_docs.csv

GRAFT_KMEANS=exact replaces the sklearn stub's Lloyd with the exact optimal
1-D k-means (identical to the Scala DP) — the one documented substitution
(SURVEY.md §7.3); everything else is reference code.
"""
import json
import os
import sys

assert os.environ.get("GRAFT_KMEANS") == "exact", \
    "run with GRAFT_KMEANS=exact (the documented sklearn substitution)"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import reference_parity as rp  # noqa: E402  (loads the reference modules)

# Geometry template constants — the documented derivation (FIXTURES.md §2,
# graft/kernel/Parse.scala): fixed 800x600 page, 24 spans/page, 8pt char
# advance from x=50, 25pt line advance from y=2, title slot = page 0 line 1.
PAGE_W, PAGE_H = 800.0, 600.0
SPANS_PER_PAGE = 24
CHAR_W, LEFT, LINE_ADV, LINE_H, TITLE_H = 8.0, 50.0, 25.0, 18.0, 22.0


def line_chars(line):
    o, t, g = line["o"], line["t"], line["g"]
    idx = o % SPANS_PER_PAGE
    title = (o // SPANS_PER_PAGE == 0 and idx == 1)
    font = "Helvetica-Bold" if title else "Helvetica"
    size = 18.0 if title else 12.0
    top = 2.0 + LINE_ADV * idx
    bottom = top + (TITLE_H if title else LINE_H)
    out = []
    for k in range(len(t)):
        x0 = LEFT + g[k] * CHAR_W
        out.append({"text": t[k], "x0": x0, "x1": x0 + CHAR_W, "top": top,
                    "bottom": bottom, "fontname": font, "size": size})
    return out


def image_dict(img):
    top = 2.0 + LINE_ADV * (img["o"] % SPANS_PER_PAGE)
    return {"bbox": [100.0, top, 500.0, top + LINE_H], "width": 400.0,
            "height": LINE_H, "type": "image", "ref": img["ref"]}


def to_parity_doc(doc):
    """ExpectedDump JSONL row -> the run_reference() input format."""
    pages = []
    for p in doc["pages"]:
        pages.append({
            "page": p["page"], "width": PAGE_W, "height": PAGE_H,
            "chars": [c for ln in p["lines"] for c in line_chars(ln)],
            "images": [image_dict(im) for im in p["images"]],
            "tables": p["tables"],
        })
    return {"doc_id": doc["doc_id"], "pages": pages}


class ProbePage:
    """pdfplumber page stand-in for the layout probe only: extract_table
    truthiness precomputed from the text-strategy grid detection."""

    def __init__(self, truthy):
        self.truthy = truthy

    def extract_table(self, *a, **kw):
        return [["x", "y"]] if self.truthy else None


def run_plumber_full(doc):
    """Replays AdaptivePlumberExtractor.extract_text end to end
    (adaptive_pdfplumber.py:20-46): physical-page probe -> max_columns ->
    auto extraction of physical page 0."""
    ext = rp.adaptive_pdfplumber.AdaptivePlumberExtractor()
    probe_pages = [ProbePage(b) for b in doc["plumber_probe"]]
    if not probe_pages:
        return ""
    double = ext._is_multi_column_layout(probe_pages)
    maxc = 2 if double else 1
    words = [{"text": w["t"], "x0": w["x0"], "x1": w["x1"], "top": w["top"]}
             for w in doc["plumber_words"]]
    return ext._extract_text_from_multi_column_auto(rp.FakePlumberPage(words), maxc)


def utf16len(s):
    # Scala String.length counts UTF-16 code units
    return len(s.encode("utf-16-le")) // 2


def main():
    dump_path = sys.argv[1]
    out_path = sys.argv[2]
    rows = []
    with open(dump_path) as f:
        for lineno, line in enumerate(f):
            doc = json.loads(line)
            core = rp.run_reference(to_parity_doc(doc))
            fitz_text = rp.run_reference_fitz(
                [{"text": b["t"], "x0": b["x0"], "y0": b["y0"], "x1": b["x1"], "y1": b["y1"]}
                 for b in doc["fitz_blocks"]])
            plumber_text = run_plumber_full(doc)
            rows.append((doc["src_id"], doc["doc_id"], len(core["spans"]),
                         len(core["pages"]), utf16len(core["text"]),
                         utf16len(fitz_text), utf16len(plumber_text)))
            if (lineno + 1) % 500 == 0:
                print(f"  {lineno + 1} docs replayed", file=sys.stderr)
    rows.sort(key=lambda r: (len(r[0]), r[0]))
    with open(out_path, "w") as f:
        f.write("src_id,doc_id,n_spans,n_pages,text_len,fitz_len,plumber_len\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"wrote {len(rows)} expected rows to {out_path}")


if __name__ == "__main__":
    main()
