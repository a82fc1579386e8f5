#!/usr/bin/env python3
"""Reference-parity harness: replays the ACTUAL reference implementation
(/root/reference/smartextractor — loguru/PyPDF2/pdfplumber stubbed since the
reference's parse backend is replaced by the deterministic char derivation;
sklearn.KMeans replaced by Lloyd's with k-means++ as documented in
SURVEY.md §7.3) over the identical derived char/image/table inputs that the
Scala kernel consumed, then diffs the complete per-document results:
per-page block texts + types, column_processed, merged text, normalized
tables, and the output span projection.

Usage: sbt "runMain graft.ParityDump /tmp/parity_dump.json 6"
       python3 tools/reference_parity.py /tmp/parity_dump.json
"""
import json
import sys
import types

# ---- dependency stubs (the reference imports these at module scope) ----
loguru = types.ModuleType("loguru")


class _Logger:
    def __getattr__(self, k):
        return lambda *a, **kw: None


loguru.logger = _Logger()
sys.modules["loguru"] = loguru
for name in ("PyPDF2", "pdfplumber", "fitz"):
    sys.modules[name] = types.ModuleType(name)
# adaptive_pdfplumber type-annotates with pdfplumber.page.Page (module scope)
page_mod = types.ModuleType("pdfplumber.page")
page_mod.Page = object
sys.modules["pdfplumber"].page = page_mod
sys.modules["pdfplumber.page"] = page_mod

# sklearn stub: Lloyd's algorithm with k-means++ init (numpy RandomState).
# NOT sklearn-bit-identical — SURVEY.md §7.3: in 1-D with the separations our
# fixtures produce, Lloyd's, sklearn and the Scala exact-DP solution agree on
# the partition, which is all the reference's logic consumes.
import numpy as np

sklearn = types.ModuleType("sklearn")
cluster_mod = types.ModuleType("sklearn.cluster")
metrics_mod = types.ModuleType("sklearn.metrics")


import os

# GRAFT_KMEANS=exact -> the stub computes the EXACT optimal 1-D k-means
# (identical to the Scala DP). This factors the comparison: in exact mode,
# every divergence would be a genuine logic bug (expected: 0 diffs); in
# lloyd mode (default), residual diffs quantify how sensitive ambiguous
# inputs are to the k-means implementation choice — the one component
# SURVEY.md §7.3 documents as non-replicable (sklearn's seeded restarts).
KMEANS_MODE = os.environ.get("GRAFT_KMEANS", "lloyd")


def _exact_kmeans_1d(X, k):
    order = np.argsort(X, kind="stable")
    xs = X[order]
    n = len(xs)
    k = min(k, n)
    ps = np.concatenate([[0.0], np.cumsum(xs)])
    ps2 = np.concatenate([[0.0], np.cumsum(xs * xs)])

    def sse(a, b):
        m = b - a
        if m <= 1:
            return 0.0
        s = ps[b] - ps[a]
        return max(0.0, (ps2[b] - ps2[a]) - s * s / m)

    INF = float("inf")
    dp = [[INF] * (n + 1) for _ in range(k + 1)]
    cut = [[0] * (n + 1) for _ in range(k + 1)]
    dp[0][0] = 0.0
    for c in range(1, k + 1):
        for j in range(c, n + 1):
            for a in range(c - 1, j):
                cost = dp[c - 1][a] + sse(a, j)
                if cost < dp[c][j] - 1e-12:
                    dp[c][j] = cost
                    cut[c][j] = a
    bounds = [0] * (k + 1)
    bounds[k] = n
    j = n
    for c in range(k, 0, -1):
        a = cut[c][j]
        bounds[c - 1] = a
        j = a
    labels_sorted = np.zeros(n, dtype=int)
    centers = np.zeros(k)
    for c in range(k):
        a, b = bounds[c], bounds[c + 1]
        labels_sorted[a:b] = c
        centers[c] = xs[a:b].mean() if b > a else 0.0
    labels = np.zeros(n, dtype=int)
    labels[order] = labels_sorted
    return labels, centers


class KMeans:
    def __init__(self, n_clusters=2, random_state=None, n_init=10, **kw):
        self.k = n_clusters
        self.seed = random_state if random_state is not None else 0
        self.n_init = n_init if isinstance(n_init, int) else 10

    def fit(self, X):
        if KMEANS_MODE == "exact":
            Xf = np.asarray(X, dtype=float).reshape(-1)
            labels, centers = _exact_kmeans_1d(Xf, self.k)
            self.cluster_centers_ = centers.reshape(-1, 1)
            self.labels_ = labels
            return self
        return self._fit_lloyd(X)

    def _fit_lloyd(self, X):
        X = np.asarray(X, dtype=float).reshape(-1)
        rs = np.random.RandomState(self.seed)
        best = None
        for _ in range(max(1, self.n_init)):
            centers = self._kmeanspp(X, rs)
            for _ in range(100):
                d = np.abs(X[:, None] - centers[None, :])
                labels = d.argmin(axis=1)
                new = np.array([X[labels == c].mean() if (labels == c).any() else centers[c]
                                for c in range(self.k)])
                if np.allclose(new, centers):
                    break
                centers = new
            inertia = ((X - centers[labels]) ** 2).sum()
            if best is None or inertia < best[0]:
                best = (inertia, centers.copy(), labels.copy())
        self.cluster_centers_ = best[1].reshape(-1, 1)
        self.labels_ = best[2]
        return self

    def fit_predict(self, X):
        return self.fit(X).labels_

    def _kmeanspp(self, X, rs):
        centers = [X[rs.randint(len(X))]]
        while len(centers) < self.k:
            d2 = np.min([(X - c) ** 2 for c in centers], axis=0)
            total = d2.sum()
            if total == 0:
                centers.append(X[rs.randint(len(X))])
            else:
                centers.append(X[rs.choice(len(X), p=d2 / total)])
        return np.array(centers, dtype=float)


def silhouette_score(X, labels):
    X = np.asarray(X, dtype=float).reshape(-1)
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    n = len(X)
    s = np.zeros(n)
    for i in range(n):
        own = X[labels == labels[i]]
        if len(own) <= 1:
            continue
        a = np.abs(own - X[i]).sum() / (len(own) - 1)
        b = min(np.abs(X[labels == c] - X[i]).mean() for c in uniq if c != labels[i])
        m = max(a, b)
        s[i] = (b - a) / m if m > 0 else 0.0
    return s.mean()


cluster_mod.KMeans = KMeans
metrics_mod.silhouette_score = silhouette_score
sklearn.cluster = cluster_mod
sklearn.metrics = metrics_mod
sys.modules["sklearn"] = sklearn
sys.modules["sklearn.cluster"] = cluster_mod
sys.modules["sklearn.metrics"] = metrics_mod

# ---- load the reference modules (bypassing smartextractor/__init__) ----
import importlib.util

REF = "/root/reference/smartextractor"


def load(name, path, pkg):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = pkg
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


pkg = types.ModuleType("smartextractor")
pkg.__path__ = [REF]
sys.modules["smartextractor"] = pkg
subpkg = types.ModuleType("smartextractor.processors")
subpkg.__path__ = [REF + "/processors"]
sys.modules["smartextractor.processors"] = subpkg

exceptions = load("smartextractor.exceptions", f"{REF}/exceptions.py", "smartextractor")
config = load("smartextractor.config", f"{REF}/config.py", "smartextractor")
models = load("smartextractor.models", f"{REF}/models.py", "smartextractor")
pdf_processor = load("smartextractor.processors.pdf_processor",
                     f"{REF}/processors/pdf_processor.py", "smartextractor.processors")
layout_processor = load("smartextractor.processors.layout_processor",
                        f"{REF}/processors/layout_processor.py", "smartextractor.processors")
table_processor = load("smartextractor.processors.table_processor",
                       f"{REF}/processors/table_processor.py", "smartextractor.processors")
image_processor = load("smartextractor.processors.image_processor",
                       f"{REF}/processors/image_processor.py", "smartextractor.processors")
text_processor = load("smartextractor.processors.text_processor",
                      f"{REF}/processors/text_processor.py", "smartextractor.processors")

cfg = config.ExtractionConfig()
pdfp = pdf_processor.PDFProcessor(cfg)
layp = layout_processor.LayoutProcessor(cfg)
tabp = table_processor.TableProcessor(cfg)
imgp = image_processor.ImageProcessor(cfg)
txtp = text_processor.TextProcessor(cfg)


class FakePage:
    """pdfplumber page stand-in feeding the derived chars to the reference's
    own _extract_text_objects (pdf_processor.py:156-232)."""

    def __init__(self, chars, width, height):
        self.chars = chars
        self.width = width
        self.height = height

    def extract_text(self):
        return ""


def run_reference(doc):
    """core.py:207-328 + text_processor.post_process, replayed faithfully."""
    pages = []
    for p in doc["pages"]:
        chars = [
            {"text": c["text"], "x0": c["x0"], "x1": c["x1"], "top": c["top"],
             "bottom": c["bottom"], "fontname": c["fontname"], "size": c["size"]}
            for c in p["chars"]
        ]
        fake = FakePage(chars, p["width"], p["height"])
        text_objects = pdfp._extract_text_objects(fake)
        page_num = p["page"] + 1  # core.py:171 1-based
        page_result = models.PageResult(page_number=page_num)
        page_result.width = p["width"]
        page_result.height = p["height"]
        page_result.text_blocks = [
            models.TextBlock(text=o.text, bbox=o.bbox, font_size=o.font_size,
                             font_family=o.font_family, is_bold=o.is_bold,
                             is_italic=o.is_italic)
            for o in text_objects
        ]
        page_result = layp.process(page_result, None)
        page_result.tables = tabp.extract_tables(
            types.SimpleNamespace(tables=[{"data": t["data"], "rows": t["rows"], "cols": t["cols"]}
                                          for t in p["tables"]]), page_num)
        page_result.images = imgp.extract_images(
            types.SimpleNamespace(images=[{"bbox": im["bbox"], "width": im["width"],
                                           "height": im["height"], "type": im["type"]}
                                          for im in p["images"]]), page_num)
        pages.append((page_result, [im["ref"] for im in p["images"]]))

    # core.py:280-328 _merge_results
    all_text = []
    for page_result, _ in pages:
        if getattr(page_result, "_column_processed", False):
            all_text.append("\n".join(b.text for b in page_result.text_blocks if b.text))
        else:
            all_text.extend(b.text for b in page_result.text_blocks if b.text)
    merged = "\n\n".join(all_text)
    result = models.ExtractionResult(
        text=merged,
        pages=[p for p, _ in pages],
        tables=[t for p, _ in pages for t in p.tables],
        images=[i for p, _ in pages for i in p.images],
        metadata={})
    result = txtp.post_process(result)

    # span projection (the engine contract, applied to the reference result)
    spans = []
    off = 0
    refs_by_page = {p.page_number: refs for (p, refs) in pages}
    for p in result.pages:
        for b in p.text_blocks:
            spans.append(("text", b.text or "", "", off)); off += 1
        for t in p.tables:
            bycell = {}
            for c in t.cells:
                bycell.setdefault(c.row, {})[c.col] = c.text
            grid = "\n".join("\t".join(bycell[r][c] for c in sorted(bycell[r]))
                             for r in sorted(bycell))
            spans.append(("table", grid, "", off)); off += 1
        for j, im in enumerate(p.images):
            ref = refs_by_page.get(p.page_number, [])
            spans.append(("image", "", ref[j] if j < len(ref) else "", off)); off += 1

    return {
        "pages": [
            {"page_number": p.page_number,
             "column_processed": bool(getattr(p, "_column_processed", False)),
             "blocks": [{"text": b.text, "type": b.block_type} for b in p.text_blocks]}
            for p in result.pages
        ],
        "text": result.text,
        "tables": [
            {"rows": t.rows, "cols": t.cols, "page": t.page_number,
             "cells": [{"text": c.text, "row": c.row, "col": c.col, "header": c.is_header}
                       for c in t.cells]}
            for t in result.tables
        ],
        "spans": [{"kind": k, "text": tx, "ref": r, "offset": o} for (k, tx, r, o) in spans],
    }


adaptive_pdfitz = load("smartextractor.adaptive_pdfitz", f"{REF}/adaptive_pdfitz.py",
                       "smartextractor")
adaptive_pdfplumber = load("smartextractor.adaptive_pdfplumber", f"{REF}/adaptive_pdfplumber.py",
                           "smartextractor")


def run_reference_fitz(blocks_in, page_width=800.0):
    """Replays AdaptiveFitzExtractor._extract_page_text over line blocks
    (adaptive_pdfitz.py:32-47) — the whole engine minus the fitz parse."""
    ext = adaptive_pdfitz.AdaptiveFitzExtractor()
    blocks = [
        {"text": b["text"], "bbox": (b["x0"], b["y0"], b["x1"], b["y1"]),
         "x0": b["x0"], "y0": b["y0"], "x1": b["x1"], "y1": b["y1"],
         "width": b["x1"] - b["x0"], "height": b["y1"] - b["y0"]}
        for b in blocks_in
    ]
    if not blocks:
        return ""
    layout = ext._detect_layout_type(blocks, page_width)
    if layout == "single_column":
        return ext._extract_single_column(blocks)
    return ext._extract_multi_column(blocks, page_width)


class FakeColumnPage:
    """pdfplumber crop+extract_text stand-in for the plumber engine's column
    pass (adaptive_pdfplumber.py:140-155). Line assembly (group words by top
    within tolerance 3, join with spaces/newlines) mirrors the engine's
    documented word->text rule; the k-selection / separation / split-point
    logic under test is the reference's own code."""

    def __init__(self, words):
        self.words = words

    def extract_text(self, x_tolerance=3, y_tolerance=3):
        ws = sorted(self.words, key=lambda w: (w["top"], w["x0"]))
        lines, cur, cur_top = [], [], None
        for w in ws:
            if cur_top is None or abs(w["top"] - cur_top) <= 3.0:
                cur.append(w["text"])
                if cur_top is None:
                    cur_top = w["top"]
            else:
                lines.append(" ".join(cur))
                cur, cur_top = [w["text"]], w["top"]
        if cur:
            lines.append(" ".join(cur))
        return "\n".join(lines)


class FakePlumberPage:
    def __init__(self, words, width=800.0, height=600.0):
        self.words = words
        self.width = width
        self.bbox = (0, 0, width, height)

    def extract_words(self, x_tolerance=3, y_tolerance=3, keep_blank_chars=False):
        return self.words

    def extract_text(self, x_tolerance=3, y_tolerance=3):
        return FakeColumnPage(self.words).extract_text()

    def crop(self, bbox):
        x0, _, x1, _ = bbox
        return FakeColumnPage([w for w in self.words
                               if x0 <= (w["x0"] + w["x1"]) / 2 < x1])


def run_reference_plumber(words_in):
    """Replays AdaptivePlumberExtractor._extract_text_from_multi_column_auto
    (adaptive_pdfplumber.py:49-155) over the derived words."""
    ext = adaptive_pdfplumber.AdaptivePlumberExtractor()
    words = [{"text": w["text"], "x0": w["x0"], "x1": w["x1"], "top": w["top"]}
             for w in words_in]
    page = FakePlumberPage(words)
    return ext._extract_text_from_multi_column_auto(page, 2)


def main():
    dump = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_dump.json"))
    fails = 0
    adaptive_checked = 0
    for doc in dump:
        if "fitz" in doc:
            rf = run_reference_fitz(doc["fitz"]["blocks"])
            if rf != doc["fitz"]["text"]:
                fails += 1
                print(f"DIFF-FITZ {doc['doc_id']}: ref={rf[:80]!r} scala={doc['fitz']['text'][:80]!r}")
            else:
                adaptive_checked += 1
        if "plumber" in doc:
            rp = run_reference_plumber(doc["plumber"]["words"])
            if rp != doc["plumber"]["text"]:
                fails += 1
                print(f"DIFF-PLUMBER {doc['doc_id']}: ref={rp[:80]!r} scala={doc['plumber']['text'][:80]!r}")
            else:
                adaptive_checked += 1
    if adaptive_checked:
        print(f"adaptive engines: {adaptive_checked} replays matched")
    for doc in dump:
        ref = run_reference(doc)
        got = doc["out"]
        doc_id = doc["doc_id"]
        problems = []
        if ref["text"] != got["text"]:
            problems.append("merged text differs")
        if ref["spans"] != got["spans"]:
            for i, (a, b) in enumerate(zip(ref["spans"], got["spans"])):
                if a != b:
                    problems.append(f"span[{i}]: ref={a} scala={b}")
                    break
            if len(ref["spans"]) != len(got["spans"]):
                problems.append(f"span count ref={len(ref['spans'])} scala={len(got['spans'])}")
        if ref["tables"] != got["tables"]:
            problems.append("tables differ")
        for rp, gp in zip(ref["pages"], got["pages"]):
            if rp != gp:
                problems.append(f"page {rp['page_number']}: "
                                f"colproc ref={rp['column_processed']} scala={gp['column_processed']}; "
                                f"first diff block: "
                                f"{next(((a, b) for a, b in zip(rp['blocks'], gp['blocks']) if a != b), 'count')}")
                break
        if problems:
            fails += 1
            print(f"DIFF {doc_id}: " + " | ".join(problems[:3]))
        else:
            print(f"MATCH {doc_id} ({len(got['spans'])} spans)")
    print(f"\n{fails} diffs / {len(dump)} docs")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
