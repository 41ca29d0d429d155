"""Equivalence pins for the r13 optimizations.

The r13 chunk-kernel change (splitter span fast path) must be
bit-identical to the legacy path: the golden-corpus suite pins the
composed output, these tests pin the new machinery directly against
the legacy construction on adversarial inputs.
"""

from __future__ import annotations

import re

import pytest

from gpt_rag_ingestion_spark.chunking import splitter as sp
from gpt_rag_ingestion_spark.chunking.doc_analysis import (
    _chunk_numbered,
    chunk_analyzed_markdown,
    number_pagebreaks,
)

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")

EDGE_TEXTS = [
    "",
    " ",
    ".",
    ". ",
    "a",
    "a b",
    "word. " * 120,
    ". leading separator",
    "trailing separator. ",
    "a. . b",
    ". . . ",
    "x " * 400,
    "a\n\nb\n\nc" * 60,
    "#h\n# h2\nbody. more",
    "\n# A\n## B\ntext here. and more. " * 40,
    "(x) [y] {z}! " * 50,
    "one\ttwo\tthree! four? five. " * 30,
    "_under_score_ mix3d c4se. " * 30,
    "multi  spaces   here. " * 40,
    "\n\n\n\n",
    "abc" * 1500,
    "Header <!-- PageBreak --> middle. text <!-- PageBreak --> tail words",
]

SEPSETS = [
    None,
    sp.MARKDOWN_SEPARATORS,
    sp.PYTHON_SEPARATORS,
    sp.SENTENCE_SEPARATORS,
]
PARAMS = [(40, 4, 2), (60, 4, 1), (64, 8, 4), (10, 3, 1), (5, 0, 1), (8, 8, 2)]


def test_token_spans_batch_matches_finditer():
    spans = sp.token_spans_batch(EDGE_TEXTS + [None, "über café", "mixé. x"])
    for text, spn in zip(EDGE_TEXTS + ["", "über café", "mixé. x"], spans):
        ref = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]
        if not text.isascii():
            assert spn is None  # non-ASCII rows take the legacy path
            continue
        assert list(zip(spn[0].tolist(), spn[1].tolist())) == ref


def test_span_fast_path_matches_legacy_splitter():
    spans = sp.token_spans_batch(EDGE_TEXTS)
    n = 0
    for sepset in SEPSETS:
        for mt, ov, mn in PARAMS:
            for text, spn in zip(EDGE_TEXTS, spans):
                legacy = sp.split_text_recursive(
                    text, max_tokens=mt, overlap_tokens=ov, min_tokens=mn,
                    separators=sepset,
                )
                fast = sp.split_text_recursive(
                    text, max_tokens=mt, overlap_tokens=ov, min_tokens=mn,
                    separators=sepset, _spans=spn,
                )
                assert fast == legacy, (text[:50], mt, ov, mn)
                n += 1
    assert n == len(SEPSETS) * len(PARAMS) * len(EDGE_TEXTS)


def test_span_fast_path_rejects_non_additive_separators():
    # a word-char separator breaks count additivity -> the fast path
    # must defer to the legacy implementation (same results either way
    # because split_text_recursive falls back internally)
    text = "xxabyy zzabww. " * 30
    (spn,) = sp.token_spans_batch([text])
    legacy = sp.split_text_recursive(
        text, max_tokens=6, overlap_tokens=1, min_tokens=1, separators=["ab", " "]
    )
    fast = sp.split_text_recursive(
        text, max_tokens=6, overlap_tokens=1, min_tokens=1,
        separators=["ab", " "], _spans=spn,
    )
    assert sp._compiled_seps(("ab", " ")) is None
    assert fast == legacy


def test_chunk_numbered_matches_chunk_analyzed_markdown():
    mds = [
        "alpha <!-- PageBreak --> beta gamma. delta <!-- PageBreak --> tail",
        "no breaks at all, just words. " * 20,
        "",
        "<!-- PageBreak -->",
    ]
    for start_page in (1, 7):
        numbered = [number_pagebreaks(s, start_page=start_page) for s in mds]
        spans = sp.token_spans_batch(numbered)
        for s, nmd, spn in zip(mds, numbered, spans):
            legacy = chunk_analyzed_markdown(
                s, max_tokens=12, overlap=2, min_tokens=1, start_page=start_page
            )
            fast = _chunk_numbered(nmd, spn, 12, 2, 1, start_page)
            assert fast == legacy
