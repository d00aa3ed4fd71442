"""In-memory pure-Python indexer + BM25 — the executable reference.

The Scala loader delegates scoring to Elasticsearch, so (per SURVEY.md
§7.4) this trivial exhaustive implementation IS the reference for
scores: the engine's top-k must be rank-identical to it on the fixed
query set (the analogue of the reference IT harness's ``pollForDocs``
field assertions, ``TestHelpers.scala:157-201``).

Deliberately independent of the engine's Arrow kernels: counting uses
``re.findall`` + ``collections.Counter``; only the BM25 *formula*
module is shared (one formula, two counting paths).
"""

from __future__ import annotations

import re
from collections import Counter

from . import bm25

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id → text."""
        self.doclen: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, text in docs.items():
            toks = _TOKEN_RE.findall(text.lower())
            self.doclen[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(docs)
        total = sum(self.doclen.values())
        self.avgdl = total / self.n_docs if self.n_docs else 1.0
        self.total_tokens = total

    def term_stats(self) -> dict[str, tuple[int, int]]:
        return {t: (len(p), sum(p.values())) for t, p in self.postings.items()}

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """[(doc_id, rounded score)] ranked by (round(score,7) desc, doc_id asc)."""
        terms = sorted(set(_TOKEN_RE.findall(query.lower())))
        acc: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = bm25.idf(self.n_docs, len(plist))
            for doc_id, tf in plist.items():
                s = w * float(bm25.tf_weight(float(tf), float(self.doclen[doc_id]), self.avgdl))
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(
            ((round(s, bm25.SCORE_ROUND), d) for d, s in acc.items()),
            key=lambda e: (-e[0], e[1]),
        )
        return [(d, s) for s, d in ranked[:k]]
