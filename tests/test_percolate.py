"""Percolator kernel: conjunctive matching, CSR fan-out, edge cases."""

import numpy as np
import pyarrow as pa
import ray.data

from snowplow_elasticsearch_loader_ray.pipelines import percolate as P


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


QUERIES = [
    (0, ["alert"]),                      # single term
    (1, ["disk", "full"]),               # conjunction
    (2, ["disk", "full", "critical"]),   # superset conjunction
    (3, ["nosuchterm"]),                 # matches nothing
]


def test_percolate_conjunctive():
    docs = _ds([
        (10, "the disk is full"),                    # q1
        (11, "disk almost full critical alert now"), # q0 q1 q2
        (12, "alert only"),                          # q0
        (13, "full stop"),                           # none (no disk)
        (14, ""),                                    # none
    ])
    out = P.percolate(docs, QUERIES).to_pandas()
    got = sorted(map(tuple, out[["qid", "doc_id"]].values.tolist()))
    assert got == [(0, 11), (0, 12), (1, 10), (1, 11), (2, 11)]


def test_percolate_term_repeats_in_doc_count_once():
    docs = _ds([(1, "disk disk disk")])  # repeated term is one incidence
    out = P.percolate(docs, [(7, ["disk", "full"])]).to_pandas()
    assert len(out) == 0


def test_percolate_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)]
    docs = [(i, " ".join(rng.choice(vocab, size=rng.integers(3, 12))))
            for i in range(200)]
    queries = [(q, sorted(set(rng.choice(vocab, size=rng.integers(1, 4)))))
               for q in range(15)]
    out = P.percolate(_ds(docs), queries).to_pandas()
    got = set(map(tuple, out[["qid", "doc_id"]].values.tolist()))
    want = {(q, d) for q, terms in queries
            for d, text in docs if set(terms) <= set(text.split())}
    assert got == want
