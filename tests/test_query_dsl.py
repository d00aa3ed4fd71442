"""The ES _search DSL planner must be BIT-identical to the direct-call
primitives for every supported shape, and refuse everything else."""

import numpy as np
import pytest

from snowplow_elasticsearch_loader_ray.driver_queries import _reader
from snowplow_elasticsearch_loader_ray.pipelines import query_dsl as DSL
from snowplow_elasticsearch_loader_ray.pipelines.query import (
    score_dismax,
    score_function_gauss,
    score_min_should_match,
    score_taat,
    score_taat_filtered,
    score_taat_range,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(ray_session):
    return _reader(SF)


def _same(a, b):
    (da, sa), (db, sb) = a, b
    assert np.array_equal(da, db)
    assert np.array_equal(sa, sb)


def test_match_is_score_taat(reader):
    _same(DSL.execute(reader, {"query": {"match": {"text": "data stream"}}}),
          score_taat(reader, "data stream", 10))


def test_match_minimum_should_match(reader):
    body = {"query": {"match": {"text": {
        "query": "merge sort join", "minimum_should_match": 2}}}, "size": 7}
    _same(DSL.execute(reader, body),
          score_min_should_match(reader, "merge sort join", 2, 7))


def test_bool_term_filter(reader):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"text": "table"}}]}}}
    _same(DSL.execute(reader, body),
          score_taat_filtered(reader, "data stream", "table", 10))


def test_bool_range_filter(reader):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "slow query"}}],
        "filter": [{"range": {"doclen": {"gte": 30, "lte": 80}}}]}}}
    _same(DSL.execute(reader, body),
          score_taat_range(reader, "slow query", 30, 80, 10))


def test_bool_must_not_excludes(reader):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "must_not": [{"match": {"text": "spark"}}]}}, "size": 200}
    d, _s = DSL.execute(reader, body)
    from snowplow_elasticsearch_loader_ray.pipelines.query import boolean_and
    spark_docs = set(boolean_and(reader, "spark").tolist())
    assert len(d) and not (set(d.tolist()) & spark_docs)


def test_dis_max(reader):
    body = {"query": {"dis_max": {
        "queries": [{"match": {"text": "merge"}}, {"match": {"text": "sort"}}],
        "tie_breaker": 0.3}}}
    _same(DSL.execute(reader, body),
          score_dismax(reader, "merge sort", 10, tie_breaker=0.3))


def test_function_score_gauss(reader):
    body = {"query": {"function_score": {
        "query": {"match": {"text": "data"}},
        "gauss": {"doclen": {"origin": 50.0, "scale": 20.0, "decay": 0.5}}}}}
    _same(DSL.execute(reader, body),
          score_function_gauss(reader, "data", 10,
                               origin=50.0, scale=20.0, decay=0.5))


def test_from_size_pagination(reader):
    full_d, full_s = score_taat(reader, "the data", 12)
    d, s = DSL.execute(reader, {"query": {"match": {"text": "the data"}},
                                "size": 7, "from": 5})
    assert np.array_equal(d, full_d[5:12])
    assert np.array_equal(s, full_s[5:12])


def test_boosting_demotes_not_excludes(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        boolean_and, score_boosting)

    body = {"query": {"boosting": {
        "positive": {"match": {"text": "data stream"}},
        "negative": {"match": {"text": "slow"}},
        "negative_boost": 0.5}}, "size": 200}
    _same(DSL.execute(reader, body),
          score_boosting(reader, "data stream", "slow", 200,
                         negative_boost=0.5))
    # demotion, not exclusion: negative-matching docs stay in the list
    d, s = DSL.execute(reader, body)
    slow_docs = set(boolean_and(reader, "slow").tolist())
    assert set(d.tolist()) & slow_docs
    # and nb=1.0 degenerates to the plain match ranking
    plain = DSL.execute(reader,
                        {"query": {"match": {"text": "data stream"}},
                         "size": 200})
    body1 = {"query": {"boosting": {
        "positive": {"match": {"text": "data stream"}},
        "negative": {"match": {"text": "slow"}},
        "negative_boost": 1.0}}, "size": 200}
    _same(DSL.execute(reader, body1), plain)


def test_dis_max_multiword_clause_is_per_clause_max(reader):
    """ES dis_max takes the max over CLAUSE scores — a multi-word match
    clause is one clause (a BM25 sum), not a bag of per-term partials."""
    import numpy as np
    from snowplow_elasticsearch_loader_ray.pipelines.query import score_taat

    body = {"query": {"dis_max": {"queries": [
        {"match": {"text": "data stream"}},
        {"match": {"text": "slow"}}]}}, "size": 300}
    d, s = DSL.execute(reader, body)
    a_d, a_s = score_taat(reader, "data stream", 10_000)
    b_d, b_s = score_taat(reader, "slow", 10_000)
    a = dict(zip(a_d.tolist(), a_s.tolist()))
    b = dict(zip(b_d.tolist(), b_s.tolist()))
    for doc, sc in zip(d.tolist(), s.tolist()):
        assert sc == max(a.get(doc, 0.0), b.get(doc, 0.0))
    # there must exist a doc where per-clause max != per-term max
    # (i.e. the two-term clause sum wins over any single term partial)
    assert any(a.get(doc, 0.0) > b.get(doc, 0.0) and doc in a
               for doc in d.tolist())


@pytest.mark.parametrize("body", [
    # unsupported range FIELD must raise even when the match is empty
    {"query": {"bool": {"must": [{"match": {"text": "zzznoterm"}}],
                        "filter": [{"range": {"timestamp": {"gte": 1}}}]}}},
    # minimum_should_match is rejected in every non-must position
    {"query": {"boosting": {
        "positive": {"match": {"text": {"query": "a b",
                                        "minimum_should_match": 2}}},
        "negative": {"match": {"text": "x"}}}}},
    {"query": {"dis_max": {"queries": [
        {"match": {"text": {"query": "a b", "minimum_should_match": 2}}}]}}},
    {"query": {"bool": {"must": [{"match": {"text": "data"}}],
                        "must_not": [{"match": {"text": {
                            "query": "x", "minimum_should_match": 1}}}]}}},
    # function_score validates its option surface
    {"query": {"function_score": {"query": {"match": {"text": "data"}},
                                  "gauss": {"doclen": {"origin": 1,
                                                       "scale": 2,
                                                       "offset": 3}}}}},
    {"query": {"function_score": {"query": {"match": {"text": "data"}},
                                  "boost_mode": "sum",
                                  "gauss": {"doclen": {"origin": 1,
                                                       "scale": 2}}}}},
    {"query": {"function_score": {"gauss": {"doclen": {"origin": 1,
                                                       "scale": 2}}}}},
])
def test_silent_divergence_shapes_refuse(reader, body):
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)


def test_search_after_pages_through(reader):
    """search_after with the previous page's (rounded score, doc_id)
    cursor returns exactly the next page of the full ranking."""
    from snowplow_elasticsearch_loader_ray import bm25

    full_d, full_s = DSL.execute(
        reader, {"query": {"match": {"text": "data stream"}}, "size": 10})
    p1_d, p1_s = DSL.execute(
        reader, {"query": {"match": {"text": "data stream"}}, "size": 5})
    cursor = [float(np.round(p1_s[-1], bm25.SCORE_ROUND)), int(p1_d[-1])]
    p2_d, p2_s = DSL.execute(
        reader, {"query": {"match": {"text": "data stream"}}, "size": 5,
                 "search_after": cursor})
    np.testing.assert_array_equal(np.concatenate([p1_d, p2_d]), full_d)
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"match": {"text": "x"}},
                             "search_after": cursor, "from": 3})
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"bool": {"must": [
            {"match": {"text": "x"}}]}}, "search_after": cursor})


def test_aggs_in_request_body(reader):
    """aggs run over the FULL match set (ES contract) and equal the
    direct facet calls; unsupported agg shapes refuse."""
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        facet_doclen_stats, facet_lang_counts)

    body = {"query": {"match": {"text": "data stream"}}, "size": 3,
            "aggs": {"langs": {"terms": {"field": "lang"}},
                     "dl": {"stats": {"field": "doclen"}}}}
    d, s, aggs = DSL.execute_with_aggs(reader, body)
    assert len(d) == 3
    assert aggs["langs"] == facet_lang_counts(reader, "data stream")
    assert aggs["dl"] == facet_doclen_stats(reader, "data stream")
    # without aggs the triple degenerates to execute()
    d2, s2 = DSL.execute(reader, {"query": {"match": {"text": "data stream"}},
                                  "size": 3})
    _same((d, s), (d2, s2))
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute_with_aggs(reader, {
            "query": {"match": {"text": "x"}},
            "aggs": {"h": {"histogram": {"field": "doclen"}}}})
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute_with_aggs(reader, {
            "query": {"bool": {"must": [{"match": {"text": "x"}}]}},
            "aggs": {"langs": {"terms": {"field": "lang"}}}})


def test_constant_score(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import boolean_and

    body = {"query": {"constant_score": {
        "filter": {"term": {"text": "table"}}, "boost": 2.0}}, "size": 500}
    d, s = DSL.execute(reader, body)
    want = np.sort(boolean_and(reader, "table"))[:500]
    np.testing.assert_array_equal(d, want)   # all-ties rank = doc_id asc
    assert (s == 2.0).all()
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"constant_score": {
            "filter": {"range": {"doclen": {"gte": 1}}}}}})


def test_simple_query_string_parse():
    assert DSL.parse_simple_query_string('a +b -c "d e" +f') == \
        (["d e"], ["b", "f"], ["c"])
    assert DSL.parse_simple_query_string('""  plain') == ([], [], [])


def test_simple_query_string_equals_hand_built_bool(reader):
    body = {"query": {"simple_query_string": {
        "query": "+table data stream -slow"}}, "size": 25}
    hand = {"query": {"bool": {
        "must": [{"match": {"text": "data slow stream table"}}],
        "filter": [{"term": {"text": "table"}}],
        "must_not": [{"match": {"text": "slow"}}]}}, "size": 25}
    # scoring set excludes the prohibited term, so rebuild without it
    hand["query"]["bool"]["must"] = [{"match": {"text": "data stream table"}}]
    _same(DSL.execute(reader, body), DSL.execute(reader, hand))


def test_simple_query_string_bad_fields_raise(reader):
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"simple_query_string": {
            "query": "data", "fields": ["title"]}}})
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"simple_query_string": {
            "query": "-only -negatives"}}})


@pytest.mark.parametrize("body", [
    {"query": {"match_all": {"norelease": 1}}},
    {"query": {"match": {"title": "x"}}},
    {"query": {"bool": {"should": [{"match": {"text": "x"}}]}}},
    {"query": {"match": {"text": "x"}}, "aggs": {}},
    {"query": {"bool": {"must": [{"match": {"text": "x"}}],
                        "filter": [{"geo_distance": {}}]}}},
    {"query": {"boosting": {"positive": {"match": {"text": "x"}}}}},
])
def test_unsupported_shapes_raise(reader, body):
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)


def test_bool_phrase_filter(reader):
    """match_phrase in filter context: BM25 scoring restricted to exact
    phrase matches from the positional index."""
    import os
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines.positions import (
        PositionalReader, build_positions, phrase_search)
    from snowplow_elasticsearch_loader_ray.pipelines.query import score_taat

    pos_dir = os.path.join(os.path.dirname(_index_dir(SF)), "positions")
    build_positions(os.path.join(SF, "documents.parquet"), pos_dir, CFG)
    pr = PositionalReader(pos_dir)
    phrase = "data stream"
    body = {"query": {"bool": {
        "must": [{"match": {"text": "slow query"}}],
        "filter": [{"match_phrase": {"text": phrase}}]}}, "size": 50}
    d, s = DSL.execute(reader, body, pos_reader=pr)
    ph = set(int(x) for x in phrase_search(pr, phrase))
    assert set(d.tolist()) <= ph
    # survivors keep their unfiltered scores (non-scoring filter)
    full_d, full_s = score_taat(reader, "slow query", 10_000)
    full = dict(zip(full_d.tolist(), full_s.tolist()))
    assert all(full[int(x)] == s[i] for i, x in enumerate(d))
    # and every scoring phrase match survives
    assert set(d.tolist()) == ph & set(full_d.tolist())


def test_phrase_filter_without_pos_reader_raises(reader):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "filter": [{"match_phrase": {"text": "data stream"}}]}}}
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)


def test_pinned_query(reader):
    """pinned: listed ids first IN LIST ORDER (existing ids only, shown
    even without an organic match), then organic BM25 excluding the
    pinned set; scores ramp down from PINNED_SCORE_BASE."""
    from snowplow_elasticsearch_loader_ray.pipelines.query import score_taat

    ids = [311, 7, 141, 999_999_999]          # last one doesn't exist
    body = {"query": {"pinned": {
        "ids": ids, "organic": {"match": {"text": "data stream"}}}},
        "size": 10}
    d, s = DSL.execute(reader, body)
    exists = [i for i in ids if i in set(reader.dl_doc_ids.tolist())]
    od, _osc = score_taat(reader, "data stream", 10 + len(ids))
    organic = [x for x in od.tolist() if x not in set(ids)]
    assert d.tolist() == (exists + organic)[:10]
    # pinned scores are the synthetic ramp, strictly above organic
    np.testing.assert_array_equal(
        s[:len(exists)],
        DSL.PINNED_SCORE_BASE - np.arange(len(exists), dtype=np.float64))
    assert (s[:len(exists)] > s[len(exists):].max()).all()
    # pagination composes: from=2 drops the first two pinned slots
    d2, _ = DSL.execute(reader, {**body, "from": 2, "size": 5})
    assert d2.tolist() == (exists + organic)[2:7]


def test_pinned_matches_driver_entry(reader):
    """The DSL route and the registry entry share one contract."""
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        PINNED_IDS, PINNED_QUERY, TOPK, pinned_query_topk)

    want = pinned_query_topk(SF).column("doc_id").to_pylist()
    d, _ = DSL.execute(reader, {"query": {"pinned": {
        "ids": PINNED_IDS,
        "organic": {"match": {"text": PINNED_QUERY}}}}, "size": TOPK})
    assert d.tolist() == want


def test_terms_set_route(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        score_terms_set)

    body = {"query": {"terms_set": {"text": {
        "terms": ["data", "stream", "table"],
        "minimum_should_match_field": "doclen", "m_div": 40}}}, "size": 15}
    _same(DSL.execute(reader, body),
          score_terms_set(reader, "data stream table", 15, m_div=40))


def test_random_score_route(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        score_random)

    body = {"query": {"function_score": {
        "query": {"match": {"text": "data"}},
        "random_score": {"field": "doc_id", "seed": 0}}}, "size": 20}
    _same(DSL.execute(reader, body), score_random(reader, "data", 20))
    # multi-term organic: match set is the should-union of both lists
    d, _ = DSL.execute(reader, {"query": {"function_score": {
        "query": {"match": {"text": "data stream"}},
        "random_score": {}}}, "size": 500})
    from snowplow_elasticsearch_loader_ray.pipelines.query import boolean_or
    union = set(boolean_or(reader, "data stream")[0].tolist())
    assert set(d.tolist()) <= union and len(d)


@pytest.mark.parametrize("body", [
    # pinned validates ids (dupes, non-ints) and organic shape
    {"query": {"pinned": {"ids": [1, 1], "organic": {"match": {"text": "x"}}}}},
    {"query": {"pinned": {"ids": [1, True], "organic": {"match": {"text": "x"}}}}},
    {"query": {"pinned": {"ids": "1,2", "organic": {"match": {"text": "x"}}}}},
    {"query": {"pinned": {"ids": [1]}}},
    {"query": {"pinned": {"ids": [1], "organic": {"match": {"text": {
        "query": "a b", "minimum_should_match": 2}}}}}},
    # terms_set validates field, param surface and msm field
    {"query": {"terms_set": {"title": {"terms": ["a"]}}}},
    {"query": {"terms_set": {"text": {"terms": ["a"],
                                      "minimum_should_match_field": "rank"}}}},
    {"query": {"terms_set": {"text": {"terms": "a b"}}}},
    {"query": {"terms_set": {"text": {"terms": ["a"], "boost": 2.0}}}},
    # random_score: non-default stream / field / two functions refuse
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "random_score": {"seed": 7}}}},
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "random_score": {"field": "_seq_no"}}}},
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "random_score": {},
                                  "gauss": {"doclen": {"origin": 1,
                                                       "scale": 2}}}}},
])
def test_new_route_refusals(reader, body):
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)


def test_decay_exp_linear_routes(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        score_function_exp, score_function_linear, score_taat)

    for fn, prim in (("exp", score_function_exp),
                     ("linear", score_function_linear)):
        body = {"query": {"function_score": {
            "query": {"match": {"text": "data"}},
            fn: {"doclen": {"origin": 50.0, "scale": 20.0,
                            "decay": 0.5}}}}, "size": 200}
        _same(DSL.execute(reader, body),
              prim(reader, "data", 200, origin=50.0, scale=20.0, decay=0.5))
    # the decays actually reorder: each curve differs from plain BM25
    plain, _ = DSL.execute(reader, {"query": {"match": {"text": "data"}},
                                    "size": 200})
    for fn in ("exp", "linear", "gauss"):
        d, _ = DSL.execute(reader, {"query": {"function_score": {
            "query": {"match": {"text": "data"}},
            fn: {"doclen": {"origin": 50.0, "scale": 20.0}}}}, "size": 200})
        assert d.tolist() != plain.tolist()
    # linear zeroes (never drops) docs beyond s = scale/(1-decay):
    # hit count matches plain and the tail ranks by doc_id
    d, s = DSL.execute(reader, {"query": {"function_score": {
        "query": {"match": {"text": "data"}},
        "linear": {"doclen": {"origin": 50.0, "scale": 5.0,
                              "decay": 0.5}}}}, "size": 100_000})
    assert len(d) == len(plain := DSL.execute(
        reader, {"query": {"match": {"text": "data"}},
                 "size": 100_000})[0])
    zeros = d[s == 0.0]
    assert len(zeros) and np.array_equal(zeros, np.sort(zeros))


def test_rank_feature_should(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        score_rank_feature, score_taat)

    body = {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "should": [{"rank_feature": {
            "field": "doclen", "saturation": {"pivot": 56.0},
            "boost": 3.0}}]}}, "size": 50}
    _same(DSL.execute(reader, body),
          score_rank_feature(reader, "data stream", 50,
                             pivot=56.0, boost=3.0))
    # additive promote-never-veto: hit SET equals the plain match set
    d, _ = DSL.execute(reader, {**body, "size": 100_000})
    p, _ = score_taat(reader, "data stream", 100_000)
    assert set(d.tolist()) == set(p.tolist())
    assert d.tolist() != p.tolist()          # ...but the ORDER moved
    # two should clauses sum; composes with filters
    body2 = {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"text": "table"}}],
        "should": [
            {"rank_feature": {"field": "doclen",
                              "saturation": {"pivot": 56.0}}},
            {"rank_feature": {"field": "doclen",
                              "saturation": {"pivot": 10.0},
                              "boost": 2.0}}]}}, "size": 20}
    d2, s2 = DSL.execute(reader, body2)
    assert len(d2)


def test_aggs_range_extended_cardinality(reader):
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        boolean_or, facet_doclen_extended_stats, facet_doclen_ranges,
        facet_lang_counts)

    body = {"query": {"match": {"text": "data stream"}}, "size": 0,
            "aggs": {
                "xdl": {"extended_stats": {"field": "doclen"}},
                "nlang": {"cardinality": {"field": "lang"}},
                "r": {"range": {"field": "doclen", "ranges": [
                    {"to": 32}, {"from": 32, "to": 64}, {"from": 64}]}}}}
    d, s, aggs = DSL.execute_with_aggs(reader, body)
    assert len(d) == 0                       # size=0: aggs-only search
    assert aggs["xdl"] == facet_doclen_extended_stats(reader, "data stream")
    assert aggs["nlang"] == len(facet_lang_counts(reader, "data stream"))
    want = facet_doclen_ranges(reader, "data stream",
                               [(None, 32), (32, 64), (64, None)])
    assert [b["doc_count"] for b in aggs["r"]] == want
    # buckets count the full match set (ranges here tile doclen space)
    assert sum(want) == len(boolean_or(reader, "data stream")[0])


@pytest.mark.parametrize("body", [
    # rank_feature validates field/saturation/extra keys; bare should
    # clauses of any other kind refuse
    {"query": {"bool": {"must": [{"match": {"text": "x"}}],
                        "should": [{"match": {"text": "y"}}]}}},
    {"query": {"bool": {"must": [{"match": {"text": "x"}}],
                        "should": [{"rank_feature": {
                            "field": "pagerank",
                            "saturation": {"pivot": 1}}}]}}},
    {"query": {"bool": {"must": [{"match": {"text": "x"}}],
                        "should": [{"rank_feature": {
                            "field": "doclen",
                            "saturation": {}}}]}}},
    {"query": {"bool": {"must": [{"match": {"text": "x"}}],
                        "should": [{"rank_feature": {
                            "field": "doclen", "log": {"scaling_factor": 2},
                            "saturation": {"pivot": 1}}}]}}},
    # decay param surface is validated per function kind
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "exp": {"doclen": {"origin": 1}}}}},
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "linear": {"rank": {"origin": 1,
                                                      "scale": 2}}}}},
    {"query": {"function_score": {"query": {"match": {"text": "x"}},
                                  "exp": {"doclen": {"origin": 1,
                                                     "scale": 2}},
                                  "linear": {"doclen": {"origin": 1,
                                                        "scale": 2}}}}},
    # agg validation: bad range buckets / fields refuse
    {"query": {"match": {"text": "x"}},
     "aggs": {"r": {"range": {"field": "doclen", "ranges": []}}}},
    {"query": {"match": {"text": "x"}},
     "aggs": {"r": {"range": {"field": "doclen",
                              "ranges": [{"gte": 1}]}}}},
    {"query": {"match": {"text": "x"}},
     "aggs": {"r": {"range": {"field": "lang",
                              "ranges": [{"to": 2}]}}}},
    {"query": {"match": {"text": "x"}},
     "aggs": {"c": {"cardinality": {"field": "doclen"}}}},
    {"query": {"match": {"text": "x"}},
     "aggs": {"x": {"extended_stats": {"field": "lang"}}}},
])
def test_new_surface_refusals(reader, body):
    with pytest.raises(DSL.UnsupportedDSL):
        if "aggs" in body:
            DSL.execute_with_aggs(reader, body)
        else:
            DSL.execute(reader, body)


def test_expansion_query_routes(reader):
    """prefix / wildcard / regexp / fuzzy / ids: constant_score rewrite
    (every matching doc scores 1.0, all-ties rank = doc_id asc)."""
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        fuzzy_expand, prefix_match, regexp_search, wildcard_to_regexp)

    _n, want = prefix_match(reader, "str")
    d, s = DSL.execute(reader, {"query": {"prefix": {"text": "str"}},
                                "size": 10_000})
    assert d.tolist() == np.sort(want).tolist() and (s == 1.0).all()

    rx = regexp_search(reader, "st.*m").column("doc_id").to_pylist()
    d, _ = DSL.execute(reader, {"query": {"regexp": {
        "text": {"value": "st.*m"}}}, "size": 10_000})
    assert d.tolist() == sorted(rx)
    # wildcard goes through the same expansion path
    d2, _ = DSL.execute(reader, {"query": {"wildcard": {
        "text": {"value": "st*m"}}}, "size": 10_000})
    assert d2.tolist() == sorted(
        regexp_search(reader, wildcard_to_regexp("st*m"))
        .column("doc_id").to_pylist())

    # fuzzy: union of the verified edit-distance-1 expansions
    exp = fuzzy_expand(reader, "strean")
    assert exp                               # "stream" is in-vocab
    from snowplow_elasticsearch_loader_ray.pipelines.query import boolean_or
    want = set()
    for t in exp:
        want |= set(boolean_or(reader, t)[0].tolist())
    d3, _ = DSL.execute(reader, {"query": {"fuzzy": {
        "text": {"value": "strean", "fuzziness": 1}}}, "size": 100_000})
    assert set(d3.tolist()) == want

    ids = [int(reader.dl_doc_ids[0]), 999_999_999, int(reader.dl_doc_ids[5])]
    d4, s4 = DSL.execute(reader, {"query": {"ids": {"values": ids}}})
    assert d4.tolist() == sorted(set(ids) & set(reader.dl_doc_ids.tolist()))
    assert (s4 == 1.0).all()


def test_match_phrase_scoring_route(reader):
    """Top-level match_phrase == bool{must: match, filter: phrase}."""
    import os
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines.positions import (
        PositionalReader, build_positions)

    pos_dir = os.path.join(os.path.dirname(_index_dir(SF)), "positions")
    build_positions(os.path.join(SF, "documents.parquet"), pos_dir, CFG)
    pr = PositionalReader(pos_dir)
    body = {"query": {"match_phrase": {"text": "data stream"}}, "size": 20}
    hand = {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"match_phrase": {"text": "data stream"}}]}}, "size": 20}
    _same(DSL.execute(reader, body, pos_reader=pr),
          DSL.execute(reader, hand, pos_reader=pr))
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)           # needs the positional index


@pytest.mark.parametrize("body", [
    {"query": {"prefix": {"title": "x"}}},
    {"query": {"prefix": {"text": {"value": "x", "rewrite": "top_terms"}}}},
    {"query": {"fuzzy": {"text": {"value": "x", "fuzziness": 2}}}},
    {"query": {"wildcard": {"text": {"value": 3}}}},
    {"query": {"ids": {"values": "1,2"}}},
    {"query": {"ids": {"values": [1], "boost": 2.0}}},
    {"query": {"match_phrase": {"text": {"query": "a b", "slop": 1}}}},
])
def test_expansion_refusals(reader, body):
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)


def test_span_near_dsl_route(reader):
    import os
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines.positions import (
        PositionalReader, build_positions, span_near_chain)

    pos_dir = os.path.join(os.path.dirname(_index_dir(SF)), "positions")
    build_positions(os.path.join(SF, "documents.parquet"), pos_dir, CFG)
    pr = PositionalReader(pos_dir)
    body = {"query": {"span_near": {
        "clauses": [{"span_term": {"text": t}}
                    for t in ("data", "table", "scan")],
        "slop": 8, "in_order": True}}, "size": 10_000}
    d, s = DSL.execute(reader, body, pos_reader=pr)
    want, _ = span_near_chain(pr, ["data", "table", "scan"], 8)
    assert d.tolist() == np.sort(want).tolist() and (s == 1.0).all()
    for bad in [
        {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": 1}}},                       # in_order missing
        {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}], "slop": 1, "in_order": True}}},
        {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}},
            {"match": {"text": "b"}}], "slop": 1, "in_order": True}}},
    ]:
        with pytest.raises(DSL.UnsupportedDSL):
            DSL.execute(reader, bad, pos_reader=pr)
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, body)              # no positional index


def test_lang_term_filter(reader):
    """bool term filter on the lang KEYWORD doc-value: one ordinal
    gather restricts candidates; scores keep their unfiltered values
    (non-scoring filter)."""
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        lang_docvalues, score_taat)

    body = {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"lang": "en"}}]}}, "size": 100_000}
    d, s = DSL.execute(reader, body)
    langs = lang_docvalues(reader)
    by_ord = dict(zip(reader.dl_doc_ids.tolist(), langs.tolist()))
    assert len(d) and all(by_ord[x] == "en" for x in d.tolist())
    full_d, full_s = score_taat(reader, "data stream", 100_000)
    full = dict(zip(full_d.tolist(), full_s.tolist()))
    assert all(full[int(x)] == s[i] for i, x in enumerate(d))
    assert set(d.tolist()) == {x for x in full_d.tolist()
                               if by_ord[x] == "en"}
    # composes with a text term filter in the same list
    d2, _ = DSL.execute(reader, {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"lang": "en"}},
                   {"term": {"text": "table"}}]}}, "size": 100_000})
    assert set(d2.tolist()) <= set(d.tolist())
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"bool": {
            "must": [{"match": {"text": "x"}}],
            "filter": [{"term": {"source": "src0"}}]}}})
    with pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(reader, {"query": {"bool": {
            "must": [{"match": {"text": "x"}}],
            "filter": [{"term": {"lang": 3}}]}}})


def test_execute_distributed_bit_identical(reader):
    """The distributed DSL planner returns the single-reader results
    bit-for-bit (the sharded plane pins score identity)."""
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        _ensure_index)
    from snowplow_elasticsearch_loader_ray.pipelines.sharded_query import (
        ShardedQueryEngine)

    eng = ShardedQueryEngine(_ensure_index(SF))
    try:
        body = {"query": {"match": {"text": "data stream"}},
                "size": 7, "from": 3,
                "aggs": {"langs": {"terms": {"field": "lang"}},
                         "dl": {"stats": {"field": "doclen"}}}}
        d, s, aggs = DSL.execute_distributed(eng, body)
        sd, ss, saggs = DSL.execute_with_aggs(
            reader, {k: v for k, v in body.items()})
        _same((d, s), (sd, ss))
        assert aggs == saggs
        # aggs-only request
        d0, s0, a0 = DSL.execute_distributed(eng, {
            "query": {"match": {"text": "data"}}, "size": 0,
            "aggs": {"langs": {"terms": {"field": "lang"}}}})
        assert len(d0) == 0
        assert a0["langs"] == eng.facet_lang_counts("data")
        for bad in [
            {"query": {"bool": {"must": [{"match": {"text": "x"}}]}}},
            {"query": {"match": {"text": "x"}}, "search_after": [1.0, 2]},
            {"query": {"match": {"text": {"query": "x",
                                          "minimum_should_match": 1}}}},
            {"query": {"match": {"text": "x"}},
             "aggs": {"c": {"cardinality": {"field": "lang"}}}},
        ]:
            with pytest.raises(DSL.UnsupportedDSL):
                DSL.execute_distributed(eng, bad)
    finally:
        eng.shutdown()


def test_intervals_dsl_route(reader):
    """intervals.match routes: ordered pair/chain -> span_near_chain,
    unordered pair -> proximity_search; max_gaps=-1 is unlimited;
    constant-score rewrite (1.0, doc_id asc)."""
    import os
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines.positions import (
        PositionalReader, build_positions, proximity_search,
        span_near_chain)

    pos_dir = os.path.join(os.path.dirname(_index_dir(SF)), "positions")
    build_positions(os.path.join(SF, "documents.parquet"), pos_dir, CFG)
    pr = PositionalReader(pos_dir)

    def run(q, gaps, ordered):
        return DSL.execute(reader, {"query": {"intervals": {"text": {
            "match": {"query": q, "max_gaps": gaps,
                      "ordered": ordered}}}}, "size": 10_000},
            pos_reader=pr)

    # ordered pair == ordered proximity; ORDER of the query string
    # matters (sort would change the matched docs)
    d, s = run("table data", 3, True)
    want, _ = proximity_search(pr, "table", "data", 3, ordered=True)
    assert d.tolist() == np.sort(want).tolist() and (s == 1.0).all()
    rev, _ = proximity_search(pr, "data", "table", 3, ordered=True)
    assert d.tolist() != np.sort(rev).tolist()

    # unordered pair == unordered proximity
    d2, _ = run("data table", 3, False)
    want2, _ = proximity_search(pr, "data", "table", 3, ordered=False)
    assert d2.tolist() == np.sort(want2).tolist()

    # ordered 3-chain == span_near_chain with the same total-gap budget
    d3, _ = run("data table scan", 8, True)
    want3, _ = span_near_chain(pr, ["data", "table", "scan"], 8)
    assert d3.tolist() == np.sort(want3).tolist()

    # max_gaps omitted / -1 = unlimited: every co-occurrence matches
    dall, _ = run("data table", -1, True)
    wall, _ = proximity_search(pr, "data", "table", 1 << 62, ordered=True)
    assert dall.tolist() == np.sort(wall).tolist()

    for bad in [
        {"intervals": {"text": {"match": {"query": "solo"}}}},
        {"intervals": {"text": {"match": {"query": "a a",
                                          "max_gaps": 1}}}},
        {"intervals": {"text": {"match": {"query": "a b c",
                                          "max_gaps": 1,
                                          "ordered": False}}}},
        {"intervals": {"text": {"match": {"query": "a b",
                                          "max_gaps": -2}}}},
        {"intervals": {"text": {"match": {"query": "a b",
                                          "max_gaps": 1,
                                          "fuzzy": {}}}}},
        {"intervals": {"text": {"all_of": {}}}},
        {"intervals": {"lang": {"match": {"query": "a b"}}}},
    ]:
        with pytest.raises(DSL.UnsupportedDSL):
            DSL.execute(reader, {"query": bad}, pos_reader=pr)
    with pytest.raises(DSL.UnsupportedDSL):   # no positional index
        DSL.execute(reader, {"query": {"intervals": {"text": {
            "match": {"query": "data table", "max_gaps": 1,
                      "ordered": True}}}}})


def test_knn_sections(ray_session):
    """ES 8 knn sections: msearch_knn batches N bodies into one scan
    and equals per-body ann_topk; execute_knn routes the filtered body
    to the PRE-filter scorer; malformed sections refuse."""
    import ray as _ray
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    from snowplow_elasticsearch_loader_ray.pipelines import ann as ANN

    sf = SF
    t = pq.read_table(f"{sf}/embeddings.parquet")
    t = t.take(pc.sort_indices(t["vec_id"]))
    qmat = np.array(t["embedding"].to_pylist()[:4], dtype=np.float64)
    ds = _ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    bodies = [{"knn": {"field": "embedding", "query_vector": q.tolist(),
                       "k": 5, "num_candidates": 50}} for q in qmat]
    got = DSL.msearch_knn(ds, bodies)
    want = ANN.ann_topk(ds, qmat, k=5)
    assert got.equals(want)

    # filtered body: PRE-filter semantics via execute_knn
    lbl = t["label"][0].as_py()
    fbody = {"knn": {"field": "embedding",
                     "query_vector": qmat[0].tolist(), "k": 5,
                     "num_candidates": 5,
                     "filter": {"term": {"label": lbl}}}}
    ds2 = _ray.data.read_parquet(f"{sf}/embeddings.parquet")
    gotf = DSL.execute_knn(ds2, fbody)
    wantf = ANN.ann_topk_filtered(ds2, qmat[:1], "label", lbl, k=5)
    assert gotf.equals(wantf)

    for bad in [
        {"knn": {"field": "embedding", "query_vector": [0.1], "k": 0}},
        {"knn": {"field": "embedding", "query_vector": [0.1], "k": 5,
                 "num_candidates": 3}},            # nc < k
        {"knn": {"field": "text", "query_vector": [0.1], "k": 1}},
        {"knn": {"field": "embedding", "query_vector": [], "k": 1}},
        {"knn": {"field": "embedding", "query_vector": [0.1], "k": 1,
                 "similarity": 0.5}},              # unknown key
        {"knn": {"field": "embedding", "query_vector": [0.1], "k": 1,
                 "filter": {"term": {"lang": "en"}}}},
        {"query": {"match": {"text": "x"}},
         "knn": {"field": "embedding", "query_vector": [0.1], "k": 1}},
    ]:
        with pytest.raises(DSL.UnsupportedDSL):
            DSL.execute_knn(ds, bad)
    with pytest.raises(DSL.UnsupportedDSL):       # mixed k
        DSL.msearch_knn(ds, [
            {"knn": {"field": "embedding",
                     "query_vector": qmat[0].tolist(), "k": 5}},
            {"knn": {"field": "embedding",
                     "query_vector": qmat[1].tolist(), "k": 6}}])
    with pytest.raises(DSL.UnsupportedDSL):       # filter in msearch
        DSL.msearch_knn(ds, [fbody])


def test_render_template():
    from snowplow_elasticsearch_loader_ray.pipelines.query_dsl import (
        UnsupportedDSL, render_template)

    tpl = {"query": {"match": {"text": "{{q}} extra"}}, "size": "{{size}}",
           "from": 0, "tags": ["{{q}}", "fixed"]}
    out = render_template(tpl, {"q": "merge sort", "size": 7})
    # whole-string placeholder keeps the param's native type
    assert out["size"] == 7 and isinstance(out["size"], int)
    # in-string substitution stringifies
    assert out["query"]["match"]["text"] == "merge sort extra"
    assert out["tags"] == ["merge sort", "fixed"]
    assert out["from"] == 0
    # unbound params refuse instead of silently rewriting the query
    import pytest as _pytest
    with _pytest.raises(UnsupportedDSL):
        render_template({"q": "{{missing}}"}, {})


def test_execute_retriever_rrf(reader):
    import numpy as np
    import pytest as _pytest

    from snowplow_elasticsearch_loader_ray.pipelines import query_dsl as DSL

    body = {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": {"match": {"text": "data stream"}}}},
            {"standard": {"query": {"match": {"text": "merge sort"}}}},
        ],
        "rank_constant": 60, "rank_window_size": 20}},
        "size": 5}
    d, s = DSL.execute_retriever(reader, body)
    assert len(d) == 5 and np.all(np.diff(s) <= 0)
    # a doc ranked #1 in BOTH legs would score 2/(60+1); every fused
    # score is bounded by that
    assert s[0] <= 2.0 / 61.0 + 1e-12
    # single-leg degenerate: fusion order == the leg's own order
    one = {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": {"match": {"text": "data stream"}}}}],
        "rank_constant": 60, "rank_window_size": 20}}, "size": 5}
    d1, _ = DSL.execute_retriever(reader, one)
    dm, _ = DSL.execute(reader, {"query": {"match": {"text": "data stream"}},
                                 "size": 5})
    assert d1.tolist() == dm.tolist()
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute_retriever(reader, {"retriever": {"linear": {}}})
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute_retriever(
            reader, {"retriever": {"rrf": {"retrievers": []}}})


def test_wrapper_query_decodes_and_redispatches(reader):
    import base64
    import json

    from snowplow_elasticsearch_loader_ray.pipelines import query_dsl as DSL

    r = reader
    plain_d, plain_s = DSL.execute(
        r, {"query": {"match": {"text": "data stream"}}, "size": 5})
    enc = base64.b64encode(
        json.dumps({"match": {"text": "data stream"}}).encode()).decode()
    d, s = DSL.execute(
        r, {"query": {"wrapper": {"query": enc}}, "size": 5})
    assert (d == plain_d).all() and (s == plain_s).all()
    # nested wrapper unwraps recursively
    enc2 = base64.b64encode(json.dumps(
        {"wrapper": {"query": enc}}).encode()).decode()
    d2, _ = DSL.execute(
        r, {"query": {"wrapper": {"query": enc2}}, "size": 5})
    assert (d2 == plain_d).all()
    import pytest as _pytest
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(r, {"query": {"wrapper": {"query": "!!notb64!!"}}})
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(r, {"query": {"wrapper": {"q": enc}}})


def test_min_score_drops_suffix(reader):
    import numpy as np
    import pytest as _pytest

    from snowplow_elasticsearch_loader_ray.pipelines import query_dsl as DSL

    r = reader
    d0, s0 = DSL.execute(
        r, {"query": {"match": {"text": "data stream"}}, "size": 10})
    theta = float(s0[len(s0) // 2])         # cut mid-page at an exact hit
    d, s = DSL.execute(
        r, {"query": {"match": {"text": "data stream"}}, "size": 10,
            "min_score": theta})
    keep = s0 >= theta
    assert (d == d0[keep]).all() and (s == s0[keep]).all()
    assert len(d) < len(d0)
    # impossible threshold -> empty
    d, s = DSL.execute(
        r, {"query": {"match": {"text": "data stream"}}, "size": 10,
            "min_score": 1e9})
    assert len(d) == 0
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(r, {"query": {"match": {"text": "data"}},
                        "min_score": 0.1, "from": 5})
    with _pytest.raises(DSL.UnsupportedDSL):
        DSL.execute(r, {"query": {"match": {"text": "data"}},
                        "min_score": True})


def test_match_all_lists_everything(reader):
    """match_all: every doc at the boost score, doc_id-ascending ties —
    the deterministic 'list everything' page ES serves for an empty
    query."""
    d, s = DSL.execute(reader, {"query": {"match_all": {}}, "size": 7})
    assert len(d) == 7 and (s == 1.0).all()
    assert d.tolist() == sorted(reader.dl_doc_ids.tolist())[:7]
    d2, s2 = DSL.execute(reader, {"query": {"match_all": {"boost": 2}},
                                  "size": 3})
    assert (s2 == 2.0).all() and d2.tolist() == d.tolist()[:3]


def test_filtered_alias_no_query_and_dict_filter(ray_session, tmp_path):
    """Through a filtered alias: a body with NO query serves every
    filter-passing doc at score 1.0 (ES match_all + filter), and a
    dict-valued bool filter clause is normalized, not iterated into
    its keys."""
    import numpy as np

    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _docs_path, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines.alias import (
        search_alias, set_alias)
    from snowplow_elasticsearch_loader_ray.pipelines.query import (
        IndexReader, score_taat_filtered)

    idx = _index_dir(SF)
    r = IndexReader(idx)
    root = str(tmp_path / "al")
    set_alias(root, "data-only", idx,
              filter={"term": {"text": "data"}})
    d, s = search_alias(root, "data-only", r, {"size": 10_000})
    want, _ = score_taat_filtered(r, "data", "data", 10_000)
    assert set(d.tolist()) == set(want.tolist()) and (s == 1.0).all()
    # dict-valued filter in the caller's bool query
    d2, s2 = search_alias(root, "data-only", r, {
        "query": {"bool": {"must": [{"match": {"text": "stream"}}],
                           "filter": {"term": {"text": "data"}}}},
        "size": 20})
    assert len(d2) and set(d2.tolist()) <= set(want.tolist())


def test_swap_and_rollback_preserve_alias_filter(ray_session, tmp_path):
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CFG, _index_dir)
    from snowplow_elasticsearch_loader_ray.pipelines import build as B
    from snowplow_elasticsearch_loader_ray.pipelines.alias import (
        resolve_with_filter, rollback, set_alias, swap)

    idx = _index_dir(SF)
    idx2 = str(tmp_path / "idx2")
    B.build_index("/root/testdata/sf0.001/documents.parquet", idx2, CFG)
    root = str(tmp_path / "al2")
    flt = {"term": {"lang": "en"}}
    set_alias(root, "tenant", idx, filter=flt)
    swap(root, "tenant", idx2)
    t, f = resolve_with_filter(root, "tenant")
    assert t == idx2 and f == flt           # swap kept the filter
    rollback(root, "tenant")
    t, f = resolve_with_filter(root, "tenant")
    assert t == idx and f == flt            # rollback kept it too
    # set_alias REDEFINES: no filter drops it (ES add-action semantics)
    set_alias(root, "tenant", idx2)
    _t, f = resolve_with_filter(root, "tenant")
    assert f is None
