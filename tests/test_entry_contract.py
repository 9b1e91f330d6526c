"""Driver-contract smoke tests: entry() runs and yields rows with a
stable schema; every oracle_sql key has a queries() entry; a sample of
queries runs at sf0.001."""

import __spark_entry__ as em


def test_oracle_keys_subset_of_queries():
    q = em.queries()
    o = em.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
    assert len(o) >= 18


def test_entry_runs(spark):
    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) == 32
    cols = set(df.columns)
    assert {"theme_id", "image_id", "caption", "brdr_area", "n_cells"} <= cols
    # every footprint found at least one parcel candidate
    assert all(r.brdr_nr_references >= 1 for r in rows)
    # captions came from the documents table
    assert all(r.caption for r in rows)


def test_sample_queries_at_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    for name in ("tpch_q1_pricing_summary", "dedup_exact", "w2_best_argmax"):
        out = em.queries()[name](spark, sf)
        assert out.count() > 0
